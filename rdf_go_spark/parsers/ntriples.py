"""N-Triples / N-Quads line parsers — pure Python kernel.

Behavior parity with the reference decoders:
- line loop: skip blank lines and ``#`` comments (rdf/ntriples.go:46-49)
- statement grammar + trailing ``.`` and comment handling
  (rdf/ntriples.go:148-223)
- term cursor: IRI (raw escapes validated, kept verbatim), blank node
  (no colons), double-quoted literal with ``@lang`` / ``^^<dt>``,
  RDF 1.2 triple term ``<<( s p o )>>`` as object only
  (rdf/ntriples.go:251-588)
- absolute-IRI requirement incl. graph term (rdf/ntriples.go:383-418)

The Spark wrapper (operators/parse_spark.py) maps this kernel over Arrow
batches with ``mapInPandas``; per-line parsing is embarrassingly parallel.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ..terms import (
    IRI, BlankNode, Literal, ParseError, Quad, Term, TripleTerm,
    RDF_LANGSTRING, RDF_DIRLANGSTRING,
    has_scheme, is_valid_lang_tag, unescape_iri, unescape_string,
)

_DELIMS = set(" \t\r\n.)<>")
_HEX = set("0123456789abcdefABCDEF")


class _Cursor:
    __slots__ = ("input", "pos", "allow_star")

    def __init__(self, line: str, allow_star: bool = False):
        self.input = line
        self.pos = 0
        # classic RDF-star N-Triples: << s p o >> terms allowed as
        # subject/object (w3c-tests/turtle/eval expected files)
        self.allow_star = allow_star

    def error(self, msg: str) -> ParseError:
        return ParseError(msg, col=self.pos)

    def skip_ws(self) -> None:
        s, n = self.input, len(self.input)
        p = self.pos
        while p < n and s[p] in " \t":
            p += 1
        self.pos = p

    def consume(self, ch: str) -> bool:
        if self.pos < len(self.input) and self.input[self.pos] == ch:
            self.pos += 1
            return True
        return False

    def startswith(self, prefix: str) -> bool:
        return self.input.startswith(prefix, self.pos)

    # --- terms ------------------------------------------------------------

    def parse_iri(self) -> IRI:
        self.skip_ws()
        s = self.input
        if self.pos >= len(s) or s[self.pos] != "<":
            raise self.error("expected IRI")
        self.pos += 1
        start = self.pos
        n = len(s)
        while self.pos < n and s[self.pos] != ">":
            ch = s[self.pos]
            if ch in " \t\n\r":
                raise self.error("invalid character in IRI")
            if ch == "\\":
                nxt = s[self.pos + 1] if self.pos + 1 < n else ""
                if nxt == "u":
                    if self.pos + 5 >= n or any(c not in _HEX for c in s[self.pos + 2:self.pos + 6]):
                        raise self.error("invalid character in IRI")
                    self.pos += 6
                    continue
                if nxt == "U":
                    if self.pos + 9 >= n or any(c not in _HEX for c in s[self.pos + 2:self.pos + 10]):
                        raise self.error("invalid character in IRI")
                    self.pos += 10
                    continue
                raise self.error("invalid character in IRI")
            self.pos += 1
        if self.pos >= n:
            raise self.error("unterminated IRI")
        value = unescape_iri(s[start:self.pos])
        self.pos += 1
        if not has_scheme(value):
            raise self.error("invalid IRI: relative IRI not allowed")
        return IRI(value)

    def parse_bnode(self) -> BlankNode:
        self.skip_ws()
        if not self.startswith("_:"):
            raise self.error("expected blank node")
        self.pos += 2
        s, n = self.input, len(self.input)
        if self.pos < n and s[self.pos] == ":":
            raise self.error("invalid blank node syntax")
        start = self.pos
        while self.pos < n:
            ch = s[self.pos]
            if ch == ":":
                raise self.error("invalid blank node syntax")
            if ch == ".":
                # '.' is part of the label only mid-label (BLANK_NODE_LABEL
                # grammar); a trailing '.' terminates the statement
                nxt = s[self.pos + 1] if self.pos + 1 < n else ""
                if nxt and nxt not in _DELIMS and nxt != ":":
                    self.pos += 1
                    continue
                break
            if ch in _DELIMS:
                break
            self.pos += 1
        if start == self.pos:
            raise self.error("blank node id missing")
        label = s[start:self.pos]
        if label.startswith(".") or label.endswith("."):
            raise self.error("invalid blank node label")
        return BlankNode(label)

    def parse_literal(self) -> Literal:
        self.skip_ws()
        if not self.consume('"'):
            raise self.error("expected literal")
        s, n = self.input, len(self.input)
        start = self.pos
        # scan raw (escapes intact) to the unescaped closing quote
        while self.pos < n:
            ch = s[self.pos]
            if ch == "\\":
                if self.pos + 1 >= n:
                    raise self.error("unterminated escape")
                self.pos += 2
                continue
            if ch == '"':
                break
            self.pos += 1
        if self.pos >= n:
            raise self.error("unterminated string literal")
        raw = s[start:self.pos]
        self.pos += 1  # closing quote
        lexical = unescape_string(raw)
        self.skip_ws()
        if self.startswith("@"):
            self.pos += 1
            start = self.pos
            while self.pos < n and s[self.pos] not in _DELIMS:
                self.pos += 1
            lang = s[start:self.pos]
            if not is_valid_lang_tag(lang):
                raise self.error("invalid language tag")
            return Literal(lexical, lang=lang)
        if self.startswith("^^"):
            self.pos += 2
            dt = self.parse_iri()
            if dt.value in (RDF_LANGSTRING, RDF_DIRLANGSTRING):
                raise self.error(
                    "langString and dirLangString cannot be used as explicit datatypes")
            return Literal(lexical, datatype=dt.value)
        return Literal(lexical)

    def parse_triple_term(self) -> TripleTerm:
        if not self.startswith("<<"):
            raise self.error("expected '<<'")
        self.pos += 2
        self.skip_ws()
        if not self.consume("("):
            if self.allow_star:
                # classic quoted triple << s p o >>
                subject = self.parse_subject(allow_triple_term=True)
                predicate = self.parse_iri()
                obj = self.parse_object()
                self.skip_ws()
                if not self.startswith(">>"):
                    raise self.error("expected '>>'")
                self.pos += 2
                return TripleTerm(subject, predicate, obj)
            raise self.error("expected '('")
        self.skip_ws()
        subject = self.parse_subject(allow_triple_term=True)
        predicate = self.parse_iri()
        obj = self.parse_object()
        self.skip_ws()
        if not self.consume(")"):
            raise self.error("expected ')'")
        self.skip_ws()
        if not self.startswith(">>"):
            raise self.error("expected '>>'")
        self.pos += 2
        return TripleTerm(subject, predicate, obj)

    def parse_subject(self, allow_triple_term: bool = False) -> Term:
        self.skip_ws()
        if self.startswith("<<"):
            if not allow_triple_term:
                raise self.error("triple term cannot be used as subject")
            return self.parse_triple_term()
        if self.startswith("_:"):
            return self.parse_bnode()
        return self.parse_iri()

    def parse_object(self) -> Term:
        self.skip_ws()
        if self.startswith("<<"):
            return self.parse_triple_term()
        if self.startswith("_:"):
            return self.parse_bnode()
        if self.startswith('"'):
            return self.parse_literal()
        return self.parse_iri()

    def parse_optional_graph(self) -> Optional[Term]:
        self.skip_ws()
        if self.pos >= len(self.input) or self.input[self.pos] == ".":
            return None
        if self.startswith("<<"):
            raise self.error("triple term cannot be used as graph name")
        if self.startswith("_:"):
            return self.parse_bnode()
        return self.parse_iri()  # parse_iri enforces absolute IRI


# ---------------------------------------------------------------------------
# Fast path: the overwhelmingly common escape-free triple shapes are matched
# with one compiled regex (absolute IRI enforced by the scheme prefix in the
# pattern); anything else falls back to the exact cursor parser. Typical
# speedup ~4x on clean N-Triples corpora.
# ---------------------------------------------------------------------------

_IRI_P = r'<([A-Za-z][A-Za-z0-9+.\-]*:[^<>"{}|^`\\\x00-\x20]*)>'
_BN_P = r'_:([A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?)'
_FAST_NT = re.compile(
    rf'(?:{_IRI_P}|{_BN_P})[ \t]+{_IRI_P}[ \t]+'
    rf'(?:{_IRI_P}|{_BN_P}|"([^"\\]*)"'
    rf'(?:@([A-Za-z][A-Za-z0-9\-]*)|\^\^{_IRI_P})?)'
    rf'(?:[ \t]+(?:{_IRI_P}|{_BN_P}))?'
    rf'[ \t]*\.[ \t]*$')
# groups: 1 s_iri, 2 s_bn, 3 pred, 4 o_iri, 5 o_bn, 6 o_lex, 7 o_lang,
#         8 o_dt, 9 g_iri, 10 g_bn


def _fast_line(line: str, quads: bool) -> Optional[Quad]:
    m = _FAST_NT.match(line)
    if m is None:
        return None
    (s_iri, s_bn, pred, o_iri, o_bn, o_lex, o_lang, o_dt,
     g_iri, g_bn) = m.groups()
    if (g_iri is not None or g_bn is not None) and not quads:
        return None  # graph term in N-Triples → slow path raises properly
    s: Term = IRI(s_iri) if s_iri is not None else BlankNode(s_bn)
    if o_iri is not None:
        o: Term = IRI(o_iri)
    elif o_bn is not None:
        o = BlankNode(o_bn)
    else:
        if o_lang is not None:
            if not is_valid_lang_tag(o_lang):
                return None  # slow path produces the right error
            o = Literal(o_lex, lang=o_lang)
        elif o_dt is not None:
            if o_dt in (RDF_LANGSTRING, RDF_DIRLANGSTRING):
                return None
            o = Literal(o_lex, datatype=o_dt)
        else:
            o = Literal(o_lex)
    g: Optional[Term] = None
    if g_iri is not None:
        g = IRI(g_iri)
    elif g_bn is not None:
        g = BlankNode(g_bn)
    return Quad(s, IRI(pred), o, g)


def _parse_core(line: str, allow_star: bool = False,
                generalized: bool = False) -> Tuple[_Cursor, Term, Term, Term]:
    cur = _Cursor(line, allow_star=allow_star)
    cur.skip_ws()
    subject = cur.parse_subject(allow_triple_term=allow_star)
    cur.skip_ws()
    if cur.startswith("<<"):
        raise cur.error("triple term cannot be used as predicate")
    if generalized and cur.startswith("_:"):
        # generalized RDF (produceGeneralizedRdf): bnode predicates allowed
        predicate: Term = cur.parse_subject()
    else:
        predicate = cur.parse_iri()
    obj = cur.parse_object()
    return cur, subject, predicate, obj


def parse_ntriples_line(line: str, allow_star: bool = False) -> Optional[Quad]:
    """Parse one N-Triples line; None for blank/comment lines."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    fast = _fast_line(line, quads=False)
    if fast is not None:
        return fast
    cur, s, p, o = _parse_core(line, allow_star=allow_star)
    cur.skip_ws()
    if not cur.consume("."):
        raise cur.error("expected '.' at end of statement")
    cur.skip_ws()
    if cur.pos < len(cur.input) and cur.input[cur.pos] not in "#\r\n":
        raise cur.error("graph term not allowed in N-Triples")
    return Quad(s, p, o, None)


def parse_nquads_line(line: str, generalized: bool = False,
                      allow_star: bool = False) -> Optional[Quad]:
    """Parse one N-Quads line; None for blank/comment lines."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    fast = _fast_line(line, quads=True)
    if fast is not None:
        return fast
    cur, s, p, o = _parse_core(line, generalized=generalized,
                               allow_star=allow_star)
    graph = cur.parse_optional_graph()
    cur.skip_ws()
    if not cur.consume("."):
        raise cur.error("expected '.' at end of statement")
    cur.skip_ws()
    if cur.pos < len(cur.input) and cur.input[cur.pos] not in "#\r\n":
        raise cur.error("unexpected trailing content")
    return Quad(s, p, o, graph)


def parse_document(text: str, quads: bool = False,
                   max_line_bytes: int = 1 << 20,
                   max_triples: int = 0,
                   allow_star: bool = False,
                   generalized: bool = False) -> Tuple[List[Quad], List[ParseError]]:
    """Parse a whole N-Triples/N-Quads document.

    Returns (statements, errors); errors carry line numbers so callers can
    route bad lines to a quarantine DataFrame instead of failing the job
    (Spark-side replacement for the reference's sticky decoder error).
    """
    if quads:
        def parse(line):
            return parse_nquads_line(line, generalized=generalized,
                                     allow_star=allow_star)
    else:
        def parse(line):
            return parse_ntriples_line(line, allow_star=allow_star)
    out: List[Quad] = []
    errs: List[ParseError] = []
    for lineno, line in enumerate(text.split("\n"), start=1):
        if max_line_bytes and len(line) > max_line_bytes:
            errs.append(ParseError("line exceeds MaxLineBytes", line=lineno,
                                   code="ERR_LIMIT"))
            continue
        try:
            st = parse(line)
        except ParseError as e:
            e.line = lineno
            e.excerpt = line[:80]
            errs.append(e)
            continue
        if st is not None:
            if max_triples and len(out) >= max_triples:
                errs.append(ParseError("triple limit exceeded", line=lineno,
                                       code="ERR_LIMIT"))
                break
            out.append(st)
    return out, errs
