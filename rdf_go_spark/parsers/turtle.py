"""Turtle (RDF 1.1 + RDF-star/1.2 extensions) document parser.

From-scratch recursive-descent cursor parser over the whole document —
NOT a translation of the reference's two Go implementations (token path
rdf/turtle_parser.go, cursor path rdf/turtle.go); only the emitted triple
sets are matched, validated against the W3C turtle suite including the
``eval`` pairs (.ttl → expected .nt).

Feature parity targets:
- directives: @prefix/@base/@version + SPARQL-style PREFIX/BASE
  (rdf/turtle_parser.go:187-230)
- prefixed names with PN_LOCAL escapes and percent encoding
  (rdf/turtle.go:695-763)
- ``a`` → rdf:type (rdf/turtle.go:271-276)
- all four string forms + escape whitelist (rdf/turtle.go:805-998)
- bare numerics / booleans → xsd datatypes (rdf/turtle.go:588-693)
- collections ( … ) → rdf:first/rest/nil (rdf/turtle.go:18-56)
- blank-node property lists [ … ] (rdf/turtle.go:1259-1345)
- RDF-star: ``<< s p o >>`` quoted triples (subject/object),
  ``<<( s p o )>>`` triple terms, ``~ r`` reifiers emitting
  ``r rdf:reifies <<(s p o)>>``, annotations ``{| … |}``
  (rdf/turtle.go:1004-1198)
- document-scoped generated bnode labels ``b1, b2, …``
  (rdf/common_utils.go:7-32) — overridable factory for skolemization

Spark usage: one document per ``mapInPandas`` input row; prefixes/base are
document state so the fold never crosses rows (SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from ..terms import (
    IRI, BlankNode, Literal, ParseError, Quad, Term, TripleTerm,
    RDF_FIRST, RDF_NIL, RDF_REIFIES, RDF_REST, RDF_TYPE,
    XSD_BOOLEAN, RDF_LANGSTRING, RDF_DIRLANGSTRING,
    classify_numeric, is_valid_lang_tag, resolve_iri, unescape_iri,
    unescape_string,
)

_PN_LOCAL_ESC = set("_~.-!$&'()*+,;=/?#@%")
_WS = set(" \t\r\n")
_HEX = set("0123456789abcdefABCDEF")


def _default_bnode_factory():
    counter = [0]

    def gen() -> BlankNode:
        counter[0] += 1
        return BlankNode(f"b{counter[0]}")

    return gen


class TurtleParser:
    def __init__(self, text: str, base: str = "",
                 bnode_factory: Optional[Callable[[], BlankNode]] = None,
                 max_depth: int = 100, star_semantics: str = "rdf12"):
        """``star_semantics``: "rdf12" (default) = RDF 1.2 reifier
        semantics (``<< s p o >>`` mints R + ``R rdf:reifies <<(s p o)>>``,
        ``~`` reifiers, triple terms). "cg" = legacy 2021 Community Group
        semantics (the reference's mode, rdf/turtle.go:1004-1072): quoted
        triples ARE direct terms in subject/object position; annotations
        attach to the quoted triple itself; no ``~`` and no ``<<( )>>``.
        The two grammars are mutually contradictory — pick per document."""
        self.s = text
        self.pos = 0
        self.n = len(text)
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.version: Optional[str] = None
        self.new_bnode = bnode_factory or _default_bnode_factory()
        self.max_depth = max_depth
        self.star_semantics = star_semantics
        self.triples: List[Quad] = []

    # -- low-level ----------------------------------------------------------

    def error(self, msg: str) -> ParseError:
        line = self.s.count("\n", 0, self.pos) + 1
        col = self.pos - (self.s.rfind("\n", 0, self.pos) + 1)
        return ParseError(msg, line=line, col=col,
                          excerpt=self.s[self.pos:self.pos + 40])

    def skip_ws(self) -> None:
        s, n = self.s, self.n
        p = self.pos
        while p < n:
            ch = s[p]
            if ch in _WS:
                p += 1
            elif ch == "#":
                nl = s.find("\n", p)
                p = n if nl < 0 else nl + 1
            else:
                break
        self.pos = p

    def peek(self, k: int = 0) -> str:
        i = self.pos + k
        return self.s[i] if i < self.n else ""

    def startswith(self, t: str) -> bool:
        return self.s.startswith(t, self.pos)

    def expect(self, ch: str) -> None:
        if not self.startswith(ch):
            raise self.error(f"expected {ch!r}")
        self.pos += len(ch)

    def at_end(self) -> bool:
        self.skip_ws()
        return self.pos >= self.n

    # -- document -----------------------------------------------------------

    def _emit(self, s, p, o) -> None:
        self.triples.append(Quad(s, p, o, None))

    def parse(self) -> List[Quad]:
        while not self.at_end():
            self.parse_statement()
        return self.triples

    def parse_statement(self) -> None:
        if self.peek() == "@":
            self.parse_at_directive()
            return
        word = self._peek_word()
        if word.upper() in ("PREFIX", "BASE", "VERSION") and \
                self._is_sparql_directive(word):
            self.parse_sparql_directive(word)
            return
        self.parse_triples()
        self.skip_ws()
        self.expect(".")

    def _peek_word(self) -> str:
        i = self.pos
        while i < self.n and (self.s[i].isalpha()):
            i += 1
        return self.s[i:i + 0] if i == self.pos else self.s[self.pos:i]

    def _is_sparql_directive(self, word: str) -> bool:
        # distinguish "PREFIX foo: <..>" from a subject named PREFIX...
        i = self.pos + len(word)
        while i < self.n and self.s[i] in _WS:
            i += 1
        if word.upper() == "PREFIX":
            return True  # must be followed by PNAME_NS, validated later
        return i < self.n and self.s[i] in "<\"'"

    def parse_at_directive(self) -> None:
        if self.startswith("@prefix"):
            self.pos += 7
            self._read_prefix_binding()
            self.skip_ws()
            self.expect(".")
        elif self.startswith("@base"):
            self.pos += 5
            self._read_base_binding()
            self.skip_ws()
            self.expect(".")
        elif self.startswith("@version"):
            self.pos += 8
            self.skip_ws()
            self.version = self._parse_version_string()
            self.skip_ws()
            self.expect(".")
        else:
            raise self.error("unknown directive")

    def parse_sparql_directive(self, word: str) -> None:
        self.pos += len(word)
        up = word.upper()
        if up == "PREFIX":
            self._read_prefix_binding()
        elif up == "BASE":
            self._read_base_binding()
        else:  # VERSION
            self.skip_ws()
            self.version = self._parse_version_string()
        # SPARQL-style directives take no trailing dot
        self.skip_ws()
        if self.peek() == ".":
            raise self.error(f"{word} directive must not end with '.'")

    def _parse_version_string(self) -> str:
        # version value must be a SHORT string (turtle12-version-bad-02/05/06)
        if self.startswith('"""') or self.startswith("'''"):
            raise self.error("version must be a short string literal")
        return self.parse_string_body()

    def _read_prefix_binding(self) -> None:
        self.skip_ws()
        start = self.pos
        while self.pos < self.n and self.s[self.pos] != ":":
            if self.s[self.pos] in _WS or self.s[self.pos] == "<":
                raise self.error("expected prefix name")
            self.pos += 1
        if self.pos >= self.n:
            raise self.error("expected ':' in prefix declaration")
        prefix = self.s[start:self.pos]
        if prefix:
            # PN_PREFIX: starts with a letter, no leading/trailing dot
            if not (prefix[0].isalpha() or ord(prefix[0]) >= 0x80) or \
                    prefix.endswith("."):
                raise self.error(f"invalid prefix name {prefix!r}")
        self.pos += 1  # ':'
        self.skip_ws()
        iri = self.parse_iriref_value()
        self.prefixes[prefix] = iri

    def _read_base_binding(self) -> None:
        self.skip_ws()
        self.base = self.parse_iriref_value()

    # -- triples ------------------------------------------------------------

    def parse_triples(self) -> None:
        self.skip_ws()
        ch = self.peek()
        if ch == "[":
            # blank node property list as subject; po-list afterwards optional
            subject = self.parse_bnode_property_list(0)
            self.skip_ws()
            if self.peek() not in (".", "}", ""):
                self.parse_predicate_object_list(subject, 0)
        elif self.startswith("<<"):
            # reified triple as subject; standalone statement allowed in
            # RDF 1.2 (w3c turtle12-syntax-basic-04) — but NOT in CG
            # semantics (turtle-star-syntax-bad-02: a quoted triple alone
            # asserts nothing and the grammar requires a po-list)
            subject = self.parse_subject(0)
            self.skip_ws()
            if self.star_semantics == "cg":
                if self.peek() in (".", "}", ""):
                    raise self.error(
                        "quoted-triple subject requires predicate-object "
                        "list under CG star semantics")
                self.parse_predicate_object_list(subject, 0)
            elif self.peek() not in (".", "}", ""):
                self.parse_predicate_object_list(subject, 0)
        else:
            subject = self.parse_subject(0)
            self.parse_predicate_object_list(subject, 0)

    def parse_subject(self, depth: int) -> Term:
        self.skip_ws()
        ch = self.peek()
        if ch == "(":
            return self.parse_collection(depth)
        if ch == "[":
            return self.parse_bnode_property_list(depth)
        if self.startswith("<<"):
            return self.parse_quoted_triple(depth, as_subject=True)
        if self.startswith("_:"):
            return self.parse_bnode_label()
        if ch == "<":
            return self.parse_iriref()
        term = self.parse_prefixed_or_keyword(allow_literal=False)
        if isinstance(term, Literal):
            raise self.error("literal cannot be subject")
        return term

    def parse_predicate(self) -> IRI:
        self.skip_ws()
        if self.peek() == "<":
            return self.parse_iriref()
        # 'a' keyword → rdf:type (rdf/turtle.go:271-276)
        if self.peek() == "a" and (self.pos + 1 >= self.n or
                                   self.s[self.pos + 1] in _WS or
                                   self.s[self.pos + 1] in "<[(\"'#"):
            self.pos += 1
            return IRI(RDF_TYPE)
        term = self.parse_prefixed_or_keyword(allow_literal=False)
        if not isinstance(term, IRI):
            raise self.error("predicate must be an IRI")
        return term

    def parse_predicate_object_list(self, subject: Term, depth: int) -> None:
        while True:
            pred = self.parse_predicate()
            self.parse_object_list(subject, pred, depth)
            self.skip_ws()
            had_semi = False
            while self.peek() == ";":
                had_semi = True
                self.pos += 1
                self.skip_ws()
            if had_semi and self.peek() not in (".", "", "]", "|"):
                # another predicate follows
                if self.peek() == "}":
                    return
                continue
            return

    def parse_object_list(self, subject: Term, pred: IRI, depth: int) -> None:
        while True:
            obj = self.parse_object(depth)
            self._emit(subject, pred, obj)
            self._parse_annotation_postfix(subject, pred, obj, depth)
            self.skip_ws()
            if self.peek() == ",":
                self.pos += 1
                continue
            return

    def _parse_annotation_postfix(self, subject: Term, pred: IRI, obj: Term,
                                  depth: int) -> None:
        """RDF 1.2 ``annotation ::= (reifier | annotationBlock)*`` after an
        object: each ``~ r`` emits ``r rdf:reifies <<(s p o)>>`` and sets the
        current reifier; each ``{| … |}`` block attaches its triples to the
        current reifier (minting a fresh one + reifies triple if none).
        Each block consumes the pending ``~`` reifier if present, else mints
        a fresh one; consecutive blocks get fresh reifiers
        (turtle12-eval-annotation-06 vs -10).

        CG semantics: no reifiers exist — each ``{| … |}`` block's triples
        attach directly to the quoted triple ``<< s p o >>`` as subject
        (turtle-star-eval-annotation-1..5)."""
        if self.star_semantics == "cg":
            while True:
                self.skip_ws()
                if self.startswith("{|"):
                    self.parse_annotation_block(
                        TripleTerm(subject, pred, obj), depth)
                elif self.peek() == "~":
                    raise self.error(
                        "'~' reifier requires RDF 1.2 star semantics")
                else:
                    return
        pending: Optional[Term] = None
        while True:
            self.skip_ws()
            if self.peek() == "~":
                self.pos += 1
                self.skip_ws()
                if self.startswith("{|") or self.peek() in ",;.]" or self.peek() == "":
                    reifier: Term = self.new_bnode()
                else:
                    r = self.parse_object(depth + 1)
                    if not isinstance(r, (IRI, BlankNode)):
                        raise self.error("reifier must be IRI or blank node")
                    reifier = r
                self._emit(reifier, IRI(RDF_REIFIES),
                           TripleTerm(subject, pred, obj))
                pending = reifier
            elif self.startswith("{|"):
                if pending is None:
                    pending = self.new_bnode()
                    self._emit(pending, IRI(RDF_REIFIES),
                               TripleTerm(subject, pred, obj))
                self.parse_annotation_block(pending, depth)
                pending = None
            else:
                return

    def parse_object(self, depth: int) -> Term:
        self.skip_ws()
        ch = self.peek()
        if ch == "(":
            return self.parse_collection(depth)
        if ch == "[":
            return self.parse_bnode_property_list(depth)
        if self.startswith("<<"):
            return self.parse_quoted_triple(depth)
        if self.startswith("_:"):
            return self.parse_bnode_label()
        if ch == "<":
            return self.parse_iriref()
        if ch in "\"'" or ch.isdigit() or ch in "+-" or ch == ".":
            lit = self.try_parse_literal()
            if lit is not None:
                return lit
        return self.parse_prefixed_or_keyword(allow_literal=True)

    # -- structures ---------------------------------------------------------

    def parse_collection(self, depth: int) -> Term:
        """( o1 o2 … ) → rdf:first/rest chain (rdf/turtle.go:18-56)."""
        if depth >= self.max_depth:
            raise self.error("max depth exceeded")
        self.expect("(")
        items: List[Term] = []
        while True:
            self.skip_ws()
            if self.peek() == ")":
                self.pos += 1
                break
            if self.pos >= self.n:
                raise self.error("unterminated collection")
            items.append(self.parse_object(depth + 1))
        if not items:
            return IRI(RDF_NIL)
        head = self.new_bnode()
        node = head
        for i, item in enumerate(items):
            self._emit(node, IRI(RDF_FIRST), item)
            if i + 1 < len(items):
                nxt = self.new_bnode()
                self._emit(node, IRI(RDF_REST), nxt)
                node = nxt
            else:
                self._emit(node, IRI(RDF_REST), IRI(RDF_NIL))
        return head

    def parse_bnode_property_list(self, depth: int) -> Term:
        """[ p o ; … ] (rdf/turtle.go:1259-1345)."""
        if depth >= self.max_depth:
            raise self.error("max depth exceeded")
        self.expect("[")
        self.skip_ws()
        node = self.new_bnode()
        if self.peek() == "]":
            self.pos += 1
            return node
        self.parse_predicate_object_list(node, depth + 1)
        self.skip_ws()
        self.expect("]")
        return node

    def parse_quoted_triple(self, depth: int, as_subject: bool = False) -> Term:
        """RDF 1.2 quoted forms (golden: w3c turtle12-eval fixtures):

        - ``<<( s p o )>>`` triple term — a Term (object position only)
        - ``<< s p o >>`` reified triple — mints a fresh bnode reifier R,
          emits ``R rdf:reifies <<(s p o)>>``, and the term IS R
        - ``<< s p o ~ r >>`` — same with explicit reifier r
        """
        if depth >= self.max_depth:
            raise self.error("max depth exceeded")
        if self.star_semantics == "cg":
            # CG: << s p o >> IS the term — no reifier, no triple-term or
            # '~' productions (those are RDF 1.2-only grammar)
            self.expect("<<")
            self.skip_ws()
            if self.peek() == "(":
                raise self.error(
                    "'<<(' triple term requires RDF 1.2 star semantics")
            s = self.parse_quoted_term(depth + 1, subject=True)
            p = self.parse_predicate()
            o = self.parse_quoted_term(depth + 1, subject=False)
            self.skip_ws()
            if self.peek() == "~":
                raise self.error(
                    "'~' reifier requires RDF 1.2 star semantics")
            self.expect(">>")
            return TripleTerm(s, p, o)
        self.expect("<<")
        if self.peek() == "(":
            if as_subject:
                raise self.error("triple term cannot be subject")
            self.pos += 1
            self.skip_ws()
            s = self.parse_quoted_term(depth + 1, subject=True, in_triple_term=True)
            p = self.parse_predicate()
            o = self.parse_quoted_term(depth + 1, subject=False, in_triple_term=True)
            self.skip_ws()
            self.expect(")")
            self.skip_ws()
            self.expect(">>")
            return TripleTerm(s, p, o)
        self.skip_ws()
        if self.peek() == "(":
            raise self.error("unexpected '(' after '<<'")
        s = self.parse_quoted_term(depth + 1, subject=True)
        p = self.parse_predicate()
        o = self.parse_quoted_term(depth + 1, subject=False)
        self.skip_ws()
        if self.peek() == "~":
            self.pos += 1
            self.skip_ws()
            if self.startswith(">>"):
                reifier: Term = self.new_bnode()
            else:
                r = self.parse_quoted_term(depth + 1, subject=True)
                if not isinstance(r, (IRI, BlankNode)):
                    raise self.error("reifier must be IRI or blank node")
                reifier = r
        else:
            reifier = self.new_bnode()
        self._emit(reifier, IRI(RDF_REIFIES), TripleTerm(s, p, o))
        self.skip_ws()
        self.expect(">>")
        return reifier

    def parse_quoted_term(self, depth: int, subject: bool,
                          in_triple_term: bool = False) -> Term:
        """Terms inside ``<< … >>``: IRI / blank node / ANON / nested quoted
        forms; literals in object position only. Collections and non-empty
        property lists are forbidden (w3c turtle12-syntax-bad-06/07)."""
        self.skip_ws()
        if self.startswith("<<"):
            return self.parse_quoted_triple(depth)
        if self.startswith("_:"):
            return self.parse_bnode_label()
        if self.peek() == "[":
            self.pos += 1
            self.skip_ws()
            if self.peek() != "]":
                raise self.error("property list not allowed in quoted triple")
            self.pos += 1
            return self.new_bnode()
        if self.peek() == "(":
            raise self.error("collection not allowed in quoted triple")
        if self.peek() == "<":
            return self.parse_iriref()
        if not subject:
            ch = self.peek()
            if ch in "\"'" or ch.isdigit() or ch in "+-.":
                lit = self.try_parse_literal()
                if lit is not None:
                    return lit
            return self.parse_prefixed_or_keyword(allow_literal=True)
        term = self.parse_prefixed_or_keyword(allow_literal=False)
        if isinstance(term, Literal):
            raise self.error("literal cannot be quoted subject")
        return term

    def parse_annotation_block(self, reifier: Term, depth: int) -> None:
        """``{| p o ; … |}`` — a predicateObjectList about the reifier;
        nested annotations recurse through the same postfix logic."""
        if depth >= self.max_depth:
            raise self.error("max depth exceeded")
        self.expect("{|")
        self.skip_ws()
        while True:
            pred = self.parse_predicate()
            while True:
                obj = self.parse_object(depth + 1)
                self._emit(reifier, pred, obj)
                self._parse_annotation_postfix(reifier, pred, obj, depth + 1)
                self.skip_ws()
                if self.peek() == ",":
                    self.pos += 1
                    self.skip_ws()
                    continue
                break
            self.skip_ws()
            had_semi = False
            while self.peek() == ";":
                had_semi = True
                self.pos += 1
                self.skip_ws()
            if self.startswith("|}"):
                self.pos += 2
                return
            if not had_semi:
                raise self.error("expected ',' or ';' or '|}' in annotation")

    # -- terminals ----------------------------------------------------------

    def parse_iriref_value(self) -> str:
        """<...> raw value, unescaped and base-resolved."""
        self.expect("<")
        start = self.pos
        s, n = self.s, self.n
        while self.pos < n and s[self.pos] != ">":
            ch = s[self.pos]
            if ch in " \t\n\r" or ch in '"{}|^`' or ord(ch) < 0x20:
                raise self.error("invalid character in IRI")
            if ch == "\\":
                nxt = s[self.pos + 1] if self.pos + 1 < n else ""
                if nxt == "u":
                    if self.pos + 5 >= n or any(c not in _HEX for c in s[self.pos + 2:self.pos + 6]):
                        raise self.error("invalid escape in IRI")
                    self.pos += 6
                    continue
                if nxt == "U":
                    if self.pos + 9 >= n or any(c not in _HEX for c in s[self.pos + 2:self.pos + 10]):
                        raise self.error("invalid escape in IRI")
                    self.pos += 10
                    continue
                raise self.error("invalid escape in IRI")
            self.pos += 1
        if self.pos >= n:
            raise self.error("unterminated IRI")
        raw = s[start:self.pos]
        self.pos += 1
        value = unescape_iri(raw)
        # unescaped result must still be IRIREF-clean
        # (w3c turtle-eval-bad-01..03:  /</> are invalid)
        for ch2 in value:
            if ord(ch2) <= 0x20 or ch2 in '<>"{}|^`\\':
                raise self.error("invalid character in IRI after unescaping")
        if self.base:
            value = resolve_iri(self.base, value)
        return value

    def parse_iriref(self) -> IRI:
        return IRI(self.parse_iriref_value())

    def parse_bnode_label(self) -> BlankNode:
        self.expect("_:")
        start = self.pos
        s, n = self.s, self.n
        first = True
        while self.pos < n:
            ch = s[self.pos]
            if ch.isalnum() or ch == "_" or ord(ch) >= 0x80:
                self.pos += 1
            elif not first and ch in "-.":
                # '.' allowed mid-label only (not trailing, checked below)
                self.pos += 1
            else:
                break
            first = False
        label = s[start:self.pos]
        while label.endswith("."):
            label = label[:-1]
            self.pos -= 1
        if not label or label[0] == "-" or label[0] == ".":
            raise self.error("invalid blank node label")
        return BlankNode(label)

    def parse_prefixed_or_keyword(self, allow_literal: bool) -> Term:
        """PNAME / true / false."""
        self.skip_ws()
        start = self.pos
        s, n = self.s, self.n
        # scan prefix part up to ':'
        i = self.pos
        while i < n and (s[i].isalnum() or s[i] in "_-." or ord(s[i]) >= 0x80):
            i += 1
        word = s[start:i]
        if i >= n or s[i] != ":":
            if word == "true" or word == "false":
                if not allow_literal:
                    raise self.error("boolean literal not allowed here")
                self.pos = i
                return Literal(word, datatype=XSD_BOOLEAN)
            raise self.error(f"unexpected token {word[:20]!r}")
        prefix = word
        if prefix and (prefix[0] == "-" or prefix[0].isdigit() or "." in prefix and prefix.endswith(".")):
            raise self.error("invalid prefix name")
        if prefix not in self.prefixes:
            raise self.error(f"undefined prefix: {prefix!r}")
        self.pos = i + 1  # past ':'
        local = self._parse_pn_local()
        return IRI(self.prefixes[prefix] + local)

    def _parse_pn_local(self) -> str:
        out: List[str] = []
        s, n = self.s, self.n
        while self.pos < n:
            ch = s[self.pos]
            if ch.isalnum() or ch == "_" or ch == ":" or ord(ch) >= 0x80:
                out.append(ch)
                self.pos += 1
            elif ch == "%":
                if self.pos + 2 >= n or s[self.pos + 1] not in _HEX or s[self.pos + 2] not in _HEX:
                    raise self.error("invalid percent encoding in local name")
                out.append(s[self.pos:self.pos + 3])
                self.pos += 3
            elif ch == "\\":
                nxt = s[self.pos + 1] if self.pos + 1 < n else ""
                if nxt not in _PN_LOCAL_ESC:
                    raise self.error("invalid local name escape")
                out.append(nxt)
                self.pos += 2
            elif ch == "-":
                out.append(ch)
                self.pos += 1
            elif ch == ".":
                # dot allowed mid-local only
                j = self.pos + 1
                if j < n and (s[j].isalnum() or s[j] in "_-:%\\." or ord(s[j]) >= 0x80):
                    out.append(ch)
                    self.pos += 1
                else:
                    break
            else:
                break
        local = "".join(out)
        if local and local[0] == "-":
            raise self.error("invalid local name")
        return local

    def try_parse_literal(self) -> Optional[Term]:
        ch = self.peek()
        if ch in "\"'":
            lexical = self.parse_string_body()
            self.skip_ws()
            if self.peek() == "@":
                self.pos += 1
                start = self.pos
                while self.pos < self.n and (self.s[self.pos].isalnum() or
                                             self.s[self.pos] == "-"):
                    self.pos += 1
                lang = self.s[start:self.pos]
                if not is_valid_lang_tag(lang):
                    raise self.error(f"invalid language tag {lang!r}")
                if self.startswith("^^"):
                    raise self.error("literal cannot have both language tag and datatype")
                return Literal(lexical, lang=lang)
            if self.startswith("^^"):
                self.pos += 2
                self.skip_ws()
                if self.peek() == "<":
                    dt = self.parse_iriref()
                else:
                    dt_term = self.parse_prefixed_or_keyword(allow_literal=False)
                    if not isinstance(dt_term, IRI):
                        raise self.error("datatype must be IRI")
                    dt = dt_term
                if dt.value in (RDF_LANGSTRING, RDF_DIRLANGSTRING):
                    raise self.error("langString cannot be an explicit datatype")
                return Literal(lexical, datatype=dt.value)
            return Literal(lexical)
        # numeric (rdf/turtle.go:588-673)
        start = self.pos
        i = self.pos
        s, n = self.s, self.n
        if i < n and s[i] in "+-":
            i += 1
        seen_digit_or_dot = False
        while i < n and (s[i].isdigit() or s[i] in ".eE+-"):
            if s[i] in "+-" and s[i - 1] not in "eE":
                break
            i += 1
            seen_digit_or_dot = True
        if not seen_digit_or_dot:
            return None
        token = s[start:i]
        # '.' terminator disambiguation: "1." at statement end is "1" + "."
        while token and token.endswith(".") and classify_numeric(token) is None:
            token = token[:-1]
            i -= 1
        dt = classify_numeric(token)
        if dt is None:
            return None
        self.pos = i
        return Literal(token, datatype=dt)

    def parse_string_body(self) -> str:
        """All four Turtle string forms, unescaped (rdf/turtle.go:805-998)."""
        s, n = self.s, self.n
        for quote in ('"""', "'''"):
            if self.startswith(quote):
                self.pos += 3
                start = self.pos
                idx = s.find(quote, self.pos)
                while idx >= 0:
                    # count preceding backslashes
                    j = idx - 1
                    nback = 0
                    while j >= start and s[j] == "\\":
                        nback += 1
                        j -= 1
                    if nback % 2 == 0:
                        break
                    idx = s.find(quote, idx + 1)
                if idx < 0:
                    raise self.error("unterminated long string")
                # the FIRST unescaped triple-quote closes the string; content
                # may not end with an unescaped quote
                # (w3c turtle-syntax-bad-string-06/07)
                raw = s[start:idx]
                self.pos = idx + 3
                return unescape_string(raw)
        quote = self.peek()
        if quote not in "\"'":
            raise self.error("expected string literal")
        self.pos += 1
        start = self.pos
        while self.pos < n:
            ch = s[self.pos]
            if ch == "\\":
                if self.pos + 1 >= n:
                    raise self.error("unterminated escape")
                self.pos += 2
                continue
            if ch == quote:
                break
            if ch == "\n" or ch == "\r":
                raise self.error("newline in short string")
            self.pos += 1
        if self.pos >= n:
            raise self.error("unterminated string")
        raw = s[start:self.pos]
        self.pos += 1
        return unescape_string(raw)


def parse_turtle(text: str, base: str = "",
                 bnode_factory: Optional[Callable[[], BlankNode]] = None,
                 star_semantics: str = "rdf12"
                 ) -> Tuple[List[Quad], List[ParseError]]:
    """Parse a Turtle document; single quarantined error (parse aborts at
    the first syntax error, like the reference's sticky decoder).
    ``star_semantics="cg"`` opts into legacy 2021 CG RDF-star."""
    parser = TurtleParser(text, base=base, bnode_factory=bnode_factory,
                          star_semantics=star_semantics)
    try:
        return parser.parse(), []
    except ParseError as e:
        return parser.triples, [e]
    except RecursionError:
        return parser.triples, [ParseError("max depth exceeded", code="ERR_DEPTH")]
