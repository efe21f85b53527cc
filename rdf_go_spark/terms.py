"""RDF 1.1/1.2 term kernel — pure Python, no Spark dependency.

This is the semantic core every parser/encoder and the KG pipeline share.
Behavior parity targets (reference = geoknoesis/rdf-go, cited file:line):

- Term model: IRI / BlankNode / Literal / TripleTerm (rdf/model.go:6-89).
- Canonical N-Triples rendering with Go ``%q`` literal quoting
  (rdf/ntriples.go:702-721).
- String unescaping with the exact escape whitelist and surrogate-pair
  handling (rdf/parse_utils.go:358-484).
- Language-tag validation incl. RDF 1.2 direction suffixes ``--ltr/--rtl``
  (rdf/parse_utils.go:52-96).
- Absolute-IRI scheme validation (rdf/ntriples.go:383-418).
- RFC 3986 relative-IRI resolution with concat fallback
  (rdf/iri_resolve.go:9-44).
- Bare-numeric / boolean datatype assignment rules (rdf/turtle.go:588-693).

The implementation is from scratch (idiomatic Python dataclasses); only the
observable behavior is matched.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union
from urllib.parse import urljoin

# Well-known IRIs
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_REIFIES = RDF_NS + "reifies"
RDF_LANGSTRING = RDF_NS + "langString"
RDF_DIRLANGSTRING = RDF_NS + "dirLangString"
RDF_JSON = RDF_NS + "JSON"
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"
XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_BOOLEAN = XSD_NS + "boolean"


class ParseError(ValueError):
    """Structured parse error with position info (rdf/errors.go:96-200)."""

    def __init__(self, message: str, line: int = 0, col: int = 0,
                 code: str = "ERR_SYNTAX", excerpt: str = ""):
        super().__init__(message)
        self.message = message
        self.line = line
        self.col = col
        self.code = code
        self.excerpt = excerpt

    def __str__(self) -> str:  # noqa: D105
        if self.line:
            return f"{self.code} at {self.line}:{self.col}: {self.message}"
        return f"{self.code}: {self.message}"


# ---------------------------------------------------------------------------
# Term model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class IRI:
    value: str

    def __str__(self) -> str:
        return f"<{self.value}>"


@dataclass(frozen=True)
class BlankNode:
    id: str

    def __str__(self) -> str:
        return f"_:{self.id}"


@dataclass(frozen=True)
class Literal:
    lexical: str
    datatype: str = ""  # IRI string; "" means plain / implied xsd:string
    lang: str = ""      # language tag, possibly with --ltr/--rtl suffix

    def __str__(self) -> str:
        return render_term(self)


@dataclass(frozen=True)
class TripleTerm:
    """RDF-star quoted triple; S/O may nest recursively (rdf/model.go:74-89).

    Canonical rendering uses the RDF 1.2 triple-term form ``<<( s p o )>>``
    (w3c-tests/ntriples/c14n/triple-term-01.nt)."""
    s: "Term"
    p: IRI
    o: "Term"

    def __str__(self) -> str:
        return f"<<( {render_term(self.s)} {render_term(self.p)} {render_term(self.o)} )>>"


Term = Union[IRI, BlankNode, Literal, TripleTerm]


@dataclass(frozen=True)
class Quad:
    s: Term
    p: IRI
    o: Term
    g: Optional[Term] = None  # None = default graph (rdf/model.go:178-181)


# ---------------------------------------------------------------------------
# Go %q-compatible quoting (rdf/ntriples.go:708-715 uses fmt %q)
# ---------------------------------------------------------------------------

_GO_SPECIAL = {
    "\a": "\\a", "\b": "\\b", "\f": "\\f", "\n": "\\n",
    "\r": "\\r", "\t": "\\t", "\v": "\\v", '"': '\\"', "\\": "\\\\",
}


def go_quote(s: str) -> str:
    """Quote a string the way Go's ``fmt %q`` / ``strconv.Quote`` does.

    Printable runes pass through; control/non-printable runes become
    ``\\xHH`` / ``\\uXXXX`` / ``\\UXXXXXXXX``.
    """
    out = ['"']
    for ch in s:
        esc = _GO_SPECIAL.get(ch)
        if esc is not None:
            out.append(esc)
            continue
        cp = ord(ch)
        if ch == " " or ch.isprintable():
            out.append(ch)
        elif cp < 0x80:
            out.append(f"\\x{cp:02x}")
        elif cp < 0x10000:
            out.append(f"\\u{cp:04x}")
        else:
            out.append(f"\\U{cp:08x}")
    out.append('"')
    return "".join(out)


def render_iri(value: str) -> str:
    return f"<{value}>"


# Canonical N-Triples (RDF 1.2 c14n) literal quoting: ECHAR for
# \b \t \n \r \f \" \\ ; other C0 controls and U+007F as uppercase-hex
# \uXXXX; everything else as raw UTF-8
# (golden: w3c-tests/ntriples/c14n/literal_all_controls-c14n.nt).
_C14N_SPECIAL = {
    "\b": "\\b", "\t": "\\t", "\n": "\\n", "\r": "\\r", "\f": "\\f",
    '"': '\\"', "\\": "\\\\",
}


def c14n_quote(s: str) -> str:
    """Quote a literal lexical form per canonical N-Triples."""
    out = ['"']
    for ch in s:
        esc = _C14N_SPECIAL.get(ch)
        if esc is not None:
            out.append(esc)
            continue
        cp = ord(ch)
        if cp < 0x20 or cp == 0x7F or cp in (0xFFFE, 0xFFFF):
            out.append(f"\\u{cp:04X}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def render_term(t: Term) -> str:
    """Canonical N-Triples term rendering.

    This is the pipeline's interchange form (reference analogue:
    renderTerm rdf/ntriples.go:702-721, tightened to W3C canonical
    N-Triples so the c14n golden suite passes byte-for-byte):
    lang tags lowercased, xsd:string datatype omitted.
    """
    if isinstance(t, IRI):
        return f"<{t.value}>"
    if isinstance(t, BlankNode):
        return f"_:{t.id}"
    if isinstance(t, Literal):
        q = c14n_quote(t.lexical)
        if t.lang:
            return f"{q}@{t.lang.lower()}"
        if t.datatype and t.datatype != XSD_STRING:
            return f"{q}^^<{t.datatype}>"
        return q
    if isinstance(t, TripleTerm):
        return str(t)
    raise TypeError(f"not a term: {t!r}")


def render_term_cg(t: Term) -> str:
    """Like ``render_term`` but quoted triples use the legacy 2021 CG
    star syntax ``<< s p o >>`` (valid in subject AND object position
    under that grammar) instead of the RDF 1.2 triple-term ``<<( )>>``
    (object-only). Round-trip partner of ``star_semantics="cg"``."""
    if isinstance(t, TripleTerm):
        return (f"<< {render_term_cg(t.s)} {render_term(t.p)} "
                f"{render_term_cg(t.o)} >>")
    return render_term(t)


# ---------------------------------------------------------------------------
# Unescaping (rdf/parse_utils.go:358-484)
# ---------------------------------------------------------------------------

_SIMPLE_UNESCAPE = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _valid_codepoint(cp: int) -> bool:
    return cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF)


def _hex4(s: str, pos: int) -> int:
    """Parse 4 hex digits at pos; -1 on failure."""
    chunk = s[pos:pos + 4]
    if len(chunk) != 4:
        return -1
    try:
        return int(chunk, 16)
    except ValueError:
        return -1


def unescape_string(s: str) -> str:
    """Decode RDF literal escapes; raises ParseError on any invalid escape.

    Escape whitelist is exact: ``\\n \\t \\r \\b \\f \\" \\' \\\\ \\uXXXX
    \\UXXXXXXXX``; anything else is an error (rdf/parse_utils.go:378).
    Surrogate pairs only via paired ``\\uXXXX`` highs/lows.
    """
    if "\\" not in s:
        return s
    out = []
    pos = 0
    n = len(s)
    while pos < n:
        ch = s[pos]
        if ch != "\\":
            out.append(ch)
            pos += 1
            continue
        if pos + 1 >= n:
            raise ParseError("unterminated escape")
        nxt = s[pos + 1]
        simple = _SIMPLE_UNESCAPE.get(nxt)
        if simple is not None:
            out.append(simple)
            pos += 2
            continue
        if nxt == "u":
            cp = _hex4(s, pos + 2)
            if cp < 0:
                raise ParseError("invalid escape sequence")
            if 0xD800 <= cp <= 0xDBFF:  # high surrogate → need low
                if s[pos + 6:pos + 8] != "\\u":
                    raise ParseError("invalid escape sequence")
                low = _hex4(s, pos + 8)
                if low < 0 or not (0xDC00 <= low <= 0xDFFF):
                    raise ParseError("invalid escape sequence")
                combined = 0x10000 + ((cp - 0xD800) << 10) + (low - 0xDC00)
                out.append(chr(combined))
                pos += 12
                continue
            if 0xDC00 <= cp <= 0xDFFF:
                raise ParseError("invalid escape sequence")
            out.append(chr(cp))
            pos += 6
            continue
        if nxt == "U":
            chunk = s[pos + 2:pos + 10]
            if len(chunk) != 8 or any(c not in "0123456789abcdefABCDEF" for c in chunk):
                raise ParseError("invalid escape sequence")
            cp = int(chunk, 16)
            if not _valid_codepoint(cp):
                raise ParseError("invalid escape sequence")
            out.append(chr(cp))
            pos += 10
            continue
        raise ParseError("invalid escape sequence")
    return "".join(out)


def unescape_iri(s: str) -> str:
    """IRIs permit only \\uXXXX / \\UXXXXXXXX escapes (rdf/ntriples.go:341-371)."""
    if "\\" not in s:
        return s
    out = []
    pos = 0
    n = len(s)
    while pos < n:
        ch = s[pos]
        if ch != "\\":
            out.append(ch)
            pos += 1
            continue
        nxt = s[pos + 1] if pos + 1 < n else ""
        if nxt == "u":
            cp = _hex4(s, pos + 2)
            if cp < 0 or not _valid_codepoint(cp):
                raise ParseError("invalid character in IRI")
            out.append(chr(cp))
            pos += 6
        elif nxt == "U":
            chunk = s[pos + 2:pos + 10]
            if len(chunk) != 8 or any(c not in "0123456789abcdefABCDEF" for c in chunk):
                raise ParseError("invalid character in IRI")
            cp = int(chunk, 16)
            if not _valid_codepoint(cp):
                raise ParseError("invalid character in IRI")
            out.append(chr(cp))
            pos += 10
        else:
            raise ParseError("invalid character in IRI")
    return "".join(out)


# ---------------------------------------------------------------------------
# Language tags (rdf/parse_utils.go:52-96)
# ---------------------------------------------------------------------------

def is_valid_lang_tag(tag: str) -> bool:
    if not tag:
        return False
    if "--" in tag:
        if tag.count("--") > 1:
            return False
        if tag.endswith("--ltr"):
            tag = tag[:-5]
        elif tag.endswith("--rtl"):
            tag = tag[:-5]
        else:
            return False
    parts = tag.split("-")
    if not parts or not (1 <= len(parts[0]) <= 8):
        return False
    for i, part in enumerate(parts):
        if not part:
            return False
        for ch in part:
            if i == 0:
                if not ("a" <= ch <= "z" or "A" <= ch <= "Z"):
                    return False
            else:
                if not (ch.isascii() and ch.isalnum()):
                    return False
    return True


# ---------------------------------------------------------------------------
# IRI validation / resolution
# ---------------------------------------------------------------------------

def has_scheme(value: str) -> bool:
    """Absolute-IRI check used by N-Triples/N-Quads (rdf/ntriples.go:383-418)."""
    if value.startswith("//"):
        return False
    for i, ch in enumerate(value):
        if ch == ":":
            if i > 0:
                scheme = value[:i]
                if all(c.isascii() and (c.isalnum() or c in "+-.") for c in scheme):
                    return True
        if ch in "/?#":
            break
    return False


def validate_iri_strict(value: str) -> Optional[str]:
    """RFC 3987-ish strict validation (rdf/iri_validate.go:19-91).

    Returns an error message or None.
    """
    if not value:
        return "empty IRI"
    for ch in value:
        cp = ord(ch)
        if cp <= 0x20 or cp == 0x7F:
            return "control character or space in IRI"
        if ch in "<>\"{}|^`":
            return f"invalid character {ch!r} in IRI"
    if not has_scheme(value):
        return "missing scheme"
    return None


def _split_iri(iri: str):
    """Split into (scheme, authority, path, query, fragment); authority and
    query/fragment are None when absent."""
    scheme = None
    rest = iri
    for i, ch in enumerate(iri):
        if ch == ":" and i > 0 and has_scheme(iri):
            scheme = iri[:i]
            rest = iri[i + 1:]
            break
        if ch in "/?#":
            break
    fragment = None
    if "#" in rest:
        rest, fragment = rest.split("#", 1)
    query = None
    if "?" in rest:
        rest, query = rest.split("?", 1)
    authority = None
    if rest.startswith("//"):
        rest2 = rest[2:]
        end = len(rest2)
        for j, ch in enumerate(rest2):
            if ch == "/":
                end = j
                break
        authority = rest2[:end]
        path = rest2[end:]
    else:
        path = rest
    return scheme, authority, path, query, fragment


def _merge_paths(base_auth, base_path: str, rel_path: str) -> str:
    if base_auth is not None and not base_path:
        return "/" + rel_path
    idx = base_path.rfind("/")
    if idx < 0:
        return rel_path
    return base_path[:idx + 1] + rel_path


def _remove_dot_segments(path: str) -> str:
    out: list = []
    inp = path
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            start = 1 if inp.startswith("/") else 0
            j = inp.find("/", start)
            if j < 0:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:j])
                inp = inp[j:]
    return "".join(out)


def _recompose(scheme, authority, path, query, fragment) -> str:
    r = ""
    if scheme is not None:
        r += scheme + ":"
    if authority is not None:
        r += "//" + authority
    r += path
    if query is not None:
        r += "?" + query
    if fragment is not None:
        r += "#" + fragment
    return r


def resolve_iri(base: str, rel: str) -> str:
    """RFC 3986 §5.2 reference resolution, implemented directly.

    urllib.parse.urljoin mangles paths containing ``//`` (e.g. base
    ``http://ab//de//ghi``, w3c turtle IRI-resolution-08), and Go's net/url
    keeps them — so we follow the RFC algorithm verbatim. Mirrors the
    reference's resolver incl. its behavior for empty base
    (rdf/iri_resolve.go:9-44).
    """
    if not base:
        return rel
    r_scheme, r_auth, r_path, r_query, r_frag = _split_iri(rel)
    if r_scheme is not None:
        return _recompose(r_scheme, r_auth, _remove_dot_segments(r_path),
                          r_query, r_frag)
    b_scheme, b_auth, b_path, b_query, _ = _split_iri(base)
    if r_auth is not None:
        return _recompose(b_scheme, r_auth, _remove_dot_segments(r_path),
                          r_query, r_frag)
    if not r_path:
        t_path = b_path
        t_query = r_query if r_query is not None else b_query
    else:
        if r_path.startswith("/"):
            t_path = _remove_dot_segments(r_path)
        else:
            t_path = _remove_dot_segments(_merge_paths(b_auth, b_path, r_path))
        t_query = r_query
    return _recompose(b_scheme, b_auth, t_path, t_query, r_frag)


# ---------------------------------------------------------------------------
# Numeric / boolean datatype classification (rdf/turtle.go:588-693,
# rdf/turtle_lexer.go:409-419)
# ---------------------------------------------------------------------------

def classify_numeric(token: str) -> Optional[str]:
    """Return the xsd datatype IRI for a bare Turtle numeric token, or None
    if the token is not a valid numeric literal.

    integer: [+-]?[0-9]+ ; decimal: [+-]?[0-9]*\\.[0-9]+ ;
    double: mantissa with exponent [eE][+-]?[0-9]+.
    """
    if not token:
        return None
    body = token
    if body[0] in "+-":
        body = body[1:]
    if not body:
        return None
    has_dot = False
    has_exp = False
    digits_before = digits_after = exp_digits = 0
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if ch.isdigit():
            if has_exp:
                exp_digits += 1
            elif has_dot:
                digits_after += 1
            else:
                digits_before += 1
        elif ch == "." and not has_dot and not has_exp:
            has_dot = True
        elif ch in "eE" and not has_exp and (digits_before or digits_after):
            has_exp = True
            if i + 1 < n and body[i + 1] in "+-":
                i += 1
        else:
            return None
        i += 1
    if has_exp:
        if exp_digits == 0:
            return None
        return XSD_DOUBLE
    if has_dot:
        if digits_after == 0:
            return None
        return XSD_DECIMAL
    if digits_before == 0:
        return None
    return XSD_INTEGER


def make_literal(lexical: str, datatype: str = "", lang: str = "") -> Literal:
    """Construct a literal enforcing the lang XOR datatype rule and the
    forbidden-explicit-datatype rule (rdf/ntriples.go:539-543)."""
    if lang and datatype:
        raise ParseError("literal cannot have both language tag and datatype")
    if datatype in (RDF_LANGSTRING, RDF_DIRLANGSTRING):
        raise ParseError(f"{datatype} must not be used as an explicit datatype")
    if lang and not is_valid_lang_tag(lang):
        raise ParseError(f"invalid language tag: {lang!r}")
    return Literal(lexical, datatype, lang)
