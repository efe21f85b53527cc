"""SPARQL text front-end: parse a real SPARQL SELECT / CONSTRUCT query
string and execute it over the triples table through the algebra layer
(operators/query.py, operators/paths.py) — plus a DuckDB SQL twin of the
same parsed query so every SPARQL query is oracle-checkable.

The reference (geoknoesis/rdf-go) is construction-only; SPARQL is the
Spark-side query extension on top of the BGP/path operators (SURVEY.md
§2.4). The engine stays declarative end-to-end: a parsed query compiles
to DataFrame joins/filters/aggregations, so Catalyst handles join
reordering, broadcast selection, pushdown, and AQE skew handling — no
interpretation loop, no Python in the hot path.

Supported subset (documented, rejected-with-error beyond it)::

    PREFIX pfx: <iri>                       (any number)
    SELECT [DISTINCT] ?v ... | * |
           (COUNT(*) AS ?n) (COUNT|SUM|MIN|MAX|AVG([DISTINCT] ?v) AS ?a)
           (GROUP_CONCAT([DISTINCT] ?v; SEPARATOR=", ") AS ?a)
           (SAMPLE(?v) AS ?a)                deterministic (min term)
           (LANG(?v)|DATATYPE(?v)|STR(?v) AS ?a)   expression columns
    CONSTRUCT { template triples }
    ASK                                     (boolean existence)
    DESCRIBE ?v ... <iri> ...               (subject-role description)
    WHERE {
      ?s <p> ?o .                           triple patterns, ; and , lists
      ?s pfx:p/pfx:q+ ?o .                  property paths (/ | ^ + * ?)
      ?s pfx:p{0,3} ?o .                    bounded repetition (<=10);
                                            zero-length (* ? {0,m})
                                            needs a restricted endpoint
                                            (operators/paths.py)
      ?s a ?type .                          'a' = rdf:type
      OPTIONAL { ... }                      left join
      FILTER(?i > 3)  FILTER(bound(?x))     =, !=, <, <=, >, >=, [!]bound
      FILTER(?i > 3 && ?i < 7 || ?i = 0)    boolean combos (&& over ||)
      FILTER(LANG(?x) = "en")               lang-tag compare (=/!=)
      FILTER(DATATYPE(?x) = xsd:integer)    datatype compare (=/!=)
      FILTER([!]STRSTARTS(?x, "s"))         also STRENDS / CONTAINS,
                                            over STR(?x) lexical/IRI text
      FILTER(STR(?x) = "s")                 STR equality (=/!=)
      FILTER([!]isIRI|isURI|isLiteral|isBlank(?x))  term-class tests
      FILTER([!]sameTerm(?x, ?y))           strict term identity
      FILTER([!]langMatches(LANG(?x), "en")) BCP47 basic filtering
      FILTER(?x = ?y)  FILTER(?x = 1.0-typed) VALUE-space =/!= and
                                            ordering (three-valued:
                                            type errors drop rows)
      VALUES ?x { <a> <b> "lit" }           single-var inline restriction
      BIND(LANG(?x) AS ?l)                  derived column; also
      BIND("tag" AS ?src)                   constant (UNION provenance)
      FILTER([NOT] EXISTS { ... })          correlated semi/anti join
      MINUS { ... }                         left-anti on shared vars
      GRAPH ?g { ... }                      quad match (named graphs only)
    }
    { block } UNION { block }               at WHERE top level
    { SELECT ... }                          subqueries, joined on their
                                            shared variables (nested
                                            aggregation / keyset shapes)
    GROUP BY ?v ...   HAVING(COUNT(?x) > n | ?alias > n)
    ORDER BY [ASC|DESC](?v) ...   LIMIT n OFFSET m
      (?v may be a pattern var, an aggregate alias, or a
       SELECT-expression alias)

SPARQL 1.1 Update subset (``sparql_update`` / ``update_sql`` twin)::

    INSERT DATA { ground triples }    DELETE DATA { ground triples }
    DELETE WHERE { patterns }         (pattern block = its own template)
    DELETE { tmpl } [INSERT { tmpl }] WHERE { any WHERE group }
    INSERT { tmpl } WHERE { ... }     op ; op ; ...   (sequenced)

Updates return the post-update graph as a DataFrame — set semantics on
(subj, pred, obj), deletes before inserts per op, lineage columns
preserved on survivors; write back via graph.incremental_update
(scripts/run_pipeline.py --update) to rewrite only touched partitions.

Numeric positions (FILTER comparisons to an integer, SUM/MIN/MAX/AVG)
operate on the canonical ``"n"^^xsd:integer`` literal form the pipeline
emits, extracting the integer identically on both engines; non-integer
terms become NULL and drop, mirroring SPARQL type errors. AVG rounds to
6 decimals on both engines so float formatting can't diverge.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .query import (
    _DT_RE, _INT_LIT_RE, _LANG_RE, _LEX_RE, _str_column, _str_sql,
    bgp_match,
)

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"

_KEYWORDS = {
    "PREFIX", "BASE", "SELECT", "CONSTRUCT", "ASK", "DESCRIBE",
    "DISTINCT", "REDUCED", "TRUE", "FALSE",
    "WHERE", "OPTIONAL", "FILTER", "MINUS", "UNION", "GRAPH", "VALUES",
    "BIND", "INSERT", "DELETE", "DATA",
    "GROUP", "BY", "HAVING", "ORDER", "ASC", "DESC", "LIMIT", "OFFSET",
    "AS",
    "COUNT", "SUM", "MIN", "MAX", "AVG", "GROUP_CONCAT", "SAMPLE",
    "SEPARATOR", "BOUND", "LANG", "DATATYPE",
    "STRSTARTS", "STRENDS", "CONTAINS", "EXISTS", "NOT", "STR", "A",
    "ISURI", "ISIRI", "ISLITERAL", "ISBLANK", "SAMETERM",
    "LANGMATCHES", "UNDEF", "REGEX",
}
_EXPR_FUNCS = ("LANG", "DATATYPE", "STR")
_STR_FUNCS = {"STRSTARTS": "strstarts", "STRENDS": "strends",
              "CONTAINS": "contains"}
_AGG_FUNCS = ("COUNT", "SUM", "MIN", "MAX", "AVG", "GROUP_CONCAT",
              "SAMPLE")
_CMP_OPS = ("=", "!=", "<", "<=", ">", ">=")


def _strip_x_whitespace(pat: str) -> str:
    """XPath 'x' flag: remove whitespace characters OUTSIDE character
    classes (escaped whitespace and class contents are kept)."""
    out, i, in_class = [], 0, False
    while i < len(pat):
        c = pat[i]
        if c == "\\" and i + 1 < len(pat):
            out.append(pat[i:i + 2])
            i += 2
            continue
        if c == "[":
            in_class = True
        elif c == "]":
            in_class = False
        if c in " \t\n\r" and not in_class:
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _compile_regex_pattern(pat: str, flags: str) -> str:
    """XPath/SPARQL regex flags folded into the pattern at PARSE time so
    the Java (engine) and RE2 (DuckDB twin) dialects agree: 'q' escapes
    every metacharacter, 'x' strips free whitespace, and i/s/m embed as
    (?ism) — the subset both dialects share."""
    for f in flags:
        if f not in "ismxq":
            raise SparqlError(f"unsupported REGEX flag {f!r}")
    if "q" in flags:
        import re as _re
        pat = _re.escape(pat)
    elif "x" in flags:
        pat = _strip_x_whitespace(pat)
    embed = "".join(f for f in flags if f in "ism")
    return f"(?{embed}){pat}" if embed else pat


class SparqlError(ValueError):
    """Parse or unsupported-feature error, with position context."""


# ---------------------------------------------------------------- tokens

@dataclass
class _Tok:
    kind: str   # iri var literal int pname kw op
    val: object


_ASCII_DIGITS = "0123456789"
_WORD_CHARS = ("abcdefghijklmnopqrstuvwxyz"
               "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + _ASCII_DIGITS + "_")


def _is_pname_char(c: str) -> bool:
    # pname locals / words stay ASCII (var names become engine-side
    # identifiers; non-ASCII terms belong in <iri>/"literal" forms)
    return c in _WORD_CHARS or c in "-.:"


def _sign_is_numeric(toks: List["_Tok"], c: str,
                     prev_char: str) -> bool:
    if c == "-":
        return True
    if prev_char.isspace():
        return True           # ':p +1' — detached sign is a number
    if not toks:
        return True
    t = toks[-1]
    if t.kind in ("iri", "pname", "var"):
        return False          # adjacent path postfix: <p>+ / :p+
    if t.kind == "op" and t.val == ")":
        return False          # (path)+ group postfix
    return True


def _tokenize(q: str) -> List[_Tok]:
    toks: List[_Tok] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c == "#":
            j = q.find("\n", i)
            i = n if j < 0 else j + 1
        elif c == "<":
            # IRI iff '>' arrives before any whitespace; else comparison
            j = i + 1
            while j < n and not q[j].isspace() and q[j] != ">":
                j += 1
            if j < n and q[j] == ">":
                toks.append(_Tok("iri", q[i:j + 1]))
                i = j + 1
            elif i + 1 < n and q[i + 1] == "=":
                toks.append(_Tok("op", "<="))
                i += 2
            else:
                toks.append(_Tok("op", "<"))
                i += 1
        elif c in "?$":
            j = i + 1
            while j < n and q[j] in _WORD_CHARS:
                j += 1
            if j == i + 1:
                if c == "?":
                    # a bare '?' is the zero-or-one path modifier (the
                    # var sigil needs a following name char)
                    toks.append(_Tok("op", "?"))
                    i += 1
                    continue
                raise SparqlError(f"empty variable name at offset {i}")
            toks.append(_Tok("var", q[i + 1:j]))
            i = j
        elif c in "\"'":
            # all four SPARQL string forms ("…", '…', \"\"\"…\"\"\", \'\'\'…\'\'\');
            # the body is UNESCAPED and re-quoted canonically so a query
            # literal matches the pipeline's c14n term strings however
            # the user spelled it
            if q[i:i + 3] in ('\'\'\'', '"""'):
                quote, long_ = q[i] * 3, True
                j = i + 3
            else:
                quote, long_ = c, False
                j = i + 1
            buf = []
            while j < n:
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j:j + 2])
                    j += 2
                    continue
                if long_:
                    if q[j:j + 3] == quote:
                        break
                elif q[j] == quote or q[j] in "\n\r":
                    break
                buf.append(q[j])
                j += 1
            if j >= n or (not long_ and q[j] != quote):
                raise SparqlError(f"unterminated string at offset {i}")
            from ..terms import c14n_quote, unescape_string
            try:
                body = unescape_string("".join(buf))
            except Exception as e:
                raise SparqlError(f"bad string escape at offset {i}: {e}")
            lex = c14n_quote(body)
            i = j + (3 if long_ else 1)
            if q[i:i + 2] == "^^":
                i += 2
                toks.append(_Tok("literal", lex))
                toks.append(_Tok("op", "^^"))
                continue
            if i < n and q[i] == "@":
                j = i + 1
                while j < n and (q[j].isalnum() or q[j] == "-"):
                    j += 1
                # canonical lang tags are lowercase (value space is
                # case-insensitive — render_term does the same)
                lex += q[i:j].lower()
                i = j
            toks.append(_Tok("literal", lex))
        elif c in _ASCII_DIGITS or (c in "+-" and i + 1 < n
                                    and q[i + 1] in _ASCII_DIGITS + "."
                                    and _sign_is_numeric(
                                        toks, c,
                                        q[i - 1] if i else " ")):
            j = i + 1
            while j < n and q[j] in _ASCII_DIGITS:
                j += 1
            if j < n and q[j] in ".eE":
                # decimal/double lexical: preserved as written and
                # typed per the Turtle rules (a TERM constant only —
                # LIMIT/OFFSET and integer FILTER math stay int-typed)
                k = j
                is_double = False
                if q[k] == ".":
                    k += 1
                    while k < n and q[k] in _ASCII_DIGITS:
                        k += 1
                if k < n and q[k] in "eE":
                    is_double = True
                    k += 1
                    if k < n and q[k] in "+-":
                        k += 1
                    while k < n and q[k] in _ASCII_DIGITS:
                        k += 1
                raw = q[i:k]
                dt = "double" if is_double else "decimal"
                toks.append(_Tok(
                    "literal",
                    f'"{raw}"^^<http://www.w3.org/2001/XMLSchema#{dt}>'))
                i = k
                continue
            if c == "+":
                # sign preserved in the lexical form per Turtle
                toks.append(_Tok(
                    "literal",
                    f'"{q[i:j]}"^^'
                    '<http://www.w3.org/2001/XMLSchema#integer>'))
                i = j
                continue
            toks.append(_Tok("int", int(q[i:j])))
            i = j
        elif c == "!" and q[i:i + 2] == "!=":
            toks.append(_Tok("op", "!="))
            i += 2
        elif c == "&":
            if q[i:i + 2] != "&&":
                raise SparqlError(f"single '&' at offset {i} (use &&)")
            toks.append(_Tok("op", "&&"))
            i += 2
        elif c == ">" and q[i:i + 2] == ">=":
            toks.append(_Tok("op", ">="))
            i += 2
        elif c in "{}.,;()*!=<>/|^+[]":
            toks.append(_Tok("op", c))
            i += 1
        elif (c in _WORD_CHARS and c not in _ASCII_DIGITS) or c == ":":
            # a leading ':' is the default-prefix pname sigil (':local',
            # or the bare ':' in 'PREFIX : <iri>')
            j = i
            while j < n and _is_pname_char(q[j]):
                j += 1
            word = q[i:j]
            # PN_LOCAL cannot END with '.', so a trailing dot is the
            # statement terminator, not part of the name
            while word.endswith("."):
                word = word[:-1]
                j -= 1
            i = j
            if ":" in word:
                toks.append(_Tok("pname", word))
            elif word.upper() in _KEYWORDS:
                toks.append(_Tok("kw", word.upper()))
            else:
                raise SparqlError(
                    f"unexpected bare word {word!r} (not a keyword, "
                    "prefixed name, or 'a')")
        else:
            raise SparqlError(f"unexpected character {c!r} at offset {i}")
    return toks


# ------------------------------------------------------------------- AST

@dataclass
class _Block:
    patterns: List[Tuple[str, str, str]] = field(default_factory=list)
    optionals: List[Tuple[str, str, str]] = field(default_factory=list)
    filters: List[Tuple[str, str, object]] = field(default_factory=list)
    minus: List[Tuple[str, str, str]] = field(default_factory=list)
    exists: List[list] = field(default_factory=list)
    not_exists: List[list] = field(default_factory=list)
    binds: List[Tuple[str, Optional[str], str]] = field(
        default_factory=list)
    graph: Optional[str] = None        # GRAPH term for the whole block
    # multi-var VALUES tables: (vars, rows) with None = UNDEF wildcard
    values_tables: List[Tuple[List[str], List[List[Optional[str]]]]] = \
        field(default_factory=list)
    # nested { SELECT ... } subqueries — joined on shared variables by
    # the sparql layer (NOT part of kwargs(): bgp_match is unaware)
    subselects: List["ParsedQuery"] = field(default_factory=list)

    def kwargs(self) -> dict:
        return {"patterns": self.patterns, "optionals": self.optionals,
                "filters": self.filters, "minus": self.minus,
                "exists": self.exists, "not_exists": self.not_exists,
                "binds": self.binds, "graph": self.graph}


@dataclass
class _Proj:
    kind: str                 # "var" | "agg" | "expr" | "star"
    var: Optional[str] = None          # projected/arg variable
    func: Optional[str] = None         # COUNT/SUM/.../GROUP_CONCAT/SAMPLE
    distinct: bool = False             # COUNT(DISTINCT ?x)
    alias: Optional[str] = None
    sep: str = " "                     # GROUP_CONCAT separator


@dataclass
class ParsedQuery:
    form: str                  # "select" | "construct" | "ask" | "describe"
    distinct: bool
    projection: List[_Proj]
    blocks: List[_Block]               # >1 means UNION
    group_by: List[str]
    order_by: List[Tuple[str, bool]]   # (var, ascending)
    limit: Optional[int]
    template: List[Tuple[str, str, str]]   # CONSTRUCT triples
    describe: List[str] = field(default_factory=list)  # ?var / <iri>
    # HAVING constraints: (_Proj agg | alias str, cmp op, int)
    having: List[Tuple[object, str, int]] = field(default_factory=list)
    offset: Optional[int] = None
    # post-query VALUES clause (joined with the WHERE solutions,
    # spec section 19.8): (vars, rows) with None = UNDEF
    values_clause: Optional[Tuple[List[str],
                                  List[List[Optional[str]]]]] = None


class _Parser:
    def __init__(self, toks: List[_Tok], text: str):
        self.toks, self.i, self.text = toks, 0, text
        self.prefixes: dict[str, str] = {}
        self.base: str = ""
        self._anon = 0

    # ---- token helpers
    def peek(self, ahead: int = 0) -> Optional[_Tok]:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def take(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise SparqlError("unexpected end of query")
        self.i += 1
        return t

    def expect_op(self, op: str) -> None:
        t = self.take()
        if t.kind != "op" or t.val != op:
            raise SparqlError(f"expected {op!r}, got {t.val!r}")

    def expect_kw(self, kw: str) -> None:
        t = self.take()
        if t.kind != "kw" or t.val != kw:
            raise SparqlError(f"expected {kw}, got {t.val!r}")

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "op" and t.val == op

    def at_kw(self, kw: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "kw" and t.val == kw

    # ---- term rendering (canonical pipeline forms)
    def _expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlError(f"undeclared prefix {pfx!r}:")
        return f"<{self.prefixes[pfx]}{local}>"

    def _term(self, t: _Tok, position: str) -> str:
        if t.kind == "var":
            return "?" + t.val
        if t.kind == "iri":
            val = t.val[1:-1]
            if self.base and ":" not in val.split("/")[0].split("#")[0]:
                from ..terms import resolve_iri
                return f"<{resolve_iri(self.base, val)}>"
            return t.val
        if t.kind == "pname":
            return self._expand_pname(t.val)
        if t.kind == "kw" and t.val in ("TRUE", "FALSE"):
            return (f'"{t.val.lower()}"'
                    '^^<http://www.w3.org/2001/XMLSchema#boolean>')
        if t.kind == "kw" and t.val == "A":
            if position != "pred":
                raise SparqlError("'a' is only valid as a predicate")
            return RDF_TYPE
        if t.kind == "literal":
            lex = t.val
            if self.at_op("^^"):
                self.take()
                dt = self.take()
                if dt.kind == "iri":
                    return f"{lex}^^{dt.val}"
                if dt.kind == "pname":
                    return f"{lex}^^{self._expand_pname(dt.val)}"
                raise SparqlError(f"bad datatype {dt.val!r}")
            return lex
        if t.kind == "int":
            return f'"{t.val}"^^<{XSD_INTEGER}>'
        raise SparqlError(f"unexpected {t.val!r} in {position} position")

    # ---- property paths in predicate position (grammar of paths.py)
    def _path(self) -> str:
        parts = [self._path_seq()]
        while self.at_op("|"):
            self.take()
            parts.append(self._path_seq())
        return "|".join(parts)

    def _path_seq(self) -> str:
        parts = [self._path_step()]
        while self.at_op("/"):
            self.take()
            parts.append(self._path_step())
        return "/".join(parts)

    def _path_step(self) -> str:
        if self.at_op("^"):
            self.take()
            return "^" + self._path_step()
        s = self._path_primary()
        while True:
            if self.at_op("+"):
                self.take()
                s += "+"
            elif self.at_op("*"):
                self.take()
                s += "*"
            elif self.at_op("?"):
                self.take()
                s += "?"
            elif self.at_op("{") and self.peek(1) is not None \
                    and self.peek(1).kind == "int":
                self.take()
                lo = self.take()
                self.expect_op(",")
                hi = self.take()
                if lo.kind != "int" or hi.kind != "int":
                    raise SparqlError("{n,m} needs integers")
                self.expect_op("}")
                s += f"{{{lo.val},{hi.val}}}"
            else:
                break
        return s

    def _path_primary(self) -> str:
        t = self.take()
        if t.kind == "op" and t.val == "!":
            self.expect_op("(")
            iris = []
            while True:
                it = self.take()
                if it.kind == "iri":
                    iris.append(it.val)
                elif it.kind == "pname":
                    iris.append(self._expand_pname(it.val))
                elif it.kind == "kw" and it.val == "A":
                    iris.append(RDF_TYPE)
                else:
                    raise SparqlError(
                        "negated property set takes IRIs/prefixed names")
                if self.at_op(")"):
                    self.take()
                    break
                self.expect_op("|")
            return "!(" + "|".join(iris) + ")"
        if t.kind == "op" and t.val == "(":
            inner = self._path()
            self.expect_op(")")
            return f"({inner})"
        if t.kind == "iri":
            val = t.val[1:-1]
            if self.base and ":" not in val.split("/")[0].split("#")[0]:
                from ..terms import resolve_iri
                return f"<{resolve_iri(self.base, val)}>"
            return t.val
        if t.kind == "pname":
            return self._expand_pname(t.val)
        if t.kind == "kw" and t.val in ("TRUE", "FALSE"):
            return (f'"{t.val.lower()}"'
                    '^^<http://www.w3.org/2001/XMLSchema#boolean>')
        if t.kind == "kw" and t.val == "A":
            return RDF_TYPE
        raise SparqlError(f"unexpected {t.val!r} in property path")

    def _predicate(self) -> str:
        t = self.peek()
        if t is None:
            raise SparqlError("unexpected end of query in predicate")
        if t.kind == "var":
            self.take()
            return "?" + t.val
        return self._path()   # a single IRI is the trivial path

    # ---- triple block
    def _anon_var(self) -> str:
        """Bare '[]' — an anonymous blank node in a query pattern acts
        as a fresh NON-DISTINGUISHED variable (SPARQL §4.1.4); it joins
        like any variable but is never projected."""
        self.expect_op("]")
        self._anon += 1
        return f"?_anon{self._anon}"

    def _collection(self, out) -> str:
        """RDF collection '( e1 e2 … )' in a query pattern: expands to
        the rdf:first/rdf:rest chain over fresh non-distinguished
        variables (the standard Turtle lowering, matched as patterns);
        '()' is the constant rdf:nil."""
        first = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
        rest = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
        nil = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"
        items = []
        while not self.at_op(")"):
            if self.at_op("("):
                self.take()
                items.append(self._collection(out))
            elif self.at_op("["):
                self.take()
                items.append(self._anon_var())
            else:
                items.append(self._term(self.take(), "obj"))
        self.take()
        if not items:
            return nil
        nodes = []
        for _ in items:
            self._anon += 1
            nodes.append(f"?_anon{self._anon}")
        for i, (node, item) in enumerate(zip(nodes, items)):
            out.append((node, first, item))
            out.append((node, rest,
                        nodes[i + 1] if i + 1 < len(items) else nil))
        return nodes[0]

    def _triples_into(self, out: List[Tuple[str, str, str]]) -> None:
        if self.at_op("["):
            self.take()
            subj = self._anon_var()
        elif self.at_op("("):
            self.take()
            subj = self._collection(out)
        else:
            subj = self._term(self.take(), "subj")
        while True:
            pred = self._predicate()
            while True:
                if self.at_op("["):
                    self.take()
                    obj = self._anon_var()
                elif self.at_op("("):
                    self.take()
                    obj = self._collection(out)
                else:
                    obj = self._term(self.take(), "obj")
                out.append((subj, pred, obj))
                if self.at_op(","):
                    self.take()
                    continue
                break
            if self.at_op(";"):
                self.take()
                if self.at_op(".") or self.at_op("}"):  # dangling ;
                    break
                continue
            break
        if self.at_op("."):
            self.take()

    def _func_var_arg(self, what: str) -> str:
        """'(' ?var ')' — the variable argument of a 1-ary builtin."""
        self.expect_op("(")
        v = self.take()
        if v.kind != "var":
            raise SparqlError(f"{what} takes a variable")
        self.expect_op(")")
        return "?" + v.val

    def _regex_lexical(self, what: str) -> str:
        """The RAW (unescaped) characters of a plain string argument —
        regex patterns need the actual codepoints, not the c14n-escaped
        lexical form."""
        from ..terms import unescape_string
        return unescape_string(self._plain_string(what))

    def _plain_string(self, what: str) -> str:
        t = self.take()
        if t.kind != "literal" or not (t.val.startswith('"')
                                       and t.val.endswith('"')):
            raise SparqlError(f"{what} needs a plain string literal")
        if self.at_op("^^"):
            raise SparqlError(f"{what} needs a plain string literal")
        return t.val[1:-1]

    def _exists_patterns(self) -> list:
        self.expect_op("{")
        pats: List[Tuple[str, str, str]] = []
        while not self.at_op("}"):
            self._triples_into(pats)
        self.take()
        if not pats:
            raise SparqlError("empty EXISTS block")
        return pats

    def _condition(self) -> Tuple[str, str, object]:
        """One atomic FILTER condition (no EXISTS — that's block-level)."""
        negated = False
        if self.at_op("!"):
            self.take()
            negated = True
        if self.at_kw("BOUND"):
            self.take()
            var = self._func_var_arg("bound()")
            return (var, "!bound" if negated else "bound", None)
        if self.at_kw("LANG") or self.at_kw("DATATYPE"):
            fn = self.take().val
            var = self._func_var_arg(fn)
            op = self.take()
            if op.kind != "op" or op.val not in ("=", "!="):
                raise SparqlError(f"{fn}() supports only = and !=")
            if negated:
                raise SparqlError(f"use {fn}(...) != instead of !{fn}")
            neq = op.val == "!="
            if fn == "LANG":
                # language tags are case-insensitive in the RDF value
                # space and canonicalize lowercase (W3C lang-3)
                return (var, "lang!=" if neq else "lang=",
                        self._plain_string("LANG comparison").lower())
            t = self.take()
            if t.kind == "iri":
                dt = t.val
            elif t.kind == "pname":
                dt = self._expand_pname(t.val)
            else:
                raise SparqlError("DATATYPE comparison needs an IRI")
            return (var, "dt!=" if neq else "dt=", dt)
        if self.at_kw("REGEX"):
            self.take()
            self.expect_op("(")
            if self.at_kw("STR"):
                self.take()
                var = self._func_var_arg("STR")
                coerced = True
            else:
                v = self.take()
                if v.kind != "var":
                    raise SparqlError("REGEX takes (?var, \"pattern\")")
                var, coerced = "?" + v.val, False
            self.expect_op(",")
            pat = self._regex_lexical("REGEX pattern")
            flags = ""
            if self.at_op(","):
                self.take()
                flags = self._regex_lexical("REGEX flags")
            self.expect_op(")")
            pat = _compile_regex_pattern(pat, flags)
            op = "!regex" if negated else "regex"
            return (var, op, (pat, coerced))
        if self.at_kw("STR") and not negated:
            fn = self.take().val
            var = self._func_var_arg(fn)
            op = self.take()
            if op.kind != "op" or op.val not in ("=", "!="):
                raise SparqlError("STR() comparison supports = and !=")
            val = self._plain_string("STR comparison")
            return (var, "str!=" if op.val == "!=" else "str=", val)
        if any(self.at_kw(k) for k in
               ("ISURI", "ISIRI", "ISLITERAL", "ISBLANK")):
            fn = self.take().val
            var = self._func_var_arg(fn)
            op = {"ISURI": "isiri", "ISIRI": "isiri",
                  "ISLITERAL": "isliteral", "ISBLANK": "isblank"}[fn]
            return (var, ("!" + op) if negated else op, None)
        if self.at_kw("SAMETERM"):
            self.take()
            self.expect_op("(")
            a = self.take()
            if a.kind != "var":
                raise SparqlError("sameTerm's first argument must be a "
                                  "?variable")
            self.expect_op(",")
            b = self.take()
            self.expect_op(")")
            if b.kind == "var":
                # STRICT term identity (not value equality — sameTerm
                # distinguishes "01"^^integer from "1"^^integer)
                return ("?" + a.val,
                        "svar!=" if negated else "svar=", b.val)
            return ("?" + a.val, "same!=" if negated else "same=",
                    self._term(b, "obj"))
        if self.at_kw("LANGMATCHES"):
            self.take()
            self.expect_op("(")
            if not self.at_kw("LANG"):
                raise SparqlError(
                    "langMatches' first argument must be LANG(?v)")
            self.take()
            var = self._func_var_arg("LANG")
            self.expect_op(",")
            rng = self._plain_string("langMatches range").lower()
            self.expect_op(")")
            return (var, "!langmatches" if negated else "langmatches",
                    rng)
        if any(self.at_kw(k) for k in _STR_FUNCS):
            fn = self.take().val
            self.expect_op("(")
            v = self.take()
            if v.kind != "var":
                raise SparqlError(f"{fn} takes (?var, \"string\")")
            self.expect_op(",")
            arg = self._plain_string(fn)
            self.expect_op(")")
            op = ("!" if negated else "") + _STR_FUNCS[fn]
            return ("?" + v.val, op, arg)
        t0 = self.peek()
        if t0 is not None and t0.kind == "kw" and t0.val in ("TRUE",
                                                            "FALSE"):
            self.take()
            val = (t0.val == "TRUE") != negated
            return ("", "ebvconst", val)
        if t0 is not None and t0.kind == "literal":
            # constant operand in a boolean combo: static EBV
            term = self._term(self.take(), "obj")
            lex = term[1:term.index('"', 1)]
            if term.endswith("boolean>"):
                val = lex in ("true", "1")
            elif "^^" not in term and "@" not in term[term.rindex('"'):]:
                val = lex != ""
            else:
                try:
                    val = float(lex) != 0
                except ValueError:
                    raise SparqlError(
                        f"constant {term!r} has no effective boolean "
                        "value")
            return ("", "ebvconst", val != negated)
        v = self.take()
        if v.kind != "var":
            raise SparqlError("FILTER comparisons must start with a "
                              "variable")
        nxt = self.peek()
        if nxt is None or nxt.kind != "op" or nxt.val not in _CMP_OPS:
            # bare ?v (or !?v): effective boolean value (section 17.2.2)
            return ("?" + v.val, "!ebv" if negated else "ebv", None)
        if negated:
            raise SparqlError(
                "'!' is only supported before bound/STRSTARTS/STRENDS/"
                "CONTAINS/isIRI/isLiteral/isBlank/sameTerm/langMatches/"
                "REGEX or a bare variable")
        op = self.take()
        if op.kind != "op" or op.val not in _CMP_OPS:
            raise SparqlError(f"unsupported FILTER operator {op.val!r}")
        rhs = self.take()
        value: object
        if rhs.kind == "int":
            value = rhs.val
        elif rhs.kind == "var":
            # var-to-var =/!= : term equality over the canonical term
            # strings (value equality coincides on canonical forms;
            # cross-type numeric equality is out of the integer-only
            # numeric model). Ordering comparisons stay rejected.
            if op.val not in ("=", "!="):
                raise SparqlError(
                    "variable-to-variable FILTER supports only = and != "
                    "(term equality)")
            return ("?" + v.val, "var" + op.val, rhs.val)
        else:
            value = self._term(rhs, "obj")
        return ("?" + v.val, op.val, value)

    def _and_chain(self) -> list:
        conds = [self._condition()]
        while self.at_op("&&"):
            self.take()
            conds.append(self._condition())
        return conds

    def _filter(self, blk: _Block) -> None:
        # FILTER [NOT] EXISTS { } — the parens around ExistsFunc are
        # optional in the SPARQL grammar (W3C exists01 etc.)
        if self.at_kw("EXISTS") or (
                self.at_kw("NOT") and self.peek(1) is not None
                and self.peek(1).kind == "kw"
                and self.peek(1).val == "EXISTS"):
            negated = False
            if self.at_kw("NOT"):
                self.take()
                negated = True
            self.take()      # EXISTS
            pats = self._exists_patterns()
            (blk.not_exists if negated else blk.exists).append(pats)
            return
        nt = self.peek()
        if nt is not None and nt.kind == "kw" and nt.val in (
                "BOUND", "ISURI", "ISIRI", "ISLITERAL", "ISBLANK",
                "SAMETERM", "LANGMATCHES", "REGEX", "STRSTARTS",
                "STRENDS", "CONTAINS", "LANG", "DATATYPE"):
            # FILTER BuiltInCall — the grammar's Constraint does not
            # require outer parens around a builtin call
            blk.filters.append(self._condition())
            return
        self.expect_op("(")
        # [NOT] EXISTS is block-level (semi/anti join), not combinable
        # with boolean operators
        if self.at_kw("EXISTS") or self.at_kw("NOT") or (
                self.at_op("!") and self.peek(1) is not None
                and self.peek(1).kind == "kw"
                and self.peek(1).val == "EXISTS"):
            negated = False
            if self.at_op("!"):
                self.take()
                negated = True
            if self.at_kw("NOT"):
                self.take()
                if not self.at_kw("EXISTS"):
                    raise SparqlError("expected EXISTS after NOT")
                negated = not negated
            self.take()      # EXISTS
            pats = self._exists_patterns()
            (blk.not_exists if negated else blk.exists).append(pats)
            self.expect_op(")")
            return
        # boolean combination: ||-chain of &&-chains (DNF)
        or_groups = [self._and_chain()]
        while self.at_op("|"):
            self.take()
            self.expect_op("|")
            or_groups.append(self._and_chain())
        self.expect_op(")")
        if len(or_groups) == 1:
            blk.filters.extend(or_groups[0])     # pure AND: flat filters
        else:
            blk.filters.append(("||", "||", or_groups))

    def _values_table(self):
        """VALUES ( ?a ?b ) { ( t UNDEF ) ... } | VALUES ?a { t ... } —
        returns (vars, rows) with None for UNDEF."""
        tvars: List[str] = []
        if self.at_op("("):
            self.take()
            while not self.at_op(")"):
                v = self.take()
                if v.kind != "var":
                    raise SparqlError("VALUES needs ?variables")
                tvars.append(v.val)
            self.take()
        else:
            v = self.take()
            if v.kind != "var":
                raise SparqlError("VALUES needs a ?variable")
            tvars.append(v.val)
        if not tvars:
            raise SparqlError("empty VALUES variable list")
        self.expect_op("{")
        rows: List[List[Optional[str]]] = []
        single = len(tvars) == 1 and not self.at_op("(")
        while not self.at_op("}"):
            row: List[Optional[str]] = []
            if single:
                t = self.take()
                row.append(None if t.kind == "kw" and t.val == "UNDEF"
                           else self._term(t, "obj"))
            else:
                self.expect_op("(")
                while not self.at_op(")"):
                    t = self.take()
                    row.append(None if t.kind == "kw"
                               and t.val == "UNDEF"
                               else self._term(t, "obj"))
                self.take()
                if len(row) != len(tvars):
                    raise SparqlError(
                        f"VALUES row has {len(row)} terms for "
                        f"{len(tvars)} variables")
            rows.append(row)
        self.take()
        if not rows:
            raise SparqlError("empty VALUES block")
        return tvars, rows

    def _block_items(self, blk: _Block) -> None:
        """Consume group items until the closing '}' (not taken)."""
        while not self.at_op("}"):
            if self.at_op("."):
                self.take()      # stray '.' after FILTER/BIND is legal
                continue
            if self.at_kw("OPTIONAL"):
                self.take()
                self.expect_op("{")
                while not self.at_op("}"):
                    self._triples_into(blk.optionals)
                self.take()
            elif self.at_kw("MINUS"):
                self.take()
                self.expect_op("{")
                while not self.at_op("}"):
                    self._triples_into(blk.minus)
                self.take()
            elif self.at_kw("FILTER"):
                self.take()
                self._filter(blk)
            elif self.at_op("{"):
                self.take()
                if not self.at_kw("SELECT"):
                    raise SparqlError(
                        "nested groups support only { SELECT ... } "
                        "subqueries")
                sub = self._query()
                if sub.form != "select":
                    raise SparqlError("subqueries must be SELECT")
                blk.subselects.append(sub)
                self.expect_op("}")
            elif self.at_kw("BIND"):
                self.take()
                self.expect_op("(")
                nxt = self.peek()
                if nxt is not None and nxt.kind == "kw" \
                        and nxt.val in _EXPR_FUNCS:
                    fn = self.take().val
                    arg = self._func_var_arg(fn)[1:]
                else:
                    t2 = self.take()
                    if t2.kind == "var":
                        raise SparqlError(
                            "BIND supports LANG/DATATYPE/STR(?v) or a "
                            "constant term, not a bare variable")
                    fn, arg = None, self._term(t2, "obj")
                self.expect_kw("AS")
                v = self.take()
                if v.kind != "var":
                    raise SparqlError("BIND needs AS ?variable")
                self.expect_op(")")
                blk.binds.append((v.val, fn, arg))
            elif self.at_kw("VALUES"):
                self.take()
                tvars, rows = self._values_table()
                if len(tvars) == 1 and all(r[0] is not None
                                           for r in rows):
                    # single var, no UNDEF: lowered to an IN restriction
                    blk.filters.append(
                        ("?" + tvars[0], "in",
                         tuple(r[0] for r in rows)))
                else:
                    blk.values_tables.append((tvars, rows))
            elif self.at_kw("GRAPH"):
                self.take()
                t = self.take()
                if t.kind == "var":
                    gterm = "?" + t.val
                elif t.kind == "iri":
                    gterm = t.val
                elif t.kind == "pname":
                    gterm = self._expand_pname(t.val)
                else:
                    raise SparqlError(
                        f"GRAPH needs a ?var or IRI, got {t.val!r}")
                if blk.graph is not None:
                    raise SparqlError(
                        "only one GRAPH clause per block is supported")
                if blk.patterns:
                    raise SparqlError(
                        "mixing default-graph patterns and GRAPH in one "
                        "block is not supported (split into UNION blocks)")
                self.expect_op("{")
                while not self.at_op("}"):
                    self._triples_into(blk.patterns)
                self.take()
                blk.graph = gterm
            else:
                if blk.graph is not None:
                    raise SparqlError(
                        "mixing default-graph patterns and GRAPH in one "
                        "block is not supported (split into UNION blocks)")
                self._triples_into(blk.patterns)

    def _group(self) -> _Block:
        self.expect_op("{")
        blk = _Block()
        self._block_items(blk)
        self.take()   # }
        return blk

    def _at_subselect(self) -> bool:
        nxt = self.peek(1)
        return (self.at_op("{") and nxt is not None
                and nxt.kind == "kw" and nxt.val == "SELECT")

    def _where_blocks(self) -> List[_Block]:
        # WHERE { {b1} UNION {b2} ... }  or  WHERE { plain block };
        # a leading '{ SELECT' is a subselect, not a UNION group
        self.expect_op("{")
        if self.at_op("{") and not self._at_subselect():
            blocks = [self._group()]
            while self.at_kw("UNION"):
                self.take()
                blocks.append(self._group())
            self.expect_op("}")
            return blocks
        # plain block: same item grammar, no UNION
        blk = _Block()
        self._block_items(blk)
        self.take()
        return [blk]

    # ---- projection
    def _agg_call(self) -> _Proj:
        """AGG '(' [DISTINCT] ?var|* ')' — shared by SELECT and HAVING."""
        f_ = self.take()
        if f_.kind != "kw" or f_.val not in _AGG_FUNCS:
            raise SparqlError(
                f"expected aggregate function, got {f_.val!r}")
        self.expect_op("(")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.take()
            distinct = True
        arg = self.take()
        if arg.kind == "op" and arg.val == "*":
            if f_.val != "COUNT":
                raise SparqlError(f"{f_.val}(*) is not valid")
            var = None
        elif arg.kind == "var":
            var = arg.val
        else:
            raise SparqlError(
                f"aggregate argument must be ?var or *, got {arg.val!r}")
        sep = " "
        if self.at_op(";"):
            if f_.val != "GROUP_CONCAT":
                raise SparqlError(
                    f"only GROUP_CONCAT takes a SEPARATOR, not {f_.val}")
            self.take()
            self.expect_kw("SEPARATOR")
            eq = self.take()
            if eq.kind != "op" or eq.val != "=":
                raise SparqlError("SEPARATOR needs '='")
            sep = self._plain_string("SEPARATOR")
        self.expect_op(")")
        return _Proj("agg", var=var, func=f_.val, distinct=distinct,
                     sep=sep)

    def _projection(self) -> List[_Proj]:
        projs: List[_Proj] = []
        while True:
            t = self.peek()
            if t is None:
                break
            if t.kind == "op" and t.val == "*":
                self.take()
                projs.append(_Proj("star"))
            elif t.kind == "var":
                self.take()
                projs.append(_Proj("var", var=t.val))
            elif t.kind == "op" and t.val == "(":
                self.take()
                nxt = self.peek()
                if nxt is not None and nxt.kind == "kw" \
                        and nxt.val in _EXPR_FUNCS:
                    fn = self.take().val
                    var = self._func_var_arg(fn)
                    p = _Proj("expr", var=var[1:], func=fn)
                elif nxt is not None and nxt.kind == "var":
                    # (?v AS ?alias) — identity rename projection
                    p = _Proj("expr", var=self.take().val, func="VAR")
                else:
                    p = self._agg_call()
                self.expect_kw("AS")
                alias = self.take()
                if alias.kind != "var":
                    raise SparqlError("AS must bind a ?variable")
                self.expect_op(")")
                p.alias = alias.val
                projs.append(p)
            else:
                break
        if not projs:
            raise SparqlError("empty SELECT projection")
        return projs

    # ---- top level
    def parse(self) -> ParsedQuery:
        while self.at_kw("PREFIX") or self.at_kw("BASE"):
            if self.at_kw("BASE"):
                self.take()
                iri = self.take()
                if iri.kind != "iri":
                    raise SparqlError("BASE needs an <iri>")
                self.base = iri.val[1:-1]
                continue
            self.take()
            p = self.take()
            if p.kind != "pname" or not p.val.endswith(":"):
                raise SparqlError(f"bad PREFIX name {p.val!r}")
            iri = self.take()
            if iri.kind != "iri":
                raise SparqlError("PREFIX needs an <iri>")
            # prefix expansions resolve against BASE too (RFC 3986)
            val = iri.val[1:-1]
            if self.base and ":" not in val.split("/")[0].split("#")[0]:
                from ..terms import resolve_iri
                val = resolve_iri(self.base, val)
            self.prefixes[p.val[:-1]] = val
        q = self._query()
        if self.peek() is not None:
            raise SparqlError(f"unexpected trailing {self.peek().val!r}")
        return q

    def _query(self) -> ParsedQuery:
        """One query form (used at top level and for { SELECT } subqueries
        — the modifier loop stops at the subquery's closing brace)."""
        t = self.take()
        if t.kind != "kw" or t.val not in ("SELECT", "CONSTRUCT", "ASK",
                                           "DESCRIBE"):
            raise SparqlError(
                "only SELECT/CONSTRUCT/ASK/DESCRIBE are supported, got "
                f"{t.val!r}")
        form = t.val.lower()

        distinct = False
        projection: List[_Proj] = []
        template: List[Tuple[str, str, str]] = []
        describe: List[str] = []
        if form == "select":
            if self.at_kw("DISTINCT"):
                self.take()
                distinct = True
            elif self.at_kw("REDUCED"):
                # REDUCED permits ANY duplicate elimination (§15.3.1);
                # implementing it as DISTINCT is conformant and is what
                # the relational engine does naturally
                self.take()
                distinct = True
            projection = self._projection()
        elif form == "construct":
            self.expect_op("{")
            while not self.at_op("}"):
                self._triples_into(template)
            self.take()
        elif form == "describe":
            while True:
                t2 = self.peek()
                if t2 is None:
                    break
                if t2.kind == "var":
                    describe.append("?" + self.take().val)
                elif t2.kind == "iri":
                    describe.append(self.take().val)
                elif t2.kind == "pname":
                    describe.append(self._expand_pname(self.take().val))
                else:
                    break
            if not describe:
                raise SparqlError("DESCRIBE needs ?vars or IRIs")

        has_where = self.at_kw("WHERE") or self.at_op("{")
        if self.at_kw("WHERE"):
            self.take()
        if has_where:
            blocks = self._where_blocks()
        elif form == "describe" and all(
                not d.startswith("?") for d in describe):
            blocks = []      # DESCRIBE <iri> needs no pattern match
        else:
            raise SparqlError("missing WHERE group")

        group_by: List[str] = []
        order_by: List[Tuple[str, bool]] = []
        having: List[Tuple[object, str, int]] = []
        limit: Optional[int] = None
        offset: Optional[int] = None
        values_clause = None
        while self.peek() is not None and not self.at_op("}"):
            if self.at_kw("HAVING"):
                self.take()
                self.expect_op("(")
                t2 = self.peek()
                if t2 is not None and t2.kind == "var":
                    lhs: object = self.take().val   # SELECT alias ref
                else:
                    lhs = self._agg_call()
                    if lhs.func in ("GROUP_CONCAT", "SAMPLE"):
                        raise SparqlError(
                            f"{lhs.func} is string-valued — not usable "
                            "in HAVING's integer comparison")
                op = self.take()
                if op.kind != "op" or op.val not in _CMP_OPS:
                    raise SparqlError(
                        f"unsupported HAVING operator {op.val!r}")
                v = self.take()
                if v.kind != "int":
                    raise SparqlError("HAVING compares to an integer")
                self.expect_op(")")
                having.append((lhs, op.val, v.val))
            elif self.at_kw("GROUP"):
                self.take()
                self.expect_kw("BY")
                while self.peek() is not None and self.peek().kind == "var":
                    group_by.append(self.take().val)
                if not group_by:
                    raise SparqlError("GROUP BY needs at least one ?var")
            elif self.at_kw("ORDER"):
                self.take()
                self.expect_kw("BY")
                saw = False
                while True:
                    if self.at_kw("ASC") or self.at_kw("DESC"):
                        asc = self.take().val == "ASC"
                        self.expect_op("(")
                        v = self.take()
                        if v.kind != "var":
                            raise SparqlError("ORDER BY needs ?vars")
                        self.expect_op(")")
                        order_by.append((v.val, asc))
                        saw = True
                    elif self.peek() is not None and self.peek().kind == "var":
                        order_by.append((self.take().val, True))
                        saw = True
                    else:
                        break
                if not saw:
                    raise SparqlError("empty ORDER BY")
            elif self.at_kw("LIMIT"):
                self.take()
                v = self.take()
                if v.kind != "int" or v.val < 0:
                    raise SparqlError("LIMIT needs a non-negative integer")
                limit = v.val
            elif self.at_kw("OFFSET"):
                self.take()
                v = self.take()
                if v.kind != "int" or v.val < 0:
                    raise SparqlError("OFFSET needs a non-negative integer")
                offset = v.val
            elif self.at_kw("VALUES"):
                self.take()
                values_clause = self._values_table()
            else:
                raise SparqlError(
                    f"unexpected trailing {self.peek().val!r}")

        q = ParsedQuery(form=form, distinct=distinct, projection=projection,
                        blocks=blocks, group_by=group_by, order_by=order_by,
                        limit=limit, template=template, describe=describe,
                        having=having, offset=offset,
                        values_clause=values_clause)
        _validate(q)
        return q


def _validate(q: ParsedQuery) -> None:
    if q.form in ("ask", "describe"):
        if (q.group_by or q.order_by or q.having
                or q.limit is not None or q.offset is not None):
            raise SparqlError(
                f"{q.form.upper()} does not take solution modifiers")
        return
    has_agg = any(p.kind == "agg" for p in q.projection)
    if q.having:
        if not (has_agg or q.group_by):
            raise SparqlError("HAVING requires aggregation or GROUP BY")
        aliases = {p.alias for p in q.projection if p.kind == "agg"}
        for h, _, _ in q.having:
            if isinstance(h, str) and h not in aliases:
                raise SparqlError(
                    f"HAVING references unknown alias ?{h}")
    if has_agg or q.group_by:
        # GROUP BY without SELECT aggregates is the DISTINCT-keys(+
        # HAVING) shape — valid; every plain projection must be grouped
        for p in q.projection:
            if p.kind == "star":
                raise SparqlError("SELECT * cannot mix with aggregates")
            if p.kind in ("var", "expr") and p.var not in q.group_by:
                raise SparqlError(
                    f"?{p.var} is projected but neither aggregated nor "
                    "in GROUP BY")
    if any(p.kind == "star" for p in q.projection) \
            and any(p.kind == "expr" for p in q.projection):
        raise SparqlError("SELECT * cannot mix with expressions")
    if q.form == "construct":
        if q.group_by or any(p.kind == "agg" for p in q.projection):
            raise SparqlError("CONSTRUCT does not take aggregates")
        if not q.template:
            raise SparqlError("empty CONSTRUCT template")


def parse_sparql(text: str) -> ParsedQuery:
    return _Parser(_tokenize(text), text).parse()


# ------------------------------------------------------------- UPDATE

@dataclass
class UpdateOp:
    """One SPARQL 1.1 Update operation, normalized: ground data for the
    *_DATA forms, construct-form queries (template + shared WHERE) for
    the pattern forms. The graph after the op is
    ``(G ∖ delete-set) ∪ insert-set`` with set semantics on
    (subj, pred, obj)."""
    delete_data: List[Tuple[str, str, str]] = field(default_factory=list)
    insert_data: List[Tuple[str, str, str]] = field(default_factory=list)
    delete_q: Optional[ParsedQuery] = None
    insert_q: Optional[ParsedQuery] = None


def _construct_query(template, blocks) -> ParsedQuery:
    return ParsedQuery(form="construct", distinct=False, projection=[],
                       blocks=blocks, group_by=[], order_by=[],
                       limit=None, template=template, describe=[],
                       having=[], offset=None)


class _UpdateParser(_Parser):
    """SPARQL 1.1 Update subset: INSERT DATA / DELETE DATA /
    DELETE WHERE / DELETE {} INSERT {} WHERE {} (either part optional),
    sequenced with ';'. GRAPH-targeted updates are not supported (the
    materialized store's graph column is provenance-managed)."""

    def parse_update(self) -> List[UpdateOp]:
        while self.at_kw("PREFIX") or self.at_kw("BASE"):
            if self.at_kw("BASE"):
                self.take()
                iri = self.take()
                if iri.kind != "iri":
                    raise SparqlError("BASE needs an <iri>")
                self.base = iri.val[1:-1]
                continue
            self.take()
            p = self.take()
            if p.kind != "pname" or not p.val.endswith(":"):
                raise SparqlError(f"bad PREFIX name {p.val!r}")
            iri = self.take()
            if iri.kind != "iri":
                raise SparqlError("PREFIX needs an <iri>")
            # prefix expansions resolve against BASE too (RFC 3986)
            val = iri.val[1:-1]
            if self.base and ":" not in val.split("/")[0].split("#")[0]:
                from ..terms import resolve_iri
                val = resolve_iri(self.base, val)
            self.prefixes[p.val[:-1]] = val
        ops = [self._update_op()]
        while self.at_op(";"):
            self.take()
            if self.peek() is None:
                break               # trailing ';' is legal
            ops.append(self._update_op())
        if self.peek() is not None:
            raise SparqlError(f"unexpected trailing {self.peek().val!r}")
        return ops

    def _braced_triples(self, ground: bool) -> List[Tuple[str, str, str]]:
        tmpl: List[Tuple[str, str, str]] = []
        self.expect_op("{")
        while not self.at_op("}"):
            self._triples_into(tmpl)
        self.take()
        if ground:
            for t in tmpl:
                for term in t:
                    if term.startswith("?"):
                        raise SparqlError(
                            f"INSERT/DELETE DATA takes ground triples, "
                            f"got variable {term}")
        if not tmpl:
            raise SparqlError("empty update triple block")
        return tmpl

    def _update_op(self) -> UpdateOp:
        t = self.take()
        if t.kind != "kw" or t.val not in ("INSERT", "DELETE"):
            raise SparqlError(
                f"expected INSERT or DELETE, got {t.val!r}")
        if t.val == "INSERT":
            if self.at_kw("DATA"):
                self.take()
                return UpdateOp(
                    insert_data=self._braced_triples(ground=True))
            tmpl = self._braced_triples(ground=False)
            self.expect_kw("WHERE")
            blocks = self._where_blocks()
            return UpdateOp(insert_q=_construct_query(tmpl, blocks))
        # DELETE ...
        if self.at_kw("DATA"):
            self.take()
            return UpdateOp(delete_data=self._braced_triples(ground=True))
        if self.at_kw("WHERE"):
            # DELETE WHERE { pats }: the pattern block is its own
            # template (SPARQL 1.1 §3.1.3 — triples only, no FILTER)
            self.take()
            pats = self._braced_triples(ground=False)
            blk = _Block(patterns=list(pats))
            return UpdateOp(delete_q=_construct_query(pats, [blk]))
        del_tmpl = self._braced_triples(ground=False)
        ins_tmpl: List[Tuple[str, str, str]] = []
        if self.at_kw("INSERT"):
            self.take()
            ins_tmpl = self._braced_triples(ground=False)
        self.expect_kw("WHERE")
        blocks = self._where_blocks()
        return UpdateOp(
            delete_q=_construct_query(del_tmpl, blocks),
            insert_q=_construct_query(ins_tmpl, blocks) if ins_tmpl
            else None)


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def parse_update(text: str) -> List[UpdateOp]:
    return _UpdateParser(_tokenize(text), text).parse_update()


def sparql_update(triples: DataFrame, update: str) -> DataFrame:
    """Apply a SPARQL UPDATE string to a triples DataFrame and return
    the post-update graph — ``(G ∖ deletes) ∪ inserts`` per op, set
    semantics on (subj, pred, obj).

    Non-(subj, pred, obj) columns (lineage, graph, obj_is_literal) are
    PRESERVED on surviving rows; inserted rows carry obj_is_literal
    derived from the term form and NULL lineage (an update is not an
    extraction — it has no conversation provenance). Deletions remove
    every copy of a matched triple (RDF graphs are sets; the store's
    bag-with-lineage view collapses on delete, the same way the
    reference's Graph.Remove drops the statement).

    At scale each op is: one anti join on the (small) delete set + one
    anti-join-guarded union of the insert set — both broadcastable when
    the delta is small, which is the update-workload shape; writing the
    result through graph.incremental_update rewrites only the
    partitions the delta touched."""
    spark = triples.sparkSession
    extra = [c for c in triples.columns
             if c not in ("subj", "pred", "obj")]

    def _lit_df(rows):
        df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
        return df

    def _with_extras(df):
        cols = [F.col("subj"), F.col("pred"), F.col("obj")]
        for c in extra:
            if c == "obj_is_literal":
                cols.append(F.col("obj").startswith('"')
                            .alias("obj_is_literal"))
            else:
                cols.append(F.lit(None).cast(
                    dict(triples.dtypes)[c]).alias(c))
        return df.select(*cols)

    cur = triples
    for op in parse_update(update):
        dels = None
        if op.delete_data:
            dels = _lit_df(op.delete_data)
        elif op.delete_q is not None:
            dels = _exec_query(cur, op.delete_q)
        ins = None
        if op.insert_data:
            ins = _lit_df(op.insert_data)
        elif op.insert_q is not None:
            ins = _exec_query(cur, op.insert_q)
        nxt = cur
        if dels is not None:
            nxt = nxt.join(F.broadcast(dels.select("subj", "pred", "obj")
                                       .distinct()),
                           on=["subj", "pred", "obj"], how="left_anti")
        if ins is not None:
            # SPARQL op order: deletes apply first, THEN inserts — so a
            # triple both deleted and inserted by one op survives; the
            # presence check runs against the post-delete graph
            fresh = (ins.select("subj", "pred", "obj").distinct()
                     .join(nxt.select("subj", "pred", "obj").distinct(),
                           on=["subj", "pred", "obj"], how="left_anti"))
            nxt = nxt.unionByName(_with_extras(fresh))
        cur = nxt
    return cur


def update_sql(update: str, base_cte: str) -> str:
    """DuckDB twin of ``sparql_update`` (projected to subj, pred, obj):
    iterates the ops as chained CTEs — g0 = base, g_{k+1} =
    (g_k ∖ deletes_k) ∪ (inserts_k ∖ g_k)."""
    ops = parse_update(update)
    parts = [f"g0 AS (SELECT subj, pred, obj FROM ({base_cte}) b0)"]
    for k, op in enumerate(ops):
        cur, nxt = f"g{k}", f"g{k + 1}"
        if op.delete_data:
            rows = ", ".join(
                "(" + ", ".join(_sql_str(t) for t in tr) + ")"
                for tr in op.delete_data)
            dels = f"(SELECT * FROM (VALUES {rows}) d(subj, pred, obj))"
        elif op.delete_q is not None:
            dels = "(" + _parsed_sql(op.delete_q, f"SELECT * FROM {cur}",
                                     f"b_{k}d") + ")"
        else:
            dels = None
        if op.insert_data:
            rows = ", ".join(
                "(" + ", ".join(_sql_str(t) for t in tr) + ")"
                for tr in op.insert_data)
            ins = f"(SELECT * FROM (VALUES {rows}) i(subj, pred, obj))"
        elif op.insert_q is not None:
            ins = "(" + _parsed_sql(op.insert_q, f"SELECT * FROM {cur}",
                                    f"b_{k}i") + ")"
        else:
            ins = None
        kept = f"SELECT subj, pred, obj FROM {cur} c"
        if dels:
            kept += (f" WHERE NOT EXISTS (SELECT 1 FROM {dels} dl "
                     f"WHERE dl.subj = c.subj AND dl.pred = c.pred "
                     f"AND dl.obj = c.obj)")
        parts.append(f"{nxt}_kept AS ({kept})")
        body = f"SELECT subj, pred, obj FROM {nxt}_kept"
        if ins:
            # insert checks presence against the POST-delete graph, so a
            # triple both deleted and inserted by one op survives
            body += (f" UNION ALL SELECT DISTINCT subj, pred, obj "
                     f"FROM {ins} it "
                     f"WHERE NOT EXISTS (SELECT 1 FROM {nxt}_kept kp "
                     f"WHERE kp.subj = it.subj AND kp.pred = it.pred "
                     f"AND kp.obj = it.obj)")
        parts.append(f"{nxt} AS ({body})")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT subj, pred, obj FROM g{len(ops)}")


# ----------------------------------------------------------- DataFrame

def _int_col(name: str) -> "F.Column":
    return F.regexp_extract(F.col(name), _INT_LIT_RE, 1).try_cast("long")


def _datatype_column(col: "F.Column") -> "F.Column":
    """SPARQL 1.1 DATATYPE() as a canonical IRI term: explicit ^^ type,
    rdf:langString for lang-tagged, xsd:string for plain literals
    (RDF 1.1), and NULL (type error → unbound) for IRIs/bnodes."""
    dt = F.regexp_extract(col, _DT_RE, 1)
    lang = F.regexp_extract(col, _LANG_RE, 1)
    return F.when(
        col.startswith('"'),
        F.when(dt != "", F.concat(F.lit("<"), dt, F.lit(">")))
        .when(lang != "", F.lit("<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>"))
        .otherwise(F.lit("<http://www.w3.org/2001/XMLSchema#string>")))


def _expr_column(p: _Proj) -> "F.Column":
    """A SELECT expression (LANG / DATATYPE / STR of a variable)."""
    col = F.col(p.var)
    if p.func == "LANG":
        # type error (unbound) for non-literals, '' for untagged
        c = F.when(col.startswith('"'),
                   F.regexp_extract(col, _LANG_RE, 1))
    elif p.func == "DATATYPE":
        c = _datatype_column(col)
    elif p.func == "VAR":               # (?v AS ?alias) rename
        c = col
    else:                               # STR
        c = _str_column(col)
    return c.alias(p.alias)


def _proj_columns(projection, available=None) -> list:
    """Projection columns; with ``available`` (the solution's column
    set), a var/expression over an UNDEFINED variable projects NULL —
    SPARQL expression errors leave the binding unbound instead of
    failing the query (W3C project-expression suite)."""
    cols = []
    for p in projection:
        if p.kind == "var":
            if available is not None and p.var not in available:
                cols.append(F.lit(None).cast("string").alias(p.var))
            else:
                cols.append(F.col(p.var))
        elif p.kind == "agg":
            cols.append(F.col(p.alias))
        elif p.kind == "expr":
            if available is not None and p.var not in available:
                cols.append(F.lit(None).cast("string").alias(p.alias))
            else:
                cols.append(_expr_column(p))
    return cols


def _agg_column(p: _Proj) -> "F.Column":
    if p.func == "COUNT":
        if p.var is None:
            c = F.count(F.lit(1))
        elif p.distinct:
            c = F.count_distinct(F.col(p.var))
        else:
            c = F.count(F.col(p.var))
        return c.alias(p.alias)
    if p.func == "GROUP_CONCAT":
        # SPARQL leaves element order undefined; we define SORTED order
        # so both engines produce the identical string
        coll = (F.collect_set(F.col(p.var)) if p.distinct
                else F.collect_list(F.col(p.var)))
        return F.array_join(F.array_sort(coll), p.sep).alias(p.alias)
    if p.func == "SAMPLE":
        # deterministic sample: the minimum term string on both engines
        return F.min(F.col(p.var)).alias(p.alias)
    col = _int_col(p.var)
    if p.distinct:
        raise SparqlError(f"DISTINCT inside {p.func} is only supported "
                          "for COUNT and GROUP_CONCAT")
    fn = {"SUM": F.sum, "MIN": F.min, "MAX": F.max, "AVG": F.avg}[p.func]
    c = fn(col)
    if p.func == "AVG":
        c = F.round(c, 6)
    return c.alias(p.alias)


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Execute a SPARQL SELECT/CONSTRUCT/ASK/DESCRIBE string over the
    triples table (canonical subj/pred/obj columns). Returns one column
    per projected variable (SELECT) or canonical subj/pred/obj rows
    (CONSTRUCT)."""
    return _exec_query(triples, parse_sparql(query))


def _join_values_table(sol: DataFrame, tvars, rows) -> DataFrame:
    """Join a VALUES solution table with ``sol`` under SPARQL
    compatibility: UNDEF (None) and unbound are wildcards; merged
    bindings prefer the bound side; table-only variables extend the
    solutions."""
    from pyspark.sql.types import StringType, StructField, StructType
    spark = sol.sparkSession
    schema = StructType([StructField(f"__vt_{v}", StringType(), True)
                         for v in tvars])
    vt = spark.createDataFrame([tuple(r) for r in rows], schema)
    shared = [v for v in tvars if v in sol.columns]
    cond = F.lit(True)
    for v in shared:
        tv = F.col(f"__vt_{v}")
        cond = cond & (tv.isNull() | F.col(v).isNull()
                       | (tv == F.col(v)))
    joined = sol.join(F.broadcast(vt), cond)
    cols = []
    for c in sol.columns:
        if c in shared:
            cols.append(F.coalesce(F.col(c), F.col(f"__vt_{c}"))
                        .alias(c))
        else:
            cols.append(F.col(c))
    for v in tvars:
        if v not in sol.columns:
            cols.append(F.col(f"__vt_{v}").alias(v))
    return joined.select(*cols)


def _exec_block(triples: DataFrame, blk: _Block) -> DataFrame:
    """One block's solutions: patterns via bgp_match, then every
    { SELECT } subquery joined on its shared variables (the SPARQL
    bottom-up evaluation order — subqueries are computed independently
    and joined into the enclosing group)."""
    if not blk.patterns and (blk.filters or blk.optionals or blk.minus
                             or blk.exists or blk.not_exists or blk.binds):
        raise SparqlError(
            "a block without triple patterns supports only subqueries")
    # the TEXT front-end is spec-facing: disconnected patterns are
    # legal SPARQL (often re-joined by a FILTER); the programmatic
    # bgp_match API keeps its explicit cartesian guard
    sol = bgp_match(triples, allow_cross=True, **blk.kwargs()) \
        if blk.patterns else None
    for sub in blk.subselects:
        sdf = _exec_query(triples, sub)
        if sol is None:
            sol = sdf
            continue
        shared = [c for c in sdf.columns if c in sol.columns]
        if not shared:
            raise SparqlError(
                "subquery shares no variable with the enclosing block")
        sol = sol.join(sdf, on=shared)
    if sol is None:
        raise SparqlError("empty WHERE block")
    for tvars, rows in blk.values_tables:
        sol = _join_values_table(sol, tvars, rows)
    return sol


def _exec_query(triples: DataFrame, q: ParsedQuery) -> DataFrame:
    from .query import align_union
    if len(q.blocks) == 1:
        sol = _exec_block(triples, q.blocks[0])
    elif q.blocks:
        sol = align_union([_exec_block(triples, b) for b in q.blocks])
    else:
        sol = None    # DESCRIBE <iri> without WHERE

    if sol is not None and q.values_clause is not None:
        sol = _join_values_table(sol, *q.values_clause)

    if q.form == "ask":
        # limit(1) first: existence needs one solution, not the count
        return sol.limit(1).agg(
            (F.count(F.lit(1)) > 0).alias("ask"))

    if q.form == "describe":
        base = triples.select("subj", "pred", "obj")
        var_targets = [d[1:] for d in q.describe if d.startswith("?")]
        consts = [d for d in q.describe if not d.startswith("?")]
        parts = []
        if var_targets:
            nodes = None
            for v in var_targets:
                if v not in sol.columns:
                    raise SparqlError(
                        f"DESCRIBE variable ?{v} is not bound in WHERE")
                nd = sol.select(F.col(v).alias("subj"))
                nodes = nd if nodes is None else nodes.unionByName(nd)
            nodes = nodes.filter(F.col("subj").isNotNull()).distinct()
            parts.append(base.join(nodes, "subj", "left_semi"))
        if consts:
            parts.append(base.filter(F.col("subj").isin(consts)))
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.distinct()    # description of a set of nodes is a graph

    if q.form == "construct":
        parts = []
        for (s, p, o) in q.template:
            cols = []
            cond = F.lit(True)
            for term, name in ((s, "subj"), (p, "pred"), (o, "obj")):
                if term.startswith("?"):
                    v = term[1:]
                    if v not in sol.columns:
                        raise SparqlError(
                            f"template variable ?{v} is not bound in WHERE")
                    cols.append(F.col(v).alias(name))
                    cond = cond & F.col(v).isNotNull()
                else:
                    cols.append(F.lit(term).alias(name))
            parts.append(sol.filter(cond).select(*cols))
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.distinct()    # a graph is a set of triples

    has_agg = any(p.kind == "agg" for p in q.projection) or bool(q.group_by)
    if has_agg:
        aggs = [_agg_column(p) for p in q.projection if p.kind == "agg"]
        # HAVING aggregates not in SELECT ride along as hidden columns
        conds = []
        for idx, (h, op, val) in enumerate(q.having):
            if isinstance(h, str):
                conds.append((h, op, val))
            else:
                h.alias = f"_having_{idx}"
                aggs.append(_agg_column(h))
                conds.append((h.alias, op, val))
        if not aggs:
            # GROUP BY with no aggregate at all: distinct group keys
            aggs = [F.count(F.lit(1)).alias("_group_marker")]
        sol = (sol.groupBy(*q.group_by).agg(*aggs) if q.group_by
               else sol.agg(*aggs))
        for name, op, val in conds:
            c = F.col(name)
            sol = sol.filter(
                {"=": c == val, "!=": c != val, "<": c < val,
                 "<=": c <= val, ">": c > val, ">=": c >= val}[op])
        sol = sol.select(*_proj_columns(q.projection, set(sol.columns)))
        sol = _order_slice(sol, q)
    else:
        star = any(p.kind == "star" for p in q.projection)
        if q.distinct:
            # SPARQL restricts ORDER BY to projected vars under DISTINCT
            if not star:
                sol = sol.select(*_proj_columns(q.projection, set(sol.columns)))
            sol = _order_slice(sol.distinct(), q)
        else:
            # ORDER BY runs pre-projection in the SPARQL algebra, so it
            # may reference unprojected variables — but it may also name
            # a SELECT-expression alias (the common reporting idiom);
            # those are computed as extra columns before the sort
            for p in q.projection:
                if (p.kind == "expr" and p.alias not in sol.columns
                        and any(v == p.alias for v, _ in q.order_by)):
                    sol = sol.withColumn(
                        p.alias, _expr_column(p)
                        if p.var in sol.columns
                        else F.lit(None).cast("string"))
            sol = _order_slice(sol, q)
            if not star:
                sol = sol.select(*_proj_columns(q.projection, set(sol.columns)))
    return sol


_NUM_DT_RE = (r'\^\^<http://www\.w3\.org/2001/XMLSchema#'
              r'(integer|decimal|double|float|long|int|short|byte|'
              r'nonNegativeInteger|nonPositiveInteger|negativeInteger|'
              r'positiveInteger|unsignedLong|unsignedInt|unsignedShort|'
              r'unsignedByte)>$')


def _order_key_columns(v: str, asc: bool) -> list:
    """SPARQL ORDER BY comparator over canonical term strings: numeric
    literals order by VALUE among themselves (W3C solution-seq mixes
    xsd:integer with xsd:decimal), term classes order unbound < bnodes
    < IRIs < literals (§15.1, W3C sort-6), and everything else by the
    canonical term string; the numeric key is NULL for non-numerics
    (Spark: ASC=NULLS FIRST, DESC=NULLS LAST — the twin states the same
    null placement explicitly)."""
    c = F.col(v)
    rank = F.when(c.isNull(), F.lit(None).cast("int")) \
        .when(c.startswith("_:"), F.lit(1)) \
        .when(c.startswith("<"), F.lit(2)).otherwise(F.lit(3))
    num = F.when(F.regexp_extract(c, _NUM_DT_RE, 0) != "",
                 F.regexp_extract(c, _LEX_RE, 1).try_cast("double"))
    return [rank.asc() if asc else rank.desc(),
            num.asc() if asc else num.desc(),
            c.asc() if asc else c.desc()]


def _order_slice(sol: DataFrame, q: ParsedQuery) -> DataFrame:
    """ORDER BY / OFFSET / LIMIT in SPARQL's order of operations."""
    if q.order_by:
        missing = [v for v, _ in q.order_by if v not in sol.columns]
        if missing:
            raise SparqlError(
                f"ORDER BY references unavailable variable(s) {missing} "
                "(under DISTINCT, only projected variables are sortable)")
        sol = sol.orderBy(*[
            k for v, asc in q.order_by
            for k in _order_key_columns(v, asc)])
    if q.offset:
        sol = sol.offset(q.offset)
    if q.limit is not None:
        sol = sol.limit(q.limit)
    return sol


# ------------------------------------------------------------ SQL twin

def _int_sql(name: str) -> str:
    return (f"TRY_CAST(regexp_extract({name}, '{_INT_LIT_RE}', 1) "
            f"AS BIGINT)")


def _agg_sql_expr(p: _Proj) -> str:
    if p.func == "COUNT":
        if p.var is None:
            inner = "count(*)"
        elif p.distinct:
            inner = f"count(DISTINCT {p.var})"
        else:
            inner = f"count({p.var})"
        return f"{inner}::BIGINT"
    if p.func == "GROUP_CONCAT":
        d = "DISTINCT " if p.distinct else ""
        sep = "'" + p.sep.replace("'", "''") + "'"
        return f"string_agg({d}{p.var}, {sep} ORDER BY {p.var})"
    if p.func == "SAMPLE":
        return f"min({p.var})"
    expr = _int_sql(p.var)
    if p.func == "AVG":
        return f"round(avg({expr}), 6)"
    return f"{p.func.lower()}({expr})::BIGINT"


def _agg_sql(p: _Proj) -> str:
    return f"{_agg_sql_expr(p)} AS {p.alias}"


def _values_join_sql(body: str, bound: list, tvars, rows):
    """Twin of _join_values_table: join the VALUES table with the
    solution body under SPARQL compatibility (NULL = wildcard)."""
    vt_rows = ", ".join(
        "(" + ", ".join("NULL" if t is None else _sql_str(t)
                        for t in row) + ")" for row in rows)
    vt = f"(VALUES {vt_rows}) vt({', '.join(tvars)})"
    shared = [v for v in tvars if v in bound]
    conds = " AND ".join(
        f"(vt.{v} IS NULL OR q.{v} IS NULL OR vt.{v} = q.{v})"
        for v in shared) or "TRUE"
    sel = []
    for c in bound:
        sel.append(f"COALESCE(q.{c}, vt.{c}) AS {c}"
                   if c in shared else f"q.{c}")
    new_vars = [v for v in tvars if v not in bound]
    sel += [f"vt.{v} AS {v}" for v in new_vars]
    return (f"SELECT {', '.join(sel)} FROM (\n{body}\n) q "
            f"JOIN {vt} ON {conds}", list(bound) + new_vars)


def _block_body_sql(blk: _Block, base_name: str,
                    base_has_graph: bool = False) -> Tuple[str, list]:
    """One block's solution body (no WITH): patterns via _bgp_sql_body,
    then subselect bodies joined on shared variables."""
    from .query import _bgp_sql_body
    # route through kwargs() so a new block field can never be silently
    # dropped on one side (it bit twice: exists, binds)
    kw = blk.kwargs()
    if blk.patterns:
        body, bound = _bgp_sql_body(kw.pop("patterns"), base_name,
                                    base_has_graph=base_has_graph, **kw)
    else:
        body, bound = None, []
    for i, sub in enumerate(blk.subselects):
        sub_body, sub_vars = _select_body_sql(sub, base_name,
                                              base_has_graph)
        if body is None:
            body, bound = (f"SELECT * FROM (\n{sub_body}\n) sq{i}",
                           list(sub_vars))
            continue
        shared = [v for v in sub_vars if v in bound]
        if not shared:
            raise SparqlError(
                "subquery shares no variable with the enclosing block")
        new = [v for v in sub_vars if v not in bound]
        sel_new = (", " + ", ".join(f"sq{i}.{v}" for v in new)) if new \
            else ""
        on = " AND ".join(f"q.{v} = sq{i}.{v}" for v in shared)
        body = (f"SELECT q.*{sel_new} FROM (\n{body}\n) q JOIN "
                f"(\n{sub_body}\n) sq{i} ON {on}")
        bound = bound + new
    if body is None:
        raise SparqlError("empty WHERE block")
    for tvars, rows in blk.values_tables:
        body, bound = _values_join_sql(body, bound, tvars, rows)
    return body, bound


def _solution_body_sql(q: ParsedQuery, base_name: str,
                       base_has_graph: bool = False) -> Tuple[str, list]:
    """WHERE-clause solution body for all of a query's blocks (UNION
    aligned on the union of variables, NULL-padded), plus the
    post-query VALUES clause join (spec section 19.8)."""
    bodies = [_block_body_sql(b, base_name, base_has_graph)
              for b in q.blocks]
    if len(bodies) == 1:
        body, vs = bodies[0]
        if q.values_clause is not None:
            body, vs = _values_join_sql(body, vs, *q.values_clause)
        return body, vs
    all_vars: List[str] = []
    for _, vs in bodies:
        for v in vs:
            if v not in all_vars:
                all_vars.append(v)
    parts = []
    for k, (body, vs) in enumerate(bodies):
        cols = ", ".join(
            v if v in vs else f"CAST(NULL AS VARCHAR) AS {v}"
            for v in all_vars)
        parts.append(f"SELECT {cols} FROM (\n{body}\n) u{k}")
    out = "\nUNION ALL\n".join(parts)
    if q.values_clause is not None:
        return _values_join_sql(out, all_vars, *q.values_clause)
    return out, all_vars


def sparql_sql(query: str, base_cte: str, base_name: str = "base",
               base_has_graph: bool = False) -> str:
    """DuckDB twin: the same parsed query compiled to SQL over a triples
    CTE — the oracle for driver SPARQL queries. ``base_has_graph``:
    the base CTE carries a graph column, so non-GRAPH patterns match
    the default graph only (bgp_match dataset semantics)."""
    return _parsed_sql(parse_sparql(query), base_cte, base_name,
                       base_has_graph)


def _parsed_sql(q: ParsedQuery, base_cte: str,
                base_name: str = "base",
                base_has_graph: bool = False) -> str:
    if q.blocks:
        body, _ = _solution_body_sql(q, base_name, base_has_graph)
        inner = f"WITH {base_name} AS ({base_cte})\n{body}"
    else:
        inner = None    # DESCRIBE <iri> without WHERE

    if q.form == "ask":
        return f"SELECT EXISTS (SELECT 1 FROM (\n{inner}\n) q) AS ask"

    if q.form == "describe":
        var_targets = [d[1:] for d in q.describe if d.startswith("?")]
        consts = [d for d in q.describe if not d.startswith("?")]
        conds = []
        for v in var_targets:
            conds.append(
                f"subj IN (SELECT {v} FROM (\n{inner}\n) q)")
        if consts:
            in_list = ", ".join(
                "'" + c.replace("'", "''") + "'" for c in consts)
            conds.append(f"subj IN ({in_list})")
        return (f"SELECT DISTINCT subj, pred, obj FROM (\n{base_cte}\n) b"
                f"\nWHERE " + "\n   OR ".join(conds))

    if q.form == "construct":
        parts = []
        for (s, p, o) in q.template:
            sel, conds = [], []
            for term, name in ((s, "subj"), (p, "pred"), (o, "obj")):
                if term.startswith("?"):
                    sel.append(f"{term[1:]} AS {name}")
                    conds.append(f"{term[1:]} IS NOT NULL")
                else:
                    esc = term.replace("'", "''")
                    sel.append(f"'{esc}' AS {name}")
            w = (" WHERE " + " AND ".join(conds)) if conds else ""
            # DISTINCT inside each part too: a graph is a set of triples
            # even when the template has a single pattern
            parts.append(
                f"SELECT DISTINCT {', '.join(sel)} FROM sparql_sol{w}")
        return (f"WITH sparql_sol AS (\n{inner}\n)\n"
                + "\nUNION\n".join(parts))

    body, _ = _select_body_sql(q, base_name, base_has_graph)
    return f"WITH {base_name} AS ({base_cte})\n{body}"


def _datatype_sql(name: str) -> str:
    return ("CASE WHEN " + name + " LIKE '\"%' THEN "
            "CASE WHEN regexp_extract(" + name + ", '" + _DT_RE
            + "', 1) <> '' THEN '<' || regexp_extract(" + name + ", '"
            + _DT_RE + "', 1) || '>' WHEN regexp_extract(" + name
            + ", '" + _LANG_RE + "', 1) <> '' THEN '<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>' "
            "ELSE '<http://www.w3.org/2001/XMLSchema#string>' END END")


def _expr_sql(p: _Proj) -> str:
    if p.func == "LANG":
        e = (f"CASE WHEN {p.var} LIKE '\"%' THEN "
             f"regexp_extract({p.var}, '{_LANG_RE}', 1) END")
    elif p.func == "DATATYPE":
        e = _datatype_sql(p.var)
    elif p.func == "VAR":
        e = p.var
    else:
        e = _str_sql(p.var)
    return f"{e} AS {p.alias}"


def _col_sql(p: _Proj) -> str:
    if p.kind == "var":
        return p.var
    if p.kind == "agg":
        return _agg_sql(p)
    return _expr_sql(p)


def _select_body_sql(q: ParsedQuery, base_name: str,
                     base_has_graph: bool = False) -> Tuple[str, list]:
    """SELECT-query body (no WITH) + its output column names — used for
    the top-level SELECT form and recursively for { SELECT } subqueries."""
    if q.form != "select":
        raise SparqlError("subqueries must be SELECT")
    sol_body, sol_vars = _solution_body_sql(q, base_name,
                                            base_has_graph)
    has_agg = any(p.kind == "agg" for p in q.projection) or bool(q.group_by)
    star = any(p.kind == "star" for p in q.projection)
    if has_agg:
        cols = [_col_sql(p) for p in q.projection]
        sql = (f"SELECT {', '.join(cols)} FROM (\n{sol_body}\n) q")
        if q.group_by:
            sql += "\nGROUP BY " + ", ".join(q.group_by)
        if q.having:
            alias_expr = {p.alias: _agg_sql_expr(p)
                          for p in q.projection if p.kind == "agg"}
            hconds = []
            for h, op, val in q.having:
                expr = alias_expr[h] if isinstance(h, str) \
                    else _agg_sql_expr(h)
                hconds.append(f"{expr} {'<>' if op == '!=' else op} {val}")
            sql += "\nHAVING " + " AND ".join(hconds)
    else:
        cols = ["*"] if star else [_col_sql(p) for p in q.projection]
        kw = "SELECT DISTINCT" if q.distinct else "SELECT"
        sql = f"{kw} {', '.join(cols)} FROM (\n{sol_body}\n) q"
    if q.order_by:
        def okeys(v, asc):
            # CAST for the string probes: aggregate aliases are native
            # BIGINT/DOUBLE columns (the final {v} key keeps their
            # numeric ordering on both engines)
            sv = f"CAST({v} AS VARCHAR)"
            rank = (f"CASE WHEN {v} IS NULL THEN NULL "
                    f"WHEN {sv} LIKE '_:%' THEN 1 "
                    f"WHEN {sv} LIKE '<%' THEN 2 ELSE 3 END")
            num = (f"TRY_CAST(regexp_extract({sv}, '{_LEX_RE}', 1) "
                   f"AS DOUBLE)")
            cond = f"regexp_extract({sv}, '{_NUM_DT_RE}', 0) <> ''"
            nk = f"CASE WHEN {cond} THEN {num} END"
            d = ("ASC NULLS FIRST" if asc else "DESC NULLS LAST")
            return f"{rank} {d}, {nk} {d}, {v} {d}"
        sql += "\nORDER BY " + ", ".join(
            okeys(v, asc) for v, asc in q.order_by)
    if q.limit is not None:
        sql += f"\nLIMIT {q.limit}"
    if q.offset:
        sql += f"\nOFFSET {q.offset}"
    out = sol_vars if star else [
        p.var if p.kind == "var" else p.alias for p in q.projection]
    return sql, out
