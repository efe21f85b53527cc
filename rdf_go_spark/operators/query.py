"""Basic-graph-pattern (BGP) matching over the triples table: the query
companion to KG construction — SPARQL-style conjunctive patterns
compiled into DataFrame equi-joins, letting Catalyst/AQE pick join order
and strategy (the reference is construction-only; SURVEY.md §2.4 lists
relational queries as the Spark-side extension).

A pattern is a (s, p, o) triple of strings; ``?name`` marks a variable,
anything else is a constant matched against the canonical term strings
the pipeline produces (``<iri>``, ``_:b…``, ``"literal"…``).

Compilation: each pattern becomes a constant-filtered, variable-renamed
projection of the triples table; patterns then left-to-right inner-join
on their shared variables (no shared variable = an explicit documented
cross — rejected by default). Catalyst handles join reordering,
broadcast selection, and AQE skew splitting; per-pattern filters push
into the scan. Duplicate-variable patterns (``?x p ?x``) filter within
the pattern first.

Beyond plain BGPs, the module covers the core SPARQL algebra:
``optionals`` (OPTIONAL → left join), ``filters`` (FILTER → post-join
predicates: numeric comparisons extract the integer from the canonical
``"n"^^xsd:integer`` literal on both engines; ``bound``/``!bound`` test
optional bindings), ``minus`` (MINUS → left-anti join on the shared
variables), ``bgp_union`` (UNION → aligned column union with NULL
padding), and property-path predicates (a pattern whose predicate is a
path expression — ``<p>/<q>``, ``^<p>``, ``<p>|<q>``, ``<p>+`` — routes
through operators/paths.py and joins like any other pattern). Every
construct has a DuckDB SQL twin for oracle checking.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ("subj", "pred", "obj")

_INT_LIT_RE = r'^"(-?\d+)"'  # canonical integer literal prefix
_LANG_RE = r'@([A-Za-z0-9-]+)$'       # language tag of a canonical literal
_DT_RE = r'\^\^<([^>]*)>$'            # explicit datatype IRI
_IRI_RE = r'^<(.*)>$'                 # IRI inner text (STR of an IRI)
_LEX_RE = r'^"(.*)"'                  # lexical form (escaped) of a literal
_FILTER_OPS = (
    "=", "!=", "<", "<=", ">", ">=", "bound", "!bound",
    # SPARQL built-ins over the canonical term string:
    "lang=", "lang!=",                 # LANG(?x) =/!= "tag"
    "dt=", "dt!=",                     # DATATYPE(?x) =/!= <iri>
    "strstarts", "!strstarts",         # STRSTARTS(STR(?x), "s")
    "strends", "!strends",
    "contains", "!contains",
    "in",                              # VALUES ?x { ... } lowered to IN
    "var=", "var!=",                   # var-to-var VALUE equality
    "svar=", "svar!=",                 # sameTerm var-to-var (strict)
    "same=", "same!=",                 # sameTerm vs constant (strict)
    "isiri", "!isiri", "isliteral", "!isliteral",
    "isblank", "!isblank",             # term-class tests
    "langmatches", "!langmatches",     # BCP47 basic filtering
    "str=", "str!=",                   # STR(?x) = "simple string"
    "regex", "!regex",                 # REGEX(?x, "pat", "flags")
    "ebv", "!ebv", "ebvconst",         # effective boolean value
    "||",                              # disjunction of &&-chains (DNF)
)


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _is_path_pred(term: str) -> bool:
    from .paths import is_path
    return not _is_var(term) and is_path(term)


def _bind_positions(df: DataFrame, pat, positions) -> Tuple[DataFrame, List[str]]:
    """Shared var/const handling for a relation whose columns correspond
    positionally to the pattern's terms: vars rename, constants filter,
    a repeated var filters for within-pattern equality."""
    rename: Dict[str, str] = {}
    for pos, term in zip(positions, pat):
        if term is None:
            continue
        if _is_var(term):
            var = term[1:]
            if var in rename.values():
                prev = next(p for p, v in rename.items() if v == var)
                df = df.filter(F.col(pos) == F.col(prev))
            else:
                rename[pos] = var
        else:
            df = df.filter(F.col(pos) == term)
    return (df.select(*[F.col(p).alias(v) for p, v in rename.items()]),
            list(rename.values()))


def _is_zero_length_pat(pat) -> bool:
    """A pattern whose predicate is a path with a top-level zero-length
    component (``*``/``?``/``{0,m}``) — needs an endpoint restriction."""
    from .paths import has_zero_length
    return len(pat) == 3 and _is_path_pred(pat[1]) \
        and has_zero_length(pat[1])


def _zl_pattern_rel(base: DataFrame, pat, result: DataFrame,
                    bound: Sequence[str]) -> DataFrame:
    """(src, dst) relation for a zero-length-capable path pattern:
    ``closure-part ∪ identity-part`` where the identity is evaluated
    over the RESTRICTED node set — the pattern's constant endpoint, or
    the values the partial result already binds for an endpoint var
    (intersected with graph nodes, since ZeroLengthPath ranges over
    subject/object terms only), NEVER the node universe. The same
    correlation shape MINUS/EXISTS use: a distinct over the (small)
    partial result plus one semi join against the scan."""
    from .paths import _compile_df, parse_path, split_zero_length
    s, p, o = pat
    r_ast, _ = split_zero_length(parse_path(p))
    rel = _compile_df(r_ast, base) if r_ast is not None else None
    const = next((t for t in (s, o) if not _is_var(t)), None)
    if const is not None:
        # ZeroLengthPath(term, _): the term relates to itself
        # unconditionally (no graph-membership requirement in §18.4)
        id_nodes = base.sparkSession.range(1).select(
            F.lit(const).alias("node"))
    else:
        var = next((t[1:] for t in (s, o) if t[1:] in bound), None)
        if var is None or result is None:
            raise ValueError(
                f"pattern {pat!r} has a zero-length path component with "
                "both endpoints unrestricted — bind one endpoint via "
                "another pattern or a constant (evaluating identity over "
                "the node universe is rejected by design; see "
                "paths.path_pairs id_nodes=)")
        cand = result.select(F.col(var).alias("node")).distinct()
        members = base.select(
            F.explode(F.array("subj", "obj")).alias("node"))
        id_nodes = cand.join(members, on="node", how="left_semi")
    ident = id_nodes.select(F.col("node").alias("src"),
                            F.col("node").alias("dst"))
    rel = ident if rel is None else rel.unionByName(ident)
    return rel.distinct()


def _compile_pattern(base: DataFrame, pat: Tuple[str, str, str],
                     graph: str = None) -> Tuple[DataFrame, List[str]]:
    if len(pat) != 3:
        raise ValueError(f"pattern {pat!r} is not a triple")
    s, p, o = pat
    if _is_path_pred(p):
        if graph is not None:
            raise ValueError(
                "property paths inside GRAPH are not supported (a path "
                "hop crossing graphs has no single ?g binding)")
        from .paths import path_pairs
        rel = path_pairs(base, p)
        return _bind_positions(rel, (s, o), ("src", "dst"))
    if graph is not None:
        return _bind_positions(base, (graph, s, p, o),
                               ("graph",) + _POSITIONS)
    return _bind_positions(base, pat, _POSITIONS)


def _is_plain_literal(value) -> bool:
    """A canonical plain string literal: '"..."' with no lang tag or
    datatype suffix."""
    return (isinstance(value, str) and len(value) >= 2
            and value.startswith('"') and value.endswith('"'))


def _str_column(col: "F.Column") -> "F.Column":
    """SPARQL STR() over a canonical term string: IRI → inner text,
    literal → (escaped) lexical form, bnode → '' (a type error that
    makes every string predicate false, dropping the row)."""
    return F.when(col.startswith("<"),
                  F.regexp_extract(col, _IRI_RE, 1)) \
            .otherwise(F.regexp_extract(col, _LEX_RE, 1))


_NUM_DT_SET = ("integer", "decimal", "double", "float", "long", "int",
               "short", "byte", "nonNegativeInteger", "nonPositiveInteger",
               "negativeInteger", "positiveInteger", "unsignedLong",
               "unsignedInt", "unsignedShort", "unsignedByte")
_XSD = "http://www.w3.org/2001/XMLSchema#"


def _dt_class(col: "F.Column") -> "F.Column":
    """Value-space class of a canonical term: 'term' (IRI/bnode),
    'num', 'bool', 'dtime', 'str' (plain/lang-tagged/xsd:string — the
    canonical form folds xsd:string into plain), 'unknown'."""
    dt = F.regexp_extract(col, _DT_RE, 1)
    lex = F.regexp_extract(col, _LEX_RE, 1)
    # ill-typed literals ("xyz"^^xsd:integer) have UNDEFINED values —
    # they compare like unknown datatypes (error), W3C open-eq-08
    num_ok = lex.try_cast("double").isNotNull()
    bool_ok = lex.isin("true", "false", "1", "0")
    ts_ok = _ts_value(lex).isNotNull()
    return (F.when(~col.startswith('"'), F.lit("term"))
            .when(F.regexp_extract(col, _LANG_RE, 1) != "",
                  F.lit("lang"))
            .when(dt == "", F.lit("str"))
            .when(dt.isin(*[_XSD + n for n in _NUM_DT_SET]) & num_ok,
                  F.lit("num"))
            .when((dt == _XSD + "boolean") & bool_ok, F.lit("bool"))
            .when((dt == _XSD + "dateTime") & ts_ok, F.lit("dtime"))
            .when(dt == _XSD + "date", F.lit("date"))
            .otherwise(F.lit("unknown")))


def _ts_value(lex: "F.Column") -> "F.Column":
    """Timestamp value of a dateTime lexical; handles the XML-Schema
    end-of-day form T24:00:00 (= midnight of the NEXT day)."""
    t24 = F.to_date(F.substring(lex, 1, 10)).try_cast("timestamp") \
        + F.expr("INTERVAL 1 DAY")
    return F.when(lex.contains("T24:00:00"), t24) \
        .otherwise(lex.try_cast("timestamp"))


def _date_eq(lex_a: "F.Column", lex_b: "F.Column") -> "F.Column":
    """xsd:date equality: different date parts are distinct (>14h
    apart); equal date parts compare timezones (Z ≡ +00:00 ≡ -00:00),
    and zoned vs unzoned same-day is INDETERMINATE (error → NULL)."""
    def tz(lex):
        raw = F.substring(lex, 11, 10)
        return F.when(raw.isin("Z", "+00:00", "-00:00"), F.lit("Z")) \
            .otherwise(raw)
    da, db = F.substring(lex_a, 1, 10), F.substring(lex_b, 1, 10)
    return (F.when(da != db, F.lit(False))
            .when(tz(lex_a) == tz(lex_b), F.lit(True)))


def _value_eq_column(a: "F.Column", b: "F.Column") -> "F.Column":
    """SPARQL '=' over canonical terms, VALUE space, three-valued:
    TRUE / FALSE / NULL(type error — the row drops under = AND !=,
    negation does not resurrect an error). Identical terms are always
    equal; numerics/booleans/dateTimes compare by value; two known
    values of the same class with different canonical forms differ;
    anything involving an unknown datatype (beyond term identity) or a
    cross-class literal comparison is an error (open-world: "a"^^t:x
    cannot be proven distinct from "b"^^t:x — W3C open-eq)."""
    ca, cb = _dt_class(a), _dt_class(b)
    lex_a = F.regexp_extract(a, _LEX_RE, 1)
    lex_b = F.regexp_extract(b, _LEX_RE, 1)
    num_a, num_b = lex_a.try_cast("double"), lex_b.try_cast("double")
    bool_a = lex_a.isin("true", "1")
    bool_b = lex_b.isin("true", "1")
    ts_a, ts_b = _ts_value(lex_a), _ts_value(lex_b)
    return (F.when(a == b, F.lit(True))
            .when((ca == "term") | (cb == "term"), F.lit(False))
            # a lang-tagged literal equals only the identical term —
            # any other literal (tagged differently, typed, plain) is
            # KNOWN unequal (the tag is part of the value)
            .when((ca == "lang") | (cb == "lang"), F.lit(False))
            .when((ca == "num") & (cb == "num"), num_a == num_b)
            .when((ca == "bool") & (cb == "bool"), bool_a == bool_b)
            .when((ca == "dtime") & (cb == "dtime"), ts_a == ts_b)
            .when((ca == "date") & (cb == "date"),
                  _date_eq(lex_a, lex_b))
            .when((ca != "unknown") & (cb != "unknown"), F.lit(False)))


def _ts_sql(lex: str) -> str:
    return (f"CASE WHEN {lex} LIKE '%T24:00:00%' THEN "
            f"TRY_CAST(substr({lex}, 1, 10) AS TIMESTAMP) "
            f"+ INTERVAL 1 DAY "
            f"ELSE TRY_CAST({lex} AS TIMESTAMPTZ)::TIMESTAMP END")


def _date_eq_sql(a: str, b: str) -> str:
    def tz(x):
        return (f"CASE WHEN substr({x}, 11, 10) IN "
                f"('Z', '+00:00', '-00:00') THEN 'Z' "
                f"ELSE substr({x}, 11, 10) END")
    return (f"CASE WHEN substr({a}, 1, 10) <> substr({b}, 1, 10) "
            f"THEN FALSE WHEN {tz(a)} = {tz(b)} THEN TRUE "
            f"ELSE NULL END")


def _value_eq_sql(a: str, b: str) -> str:
    dts = ", ".join(f"'{_XSD}{n}'" for n in _NUM_DT_SET)

    def cls(x):
        lx = f"regexp_extract({x}, '{_LEX_RE}', 1)"
        return (f"CASE WHEN NOT {x} LIKE '\"%' THEN 'term' "
                f"WHEN regexp_extract({x}, '{_LANG_RE}', 1) <> '' "
                f"THEN 'lang' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) = '' THEN 'str' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) IN ({dts}) "
                f"AND TRY_CAST({lx} AS DOUBLE) IS NOT NULL THEN 'num' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) = "
                f"'{_XSD}boolean' AND {lx} IN ('true','false','1','0') "
                f"THEN 'bool' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) = "
                f"'{_XSD}dateTime' AND {_ts_sql(lx)} IS NOT NULL "
                f"THEN 'dtime' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) = "
                f"'{_XSD}date' THEN 'date' ELSE 'unknown' END")

    def lex(x):
        return f"regexp_extract({x}, '{_LEX_RE}', 1)"

    ca, cb = cls(a), cls(b)
    return (f"CASE WHEN {a} = {b} THEN TRUE "
            f"WHEN {ca} = 'term' OR {cb} = 'term' THEN FALSE "
            f"WHEN {ca} = 'lang' OR {cb} = 'lang' THEN FALSE "
            f"WHEN {ca} = 'num' AND {cb} = 'num' THEN "
            f"TRY_CAST({lex(a)} AS DOUBLE) = TRY_CAST({lex(b)} AS DOUBLE) "
            f"WHEN {ca} = 'bool' AND {cb} = 'bool' THEN "
            f"({lex(a)} IN ('true','1')) = ({lex(b)} IN ('true','1')) "
            f"WHEN {ca} = 'dtime' AND {cb} = 'dtime' THEN "
            f"{_ts_sql(lex(a))} = {_ts_sql(lex(b))} "
            f"WHEN {ca} = 'date' AND {cb} = 'date' THEN "
            f"{_date_eq_sql(lex(a), lex(b))} "
            f"WHEN {ca} <> 'unknown' AND {cb} <> 'unknown' "
            f"THEN FALSE "
            f"ELSE NULL END")


_CMP_FN = {"<": "__lt__", "<=": "__le__", ">": "__gt__",
           ">=": "__ge__"}


def _value_cmp_column(a: "F.Column", b: "F.Column",
                      op: str) -> "F.Column":
    """SPARQL ordering comparison (< <= > >=) in the VALUE space:
    defined within a class (numeric by value, dateTime by instant,
    date by ISO date part); everything else is a type error (NULL →
    the row drops)."""
    ca, cb = _dt_class(a), _dt_class(b)
    lex_a = F.regexp_extract(a, _LEX_RE, 1)
    lex_b = F.regexp_extract(b, _LEX_RE, 1)
    fn = _CMP_FN[op]

    def cmp(x, y):
        return getattr(x, fn)(y)

    return (F.when((ca == "num") & (cb == "num"),
                   cmp(lex_a.try_cast("double"), lex_b.try_cast("double")))
            .when((ca == "dtime") & (cb == "dtime"),
                  cmp(_ts_value(lex_a), _ts_value(lex_b)))
            .when((ca == "date") & (cb == "date"),
                  cmp(F.substring(lex_a, 1, 10),
                      F.substring(lex_b, 1, 10))))


def _value_cmp_sql(a: str, b: str, op: str) -> str:
    def lex(x):
        return f"regexp_extract({x}, '{_LEX_RE}', 1)"
    dts = ", ".join(f"'{_XSD}{n}'" for n in _NUM_DT_SET)

    def cls(x):
        lx = lex(x)
        return (f"CASE WHEN NOT {x} LIKE '\"%' THEN 'term' "
                f"WHEN regexp_extract({x}, '{_LANG_RE}', 1) <> '' "
                f"THEN 'lang' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) = '' THEN 'str' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) IN ({dts}) "
                f"AND TRY_CAST({lx} AS DOUBLE) IS NOT NULL THEN 'num' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) = "
                f"'{_XSD}dateTime' THEN 'dtime' "
                f"WHEN regexp_extract({x}, '{_DT_RE}', 1) = "
                f"'{_XSD}date' THEN 'date' ELSE 'unknown' END")
    ca, cb = cls(a), cls(b)
    return (f"CASE WHEN {ca} = 'num' AND {cb} = 'num' THEN "
            f"TRY_CAST({lex(a)} AS DOUBLE) {op} "
            f"TRY_CAST({lex(b)} AS DOUBLE) "
            f"WHEN {ca} = 'dtime' AND {cb} = 'dtime' THEN "
            f"{_ts_sql(lex(a))} {op} {_ts_sql(lex(b))} "
            f"WHEN {ca} = 'date' AND {cb} = 'date' THEN "
            f"substr({lex(a)}, 1, 10) {op} substr({lex(b)}, 1, 10) "
            f"ELSE NULL END")


def _filter_column(var: str, op: str, value) -> "F.Column":
    """One FILTER condition as a Spark Column. int value → numeric
    compare on the integer extracted from the canonical
    ``"n"^^xsd:integer`` literal (non-integer terms extract to null and
    drop, as SPARQL type errors do); str value → canonical-term compare;
    bound/!bound → null tests for OPTIONAL bindings; the built-in ops
    (lang/dt/str*/contains/in) evaluate on the canonical term string —
    LANG of an untagged term and DATATYPE of a plain literal extract to
    '' (compare-false), and STR* operate on the escaped lexical form."""
    if op not in _FILTER_OPS:
        raise ValueError(f"unsupported FILTER op {op!r} (have {_FILTER_OPS})")
    if op == "||":
        # value = list of &&-branches, each a list of atomic conditions
        import functools
        import operator as _op
        branches = []
        for branch in value:
            cs = [_filter_column(v2[1:] if _is_var(v2) else v2, o2, val2)
                  for v2, o2, val2 in branch]
            branches.append(functools.reduce(_op.and_, cs))
        return functools.reduce(_op.or_, branches)
    if op == "ebvconst":
        return F.lit(bool(value))
    col = F.col(var)
    if op in ("ebv", "!ebv"):
        # §17.2.2: boolean → value, numeric → != 0, string → non-empty,
        # anything else → type error (row drops under both polarities)
        cls_ = _dt_class(col)
        lex = F.regexp_extract(col, _LEX_RE, 1)
        ebv = (F.when(cls_ == "bool", lex.isin("true", "1"))
               .when(cls_ == "num", lex.try_cast("double") != 0)
               .when(cls_ == "str", lex != ""))
        return ~ebv if op == "!ebv" else ebv
    if op == "bound":
        return col.isNotNull()
    if op == "!bound":
        return col.isNull()
    if op == "in":
        if not isinstance(value, (list, tuple)) or not value:
            raise ValueError("IN/VALUES needs a non-empty list of terms")
        return col.isin(list(value))
    if op in ("var=", "var!="):
        eq = _value_eq_column(col, F.col(value))
        return eq if op == "var=" else ~eq
    if op in ("svar=", "svar!="):
        other = F.col(value)
        return col == other if op == "svar=" else col != other
    if op in ("same=", "same!="):
        # sameTerm: strict term identity on the canonical string (no
        # bare-string leniency)
        return col == value if op == "same=" else col != value
    if op in ("regex", "!regex"):
        pat, coerced = value
        got = _unescape_column(_str_column(col))
        inner = got.rlike(pat)
        if coerced:
            # REGEX(STR(?x), …): explicit coercion — IRIs allowed
            guard = ~col.startswith("_:")
        else:
            guard = col.startswith('"')
        return guard & ~inner if op.startswith("!") else guard & inner
    if op in ("str=", "str!="):
        got = _str_column(col)
        # STR of a bnode is a type error (row drops either way)
        cond = got == value if op == "str=" else got != value
        return ~col.startswith("_:") & cond
    if op in ("isiri", "!isiri", "isliteral", "!isliteral",
              "isblank", "!isblank"):
        cond = {"isiri": col.startswith("<"),
                "isliteral": col.startswith('"'),
                "isblank": col.startswith("_:")}[op.lstrip("!")]
        return ~cond if op.startswith("!") else cond
    if op in ("langmatches", "!langmatches"):
        tag = F.regexp_extract(col, _LANG_RE, 1)
        if value == "*":
            inner = tag != ""
        else:
            inner = (tag == value) | tag.startswith(value + "-")
        # lang() of a non-literal is a TYPE ERROR: the row drops under
        # BOTH polarities (negation does not resurrect an error)
        lit = col.startswith('"')
        return lit & ~inner if op.startswith("!") else lit & inner
    if op in ("lang=", "lang!="):
        # LANG of a non-literal is a type error → the row drops either
        # way (SPARQL §17.3); guard on the literal form
        got = F.regexp_extract(col, _LANG_RE, 1)
        cond = got == value if op == "lang=" else got != value
        return col.startswith('"') & cond
    if op in ("dt=", "dt!="):
        # RDF 1.1 DATATYPE: explicit ^^ type, rdf:langString for
        # tagged, xsd:string for plain; type error on non-literals
        from .sparql import _datatype_column
        want = value if value.startswith("<") else f"<{value}>"
        got = _datatype_column(col)
        cond = got == want if op == "dt=" else got != want
        return col.startswith('"') & cond
    if op in ("strstarts", "!strstarts", "strends", "!strends",
              "contains", "!contains"):
        s = _str_column(col)
        neg = op.startswith("!")
        base = op.lstrip("!")
        cond = {"strstarts": s.startswith(value),
                "strends": s.endswith(value),
                "contains": s.contains(value)}[base]
        return ~cond if neg else cond
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        raise ValueError(f"FILTER value must be int or str, got {value!r}")
    if isinstance(value, int) and op in ("=", "!="):
        # numeric equality is VALUE-space ("01"^^integer = 1,
        # "1.0"^^double = 1 — W3C expr-equals)
        eq = _value_eq_column(
            col, F.lit(f'"{value}"^^<{_XSD}integer>'))
        return eq if op == "=" else ~eq
    if isinstance(value, str) and value.startswith('"') \
            and not _is_plain_literal(value) and op in ("=", "!="):
        # typed-literal constant: value-space compare
        eq = _value_eq_column(col, F.lit(value))
        return eq if op == "=" else ~eq
    if isinstance(value, str) and value.startswith('"') \
            and "^^" in value and op in ("<", "<=", ">", ">="):
        # typed-literal constant ordering: value space, same class only
        return _value_cmp_column(col, F.lit(value), op)
    if isinstance(value, int):
        # ordering: try_cast — regexp_extract yields '' on non-integer
        # terms, which must become NULL (SPARQL type error → row
        # drops), not an ANSI cast failure
        col = F.regexp_extract(col, _INT_LIT_RE, 1).try_cast("long")
        value = F.lit(value)
    elif _is_plain_literal(value) and op in ("=", "!="):
        # a plain "string" literal also matches BIND/LANG/STR-derived
        # BARE strings (canonical term columns are never bare, so this
        # cannot create false positives)
        bare = value[1:-1]
        if op == "=":
            return (col == value) | (col == bare)
        return (col != value) & (col != bare)
    return {"=": col == value, "!=": col != value, "<": col < value,
            "<=": col <= value, ">": col > value, ">=": col >= value}[op]


def _order_patterns(patterns: Sequence[Tuple[str, str, str]]) -> list:
    """Greedy selectivity ordering of the required block: start from the
    pattern with the most constants, then repeatedly take the most
    constant pattern CONNECTED (shares a variable) to what's already
    joined. Inner joins commute, so this changes only the join order —
    never the result — but without CBO statistics Catalyst keeps the
    written order, and joining the most selective pattern first is the
    difference between an early small intermediate and carrying the
    biggest pattern's rows through every join at 100 TB. Disconnected
    leftovers keep their relative order (the cartesian check still
    applies)."""
    remaining = [(i, p) for i, p in enumerate(patterns)]
    if len(remaining) < 3:      # nothing to reorder
        return list(patterns)

    def sel(p):
        return sum(0 if _is_var(t) else 1 for t in p)

    def vars_of(p):
        return {t[1:] for t in p if _is_var(t)}

    ordered: list = []
    bound: set = set()
    while remaining:
        pool = [(i, p) for i, p in remaining
                if not ordered or (vars_of(p) & bound)]
        if not pool:
            pool = remaining    # disconnected — defer to the join check
        # most constants wins; original position breaks ties (stable)
        i, p = max(pool, key=lambda ip: (sel(ip[1]), -ip[0]))
        ordered.append(p)
        bound |= vars_of(p)
        remaining.remove((i, p))
    return ordered


def bgp_match(triples: DataFrame, patterns: Sequence[Tuple[str, str, str]],
              optionals: Sequence[Tuple[str, str, str]] = (),
              filters: Sequence[Tuple[str, str, object]] = (),
              minus: Sequence[Tuple[str, str, str]] = (),
              exists: Sequence[Sequence[Tuple[str, str, str]]] = (),
              not_exists: Sequence[Sequence[Tuple[str, str, str]]] = (),
              binds: Sequence[Tuple[str, str, str]] = (),
              graph: str = None,
              allow_cross: bool = False) -> DataFrame:
    """Match a conjunction of triple patterns; returns one column per
    distinct variable, one row per binding (bag semantics — add
    .distinct() for set semantics; the driver query aggregates anyway).

    ``optionals``: SPARQL-OPTIONAL-style patterns, each LEFT-joined on
    its shared variables after the required block — unmatched rows keep
    null for the optional variables.

    ``filters``: FILTER conditions as (var, op, value) applied after the
    joins (see _filter_column); ``bound``/``!bound`` take value None.

    ``minus``: SPARQL-MINUS block — solutions are removed when the minus
    block matches with the same bindings on the variables the two blocks
    share (a left-anti join, the scalable negation shape). Like SPARQL,
    a minus block sharing NO variable removes nothing — rejected here as
    a mistake unless the block is empty.

    ``binds``: BIND-style derived columns, each (alias, func, arg) —
    func "LANG"/"DATATYPE"/"STR" extracts from the bound variable
    ``arg``; func None binds the constant term ``arg`` (the standard
    UNION-provenance tag). Applied after the joins, before filters, so
    filters and projection can reference the alias.

    ``exists`` / ``not_exists``: FILTER [NOT] EXISTS blocks (each a
    pattern list). With shared variables these are correlated semi/anti
    joins — same plan family as minus; with NO shared variable SPARQL's
    semantics differ from MINUS: the block's mere matchability gates
    EVERY solution, implemented as a broadcast 1-row existence flag
    (never a data-scale cross join).

    ``graph``: SPARQL-GRAPH-style quad matching — every pattern
    (required, optional, and the minus block) additionally matches the
    quads table's ``graph`` column against this term (``?g`` binds the
    graph as a variable, joining all patterns on the SAME graph; a
    constant restricts to one named graph)."""
    if not patterns:
        raise ValueError("empty BGP")
    if graph is not None and "graph" not in triples.columns:
        raise ValueError("GRAPH pattern needs a quads table with a "
                         "'graph' column")
    cols = (("graph",) + _POSITIONS) if graph is not None else _POSITIONS
    if graph is None and "graph" in triples.columns:
        # SPARQL dataset semantics: patterns OUTSIDE a GRAPH block match
        # the DEFAULT graph only (graph NULL) — named-graph quads are
        # invisible to them (W3C sparql10/graph suite)
        base = triples.filter(F.col("graph").isNull()).select(*cols)
    else:
        base = triples.select(*cols)
    if graph is not None:
        # GRAPH matches named graphs only — default-graph quads
        # (graph NULL) are invisible inside a GRAPH block, per SPARQL
        base = base.filter(F.col("graph").isNotNull())
    result: DataFrame = None
    bound: List[str] = []
    # zero-length path patterns join LAST (and among themselves in
    # dependency order) so their identity component can be restricted to
    # the endpoint values the partial result already binds
    plain = [p for p in patterns if not _is_zero_length_pat(p)]
    zl_pending = [p for p in patterns if _is_zero_length_pat(p)]
    if graph is not None and (
            zl_pending or any(_is_zero_length_pat(p) for p in optionals)):
        raise ValueError(
            "property paths inside GRAPH are not supported (a path "
            "hop crossing graphs has no single ?g binding)")

    def join_rel(df, varset, idx):
        nonlocal result, bound
        if result is None:
            result, bound = df, list(varset)
            return
        on = [v for v in varset if v in bound]
        if not on and not allow_cross:
            raise ValueError(
                f"pattern {idx} shares no variable with previous patterns "
                f"(cartesian); pass allow_cross=True if intended")
        result = result.join(df, on=on) if on else result.crossJoin(df)
        bound += [v for v in varset if v not in bound]

    def join_zl(pat, idx):
        rel = _zl_pattern_rel(base, pat, result, bound)
        df, varset = _bind_positions(rel, (pat[0], pat[2]),
                                     ("src", "dst"))
        join_rel(df, varset, idx)

    def zl_ready(pat):
        return (not _is_var(pat[0]) or not _is_var(pat[2])
                or pat[0][1:] in bound or pat[2][1:] in bound)

    plain_q = list(_order_patterns(plain))
    idx = 0
    while plain_q or zl_pending:
        # connected plain pattern first (keeps the greedy selectivity
        # order), then any zero-length pattern whose endpoint is now
        # restricted (it may be the bridge between plain components),
        # then the disconnected fallbacks with their original errors
        pick = next(
            (p for p in plain_q if result is None
             or {t[1:] for t in p if _is_var(t)} & set(bound)), None)
        if pick is not None:
            df, varset = _compile_pattern(base, pick, graph=graph)
            join_rel(df, varset, idx)
            plain_q.remove(pick)
        elif (zpick := next((p for p in zl_pending if zl_ready(p)),
                            None)) is not None:
            join_zl(zpick, idx)
            zl_pending.remove(zpick)
        elif plain_q:
            df, varset = _compile_pattern(base, plain_q[0], graph=graph)
            join_rel(df, varset, idx)   # cartesian check raises here
            plain_q.pop(0)
        else:
            join_zl(zl_pending[0], idx)  # raises the unrestricted error
            zl_pending.pop(0)
        idx += 1
    for idx, pat in enumerate(optionals):
        if _is_zero_length_pat(pat):
            rel = _zl_pattern_rel(base, pat, result, bound)
            df, varset = _bind_positions(rel, (pat[0], pat[2]),
                                         ("src", "dst"))
        else:
            df, varset = _compile_pattern(base, pat, graph=graph)
        on = [v for v in varset if v in bound]
        if not on:
            raise ValueError(
                f"optional pattern {idx} shares no variable with the "
                f"required block")
        result = result.join(df, on=on, how="left")
        bound += [v for v in varset if v not in bound]
    for alias, fn, arg in binds:
        if alias in bound:
            raise ValueError(f"BIND alias ?{alias} is already bound")
        if fn is None:
            col = F.lit(arg)
        else:
            if arg not in bound:
                raise ValueError(
                    f"BIND references unbound variable ?{arg}")
            from .sparql import _datatype_column
            src = F.col(arg)
            col = {"LANG": F.when(src.startswith('"'),
                                  F.regexp_extract(src, _LANG_RE, 1)),
                   "DATATYPE": _datatype_column(src),
                   "STR": _str_column(src)}[fn]
        result = result.withColumn(alias, col)
        bound.append(alias)
    for var, op, value in filters:
        if op == "||":
            for branch in value:
                for v2, _o2, _v2 in branch:
                    if _o2 == "ebvconst":
                        continue
                    nm = v2[1:] if _is_var(v2) else v2
                    if nm not in bound:
                        raise ValueError(
                            f"FILTER references unbound variable ?{nm}")
            result = result.filter(_filter_column(var, op, value))
            continue
        if op == "ebvconst":
            result = result.filter(_filter_column("", op, value))
            continue
        name = var[1:] if _is_var(var) else var
        if name not in bound:
            raise ValueError(f"FILTER references unbound variable ?{name}")
        if op in ("var=", "var!=") and value not in bound:
            raise ValueError(
                f"FILTER references unbound variable ?{value}")
        result = result.filter(_filter_column(name, op, value))
    if minus:
        mdf = bgp_match(triples, minus, graph=graph,
                        allow_cross=allow_cross)
        shared = [v for v in mdf.columns if v in bound]
        if not shared:
            raise ValueError(
                "MINUS block shares no variable with the main block — "
                "SPARQL semantics would remove nothing")
        result = result.join(mdf.select(*shared).distinct(),
                             on=shared, how="left_anti")
    for blocks, negate in ((exists, False), (not_exists, True)):
        for pats in blocks:
            edf = bgp_match(triples, pats, graph=graph,
                            allow_cross=allow_cross)
            shared = [v for v in edf.columns if v in bound]
            if shared:
                how = "left_anti" if negate else "left_semi"
                result = result.join(edf.select(*shared).distinct(),
                                     on=shared, how=how)
            else:
                # uncorrelated existence: one broadcast flag row gates
                # all solutions (matches SPARQL, unlike MINUS)
                flag = F.broadcast(
                    edf.limit(1).select(F.lit(1).alias("_exists")))
                result = result.join(flag, how="left")
                cond = (F.col("_exists").isNull() if negate
                        else F.col("_exists").isNotNull())
                result = result.filter(cond).drop("_exists")
    return result


def bgp_union(triples: DataFrame,
              blocks: Sequence[dict]) -> DataFrame:
    """SPARQL UNION: each block is a dict of bgp_match kwargs
    ({"patterns": ..., "optionals": ..., "filters": ..., "minus": ...});
    results align on the union of all blocks' variables (first-appearance
    order) with nulls for variables a block does not bind — exactly
    SPARQL's union of solution mappings with disjoint domains allowed."""
    if not blocks:
        raise ValueError("empty UNION")
    return align_union([bgp_match(triples, **blk) for blk in blocks])


def align_union(parts: Sequence[DataFrame]) -> DataFrame:
    """Union solution DataFrames on the union of their columns
    (first-appearance order), NULL-padding the ones a part lacks —
    SPARQL's union of solution mappings with disjoint domains."""
    all_vars: List[str] = []
    for p in parts:
        for c in p.columns:
            if c not in all_vars:
                all_vars.append(c)
    aligned = [
        p.select(*[F.col(c) if c in p.columns
                   else F.lit(None).cast("string").alias(c)
                   for c in all_vars])
        for p in parts
    ]
    out = aligned[0]
    for p in aligned[1:]:
        out = out.unionByName(p)
    return out


def _sql_str(s) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def _str_sql(name: str) -> str:
    """SQL twin of _str_column: STR() over a canonical term string."""
    return (f"CASE WHEN starts_with({name}, '<') "
            f"THEN regexp_extract({name}, '{_IRI_RE}', 1) "
            f"ELSE regexp_extract({name}, '{_LEX_RE}', 1) END")


_C14N_UNESCAPES = [("\\n", "\n"), ("\\t", "\t"), ("\\r", "\r"),
                   ("\\b", "\b"), ("\\f", "\f"), ('\\"', '"')]


def _unescape_column(c: "F.Column") -> "F.Column":
    """Real string VALUE from a c14n-escaped lexical form (the regex
    path needs actual newlines/tabs, not backslash sequences). '\\\\'
    is protected first so escaped backslashes survive; rare \\uXXXX
    escapes are left as-is."""
    c = F.replace(c, F.lit("\\\\"), F.lit("\x00"))
    for esc, real in _C14N_UNESCAPES:
        c = F.replace(c, F.lit(esc), F.lit(real))
    return F.replace(c, F.lit("\x00"), F.lit("\\"))


def _unescape_sql(expr: str) -> str:
    out = f"replace({expr}, '\\\\', chr(0))"
    pairs = [("\\n", "chr(10)"), ("\\t", "chr(9)"),
             ("\\r", "chr(13)"), ("\\b", "chr(8)"),
             ("\\f", "chr(12)"), ('\\"', "'\"'")]
    for esc, real in pairs:
        e = esc.replace("'", "''")
        out = f"replace({out}, '{e}', {real})"
    return f"replace({out}, chr(0), '\\')"


def _filter_sql(var: str, op: str, value) -> str:
    if op == "||":
        parts = [
            "(" + " AND ".join(_filter_sql(v2, o2, val2)
                               for v2, o2, val2 in branch) + ")"
            for branch in value]
        return "(" + " OR ".join(parts) + ")"
    if op == "ebvconst":
        return "TRUE" if value else "FALSE"
    name = var[1:] if _is_var(var) else var
    if op in ("ebv", "!ebv"):
        dts = ", ".join(f"'{_XSD}{n}'" for n in _NUM_DT_SET)
        lex = f"regexp_extract({name}, '{_LEX_RE}', 1)"
        dt = f"regexp_extract({name}, '{_DT_RE}', 1)"
        lang = f"regexp_extract({name}, '{_LANG_RE}', 1)"
        ebv = (f"CASE WHEN NOT {name} LIKE '\"%' THEN NULL "
               f"WHEN {dt} = '{_XSD}boolean' THEN "
               f"{lex} IN ('true', '1') "
               f"WHEN {dt} IN ({dts}) THEN "
               f"TRY_CAST({lex} AS DOUBLE) <> 0 "
               f"WHEN {dt} = '' AND {lang} = '' THEN {lex} <> '' "
               f"ELSE NULL END")
        return f"(NOT ({ebv}))" if op == "!ebv" else f"({ebv})"
    if op == "bound":
        return f"{name} IS NOT NULL"
    if op == "!bound":
        return f"{name} IS NULL"
    if op == "in":
        return f"{name} IN ({', '.join(_sql_str(v) for v in value)})"
    if op in ("var=", "var!="):
        eq = _value_eq_sql(name, value)
        return f"({eq})" if op == "var=" else f"(NOT ({eq}))"
    if op in ("svar=", "svar!="):
        return f"{name} {'=' if op == 'svar=' else '<>'} {value}"
    if op in ("same=", "same!="):
        return (f"{name} {'=' if op == 'same=' else '<>'} "
                f"{_sql_str(value)}")
    if op in ("regex", "!regex"):
        pat, coerced = value
        got = _unescape_sql(_str_sql(name))
        inner = f"regexp_matches({got}, {_sql_str(pat)})"
        guard = (f"NOT {name} LIKE '_:%'" if coerced
                 else f"{name} LIKE '\"%'")
        neg = "NOT " if op.startswith("!") else ""
        return f"({guard} AND {neg}{inner})"
    if op in ("str=", "str!="):
        got = _str_sql(name)
        return (f"(NOT {name} LIKE '_:%' AND {got} "
                f"{'=' if op == 'str=' else '<>'} {_sql_str(value)})")
    if op in ("isiri", "!isiri", "isliteral", "!isliteral",
              "isblank", "!isblank"):
        like = {"isiri": "<%", "isliteral": '\"%',
                "isblank": "_:%"}[op.lstrip("!")]
        cond = f"{name} LIKE '{like}'"
        return f"NOT ({cond})" if op.startswith("!") else cond
    if op in ("langmatches", "!langmatches"):
        tag = f"regexp_extract({name}, '{_LANG_RE}', 1)"
        if value == "*":
            inner = f"{tag} <> ''"
        else:
            inner = (f"({tag} = {_sql_str(value)} OR {tag} LIKE "
                     f"{_sql_str(value + '-%')})")
        if op.startswith("!"):
            return f"({name} LIKE '\"%' AND NOT {inner})"
        return f"({name} LIKE '\"%' AND {inner})"
    if op in ("lang=", "lang!="):
        got = f"regexp_extract({name}, '{_LANG_RE}', 1)"
        cmp_ = f"{got} {'=' if op == 'lang=' else '<>'} {_sql_str(value)}"
        return f"({name} LIKE '\"%' AND {cmp_})"
    if op in ("dt=", "dt!="):
        from .sparql import _datatype_sql
        want = value if value.startswith("<") else f"<{value}>"
        cmp_ = (f"{_datatype_sql(name)} "
                f"{'=' if op == 'dt=' else '<>'} {_sql_str(want)}")
        return f"({name} LIKE '\"%' AND {cmp_})"
    if op in ("strstarts", "!strstarts", "strends", "!strends",
              "contains", "!contains"):
        s = _str_sql(name)
        fn = {"strstarts": "starts_with", "strends": "ends_with",
              "contains": "contains"}[op.lstrip("!")]
        cond = f"{fn}({s}, {_sql_str(value)})"
        return f"NOT {cond}" if op.startswith("!") else cond
    if isinstance(value, int) and not isinstance(value, bool) \
            and op in ("=", "!="):
        eq = _value_eq_sql(name, _sql_str(f'"{value}"^^<{_XSD}integer>'))
        return f"({eq})" if op == "=" else f"(NOT ({eq}))"
    if isinstance(value, str) and value.startswith('"') \
            and not _is_plain_literal(value) and op in ("=", "!="):
        eq = _value_eq_sql(name, _sql_str(value))
        return f"({eq})" if op == "=" else f"(NOT ({eq}))"
    if isinstance(value, str) and value.startswith('"') \
            and "^^" in value and op in ("<", "<=", ">", ">="):
        return f"({_value_cmp_sql(name, _sql_str(value), op)})"
    if isinstance(value, int) and not isinstance(value, bool):
        lhs = (f"TRY_CAST(regexp_extract({name}, '{_INT_LIT_RE}', 1) "
               f"AS BIGINT)")
        return f"{lhs} {'<>' if op == '!=' else op} {value}"
    if _is_plain_literal(value) and op in ("=", "!="):
        canon, bare = _sql_str(value), _sql_str(value[1:-1])
        if op == "=":
            return f"({name} = {canon} OR {name} = {bare})"
        return f"({name} <> {canon} AND {name} <> {bare})"
    return f"{name} {'<>' if op == '!=' else op} {_sql_str(value)}"


def _bgp_sql_body(patterns, base_name, optionals=(), filters=(),
                  minus=(), exists=(), not_exists=(), binds=(),
                  graph=None,
                  base_has_graph: bool = False) -> Tuple[str, List[str]]:
    """SELECT body for a BGP block over an existing ``base_name`` CTE;
    returns (sql, bound variable names). ``base_has_graph``: the base
    relation carries a ``graph`` column, so patterns OUTSIDE a GRAPH
    block must restrict to the default graph (graph IS NULL) — the twin
    of bgp_match's dataset semantics."""
    eff_base = (f"(SELECT * FROM {base_name} bdg WHERE bdg.graph IS NULL)"
                if base_has_graph and graph is None else base_name)
    selects: List[str] = []
    joins: List[str] = []
    where: List[str] = []
    seen: Dict[str, str] = {}

    def compile_one(i: int, pat, optional: bool):
        alias = f"t{i}"
        s, p, o = pat
        if _is_path_pred(p):
            if graph is not None:
                raise ValueError(
                    "property paths inside GRAPH are not supported")
            from .paths import (
                _compile_sql, _identity_sql, parse_path, split_zero_length,
            )
            # cardinality mirrors path_pairs (§18.4): bag semantics
            # for seq/alt/inv/{n,m}, set semantics only when a
            # zero-length identity joins in (UNION dedups; the R side
            # is closure/("distinct",…)-wrapped by split_zero_length)
            r_ast, has_id = split_zero_length(parse_path(p))
            parts = []
            if r_ast is not None:
                parts.append(f"SELECT src, dst FROM "
                             f"{_compile_sql(r_ast, eff_base)} pr{i}")
            if has_id:
                # identity component: a constant endpoint relates to
                # itself unconditionally; otherwise the node universe
                # (value-equivalent post-join to the engine's restricted
                # identity — the join re-restricts to graph terms)
                const = next(
                    (t for t in (s, o) if not _is_var(t)), None)
                if const is not None:
                    c = const.replace("'", "''")
                    ident = f"(SELECT '{c}' AS src, '{c}' AS dst)"
                else:
                    ident = _identity_sql(eff_base)
                parts.append(f"SELECT src, dst FROM {ident} pi{i}")
                rel = ("(SELECT src, dst FROM ("
                       + " UNION ".join(parts) + f") pu{i})")
            else:
                rel = (f"(SELECT src, dst FROM "
                       f"{_compile_sql(r_ast, eff_base)} pr{i})")
            terms = [("src", s), ("dst", o)]
        else:
            rel = eff_base
            terms = list(zip(_POSITIONS, pat))
            if graph is not None:
                terms.insert(0, ("graph", graph))
        conds = []
        for pos, term in terms:
            col = f"{alias}.{pos}"
            if _is_var(term):
                var = term[1:]
                if var in seen:
                    conds.append(f"{col} = {seen[var]}")
                else:
                    seen[var] = col
                    selects.append(f"{col} AS {var}")
            else:
                conds.append(f"{col} = '" + term.replace("'", "''") + "'")
        if graph is not None and _is_var(graph) and not _is_path_pred(p):
            # named graphs only (the constant case is non-null by the
            # equality itself)
            conds.append(f"{alias}.graph IS NOT NULL")
        if i == 0:
            joins.append(f"{rel} {alias}")
            where.extend(conds)
        elif conds:
            kw = "LEFT JOIN" if optional else "JOIN"
            joins.append(f"{kw} {rel} {alias} ON " + " AND ".join(conds))
        else:
            joins.append(f"CROSS JOIN {rel} {alias}")

    for i, pat in enumerate(patterns):
        compile_one(i, pat, optional=False)
    for j, pat in enumerate(optionals):
        compile_one(len(patterns) + j, pat, optional=True)
    sql = f"SELECT {', '.join(selects)}\nFROM " + "\n".join(joins)
    if where:
        sql += "\nWHERE " + " AND ".join(where)
    bound = list(seen.keys())

    if binds:
        extra = []
        for alias, fn, arg in binds:
            if fn is None:
                extra.append(f"{_sql_str(arg)} AS {alias}")
            elif fn == "LANG":
                extra.append(
                    f"CASE WHEN {arg} LIKE '\"%' THEN "
                    f"regexp_extract({arg}, '{_LANG_RE}', 1) END "
                    f"AS {alias}")
            elif fn == "DATATYPE":
                from .sparql import _datatype_sql
                extra.append(f"{_datatype_sql(arg)} AS {alias}")
            else:
                extra.append(f"{_str_sql(arg)} AS {alias}")
            bound.append(alias)
        sql = (f"SELECT bq.*, {', '.join(extra)} FROM (\n{sql}\n) bq")

    outer_conds = [_filter_sql(v, op, val) for v, op, val in filters]
    if minus:
        msql, mvars = _bgp_sql_body(minus, base_name, graph=graph,
                                    base_has_graph=base_has_graph)
        shared = [v for v in mvars if v in bound]
        on = " AND ".join(f"mm.{v} = q.{v}" for v in shared)
        outer_conds.append(
            f"NOT EXISTS (SELECT 1 FROM ({msql}) mm WHERE {on})")
    for blocks, kw in ((exists, "EXISTS"), (not_exists, "NOT EXISTS")):
        for bi, pats in enumerate(blocks):
            esql, evars = _bgp_sql_body(pats, base_name, graph=graph,
                                        base_has_graph=base_has_graph)
            shared = [v for v in evars if v in bound]
            on = (" WHERE " + " AND ".join(
                f"ee.{v} = q.{v}" for v in shared)) if shared else ""
            outer_conds.append(
                f"{kw} (SELECT 1 FROM ({esql}) ee{on})")
    if outer_conds:
        sql = (f"SELECT * FROM (\n{sql}\n) q\nWHERE "
               + " AND ".join(outer_conds))
    return sql, bound


def bgp_sql(patterns: Sequence[Tuple[str, str, str]],
            base_cte: str, base_name: str = "base",
            optionals: Sequence[Tuple[str, str, str]] = (),
            filters: Sequence[Tuple[str, str, object]] = (),
            minus: Sequence[Tuple[str, str, str]] = (),
            exists: Sequence[Sequence[Tuple[str, str, str]]] = (),
            not_exists: Sequence[Sequence[Tuple[str, str, str]]] = (),
            binds: Sequence[Tuple[str, str, str]] = (),
            graph: str = None, base_has_graph: bool = False) -> str:
    """DuckDB twin of ``bgp_match``: the same BGP (with OPTIONAL /
    FILTER / MINUS / path predicates) as self-joins over a triples CTE —
    the oracle for driver BGP queries. Optional patterns become LEFT
    JOINs with their constant conditions in the ON clause; MINUS becomes
    NOT EXISTS on the shared variables; path predicates inline their
    compiled relation (operators/paths.py)."""
    body, _ = _bgp_sql_body(patterns, base_name, optionals=optionals,
                            filters=filters, minus=minus, exists=exists,
                            not_exists=not_exists, binds=binds,
                            graph=graph, base_has_graph=base_has_graph)
    return f"WITH {base_name} AS ({base_cte})\n{body}"


def bgp_union_sql(blocks: Sequence[dict], base_cte: str,
                  base_name: str = "base") -> str:
    """DuckDB twin of ``bgp_union``: per-block bodies aligned on the
    union of all variables (NULL-padded), UNION ALL."""
    bodies = [
        _bgp_sql_body(blk["patterns"], base_name,
                      optionals=blk.get("optionals", ()),
                      filters=blk.get("filters", ()),
                      minus=blk.get("minus", ()),
                      exists=blk.get("exists", ()),
                      not_exists=blk.get("not_exists", ()),
                      binds=blk.get("binds", ()),
                      graph=blk.get("graph"))
        for blk in blocks
    ]
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
    return (f"WITH {base_name} AS ({base_cte})\n"
            + "\nUNION ALL\n".join(parts))
