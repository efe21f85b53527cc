"""SPARQL 1.1 property-path evaluation over the triples table — the
query-layer companion to the BGP matcher (operators/query.py): a path
expression compiles to a tree of DataFrame joins/unions, with ``+``
lowering onto the path-doubling transitive closure
(operators/components.py). The reference is construction-only; paths are
the Spark-side query extension (SURVEY.md §2.4), evaluated relationally
so Catalyst picks join order/strategy and pred filters push into the
scan.

Grammar (subset of SPARQL 1.1 §9.1, recursive descent below)::

    path    := seq ('|' seq)*            alternation (lowest precedence)
    seq     := step ('/' step)*          sequence
    step    := '^' step | primary ('+' | '{' n ',' m '}')*
    primary := '<iri>' | '(' path ')' | '!' '(' <iri> ('|' <iri>)* ')'

``!(<p>|<q>)`` is the negated property set (forward form): every edge
whose predicate is NOT in the set — a pred-NOT-IN filter, scan-level
cheap (no negated-inverse mixing).

Supported operators: ``/`` sequence, ``|`` alternation, ``^`` inverse,
``+`` one-or-more, bounded repetition ``{n,m}`` (1 ≤ n ≤ m ≤ 10 — the
"up to k hops" idiom, expanded to a union of k-fold compositions),
parentheses. ``*`` and ``?`` are deliberately omitted: their
zero-length component relates EVERY term in the graph to itself
(SPARQL 1.1 §18.4 ZeroLengthPath), which is a full node-universe
materialization — at 100 TB that is a table scan per occurrence, and no
driver workload needs it. Rejected with a clear error instead of a
surprising plan; ``{0,m}`` is rejected for the same zero-length reason.

Semantics: ``path_pairs`` returns the DISTINCT (src, dst) node pairs
connected by the path — set semantics, matching SPARQL's definition for
``+`` (ALP is duplicate-free) and giving alternation/sequence a clean
relational meaning both engines state identically. The DuckDB twin
(``path_sql``) compiles the same AST to nested joins / UNION / a bounded
recursive CTE.
"""

from __future__ import annotations

from typing import List, Tuple, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# AST: ("iri", s) | ("inv", p) | ("seq", a, b) | ("alt", a, b)
#      | ("plus", p) | ("rep", p, n, m)
Ast = Tuple

MAX_REP = 10   # {n,m} expansion bound: m-fold join chains beyond this
               # deserve the + closure, not an unrolled plan


def _tokenize(path: str) -> List[str]:
    toks: List[str] = []
    i, n = 0, len(path)
    while i < n:
        c = path[i]
        if c.isspace():
            i += 1
        elif c == "<":
            j = path.find(">", i)
            if j < 0:
                raise ValueError(f"unterminated IRI in path: {path[i:]!r}")
            toks.append(path[i:j + 1])
            i = j + 1
        elif c in "/|^+(){},!":
            toks.append(c)
            i += 1
        elif c.isdigit():
            j = i
            while j < n and path[j].isdigit():
                j += 1
            toks.append(path[i:j])
            i = j
        else:
            raise ValueError(f"unexpected {c!r} in path {path!r} "
                             f"(supported: <iri> / | ^ + parentheses)")
    return toks


class _Parser:
    def __init__(self, toks: List[str], src: str):
        self.toks, self.i, self.src = toks, 0, src

    def peek(self) -> Union[str, None]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError(f"unexpected end of path {self.src!r}")
        self.i += 1
        return t

    def parse(self) -> Ast:
        ast = self.alt()
        if self.peek() is not None:
            raise ValueError(
                f"trailing {self.peek()!r} in path {self.src!r}")
        return ast

    def alt(self) -> Ast:
        node = self.seq()
        while self.peek() == "|":
            self.take()
            node = ("alt", node, self.seq())
        return node

    def seq(self) -> Ast:
        node = self.step()
        while self.peek() == "/":
            self.take()
            node = ("seq", node, self.step())
        return node

    def step(self) -> Ast:
        if self.peek() == "^":
            self.take()
            return ("inv", self.step())
        node = self.primary()
        while self.peek() in ("+", "{"):
            if self.take() == "+":
                node = ("plus", node)
                continue
            lo = self.take()
            if not lo.isdigit():
                raise ValueError(f"{{n,m}} needs integers, got {lo!r}")
            if self.take() != ",":
                raise ValueError("{n,m} needs a comma")
            hi = self.take()
            if not hi.isdigit():
                raise ValueError(f"{{n,m}} needs integers, got {hi!r}")
            if self.take() != "}":
                raise ValueError("missing '}' in {n,m}")
            n_, m_ = int(lo), int(hi)
            if n_ < 1:
                raise ValueError(
                    "{0,m} is not supported: the zero-length component "
                    "relates every graph term to itself")
            if m_ < n_ or m_ > MAX_REP:
                raise ValueError(
                    f"{{n,m}} needs 1 <= n <= m <= {MAX_REP}, got "
                    f"{{{n_},{m_}}} (use + for unbounded)")
            node = ("rep", node, n_, m_)
        return node

    def primary(self) -> Ast:
        t = self.take()
        if t == "!":
            if self.take() != "(":
                raise ValueError("negated property set needs '!(...)'")
            iris = []
            while True:
                it = self.take()
                if not it.startswith("<"):
                    raise ValueError(
                        f"negated property set takes plain IRIs, got "
                        f"{it!r}")
                iris.append(it)
                nxt = self.take()
                if nxt == ")":
                    break
                if nxt != "|":
                    raise ValueError(
                        f"expected '|' or ')' in !(...), got {nxt!r}")
            return ("nps", tuple(iris))
        if t == "(":
            node = self.alt()
            if self.take() != ")":
                raise ValueError(f"missing ')' in path {self.src!r}")
            return node
        if t.startswith("<"):
            return ("iri", t)
        if t in ("*", "?"):
            raise ValueError(
                f"{t!r} is not supported: its zero-length component "
                "relates every graph term to itself — a full "
                "node-universe scan per occurrence at 100 TB")
        raise ValueError(f"unexpected {t!r} in path {self.src!r}")


def parse_path(path: str) -> Ast:
    return _Parser(_tokenize(path), path).parse()


def is_path(pred: str) -> bool:
    """A predicate term that is more than a single bare IRI is a path
    expression (used by bgp_match to route patterns here)."""
    s = pred.strip()
    return not (s.startswith("<") and s.endswith(">")
                and ">" not in s[1:-1])


def _rep_expand(ast: Ast) -> Ast:
    """{n,m} → alternation of k-fold sequences (k in [n, m]) — bounded
    unrolling; Catalyst/DuckDB reuse the inner relation's scan."""
    inner, n_, m_ = ast[1], ast[2], ast[3]

    def k_fold(k: int) -> Ast:
        node = inner
        for _ in range(k - 1):
            node = ("seq", node, inner)
        return node

    out = k_fold(n_)
    for k in range(n_ + 1, m_ + 1):
        out = ("alt", out, k_fold(k))
    return out


def _compile_df(ast: Ast, base: DataFrame) -> DataFrame:
    kind = ast[0]
    if kind == "rep":
        return _compile_df(_rep_expand(ast), base)
    if kind == "iri":
        return (base.filter(F.col("pred") == ast[1])
                .select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst")))
    if kind == "nps":
        return (base.filter(~F.col("pred").isin(list(ast[1])))
                .select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst")))
    if kind == "inv":
        inner = _compile_df(ast[1], base)
        return inner.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"))
    if kind == "seq":
        a = _compile_df(ast[1], base).alias("a")
        b = _compile_df(ast[2], base).alias("b")
        return (a.join(b, F.col("a.dst") == F.col("b.src"))
                .select(F.col("a.src").alias("src"),
                        F.col("b.dst").alias("dst")))
    if kind == "alt":
        return _compile_df(ast[1], base).unionByName(
            _compile_df(ast[2], base))
    if kind == "plus":
        from .components import transitive_closure_pairs
        inner = _compile_df(ast[1], base)
        return transitive_closure_pairs(inner)
    raise AssertionError(f"unknown path node {kind!r}")


def path_pairs(triples: DataFrame, path: str) -> DataFrame:
    """DISTINCT (src, dst) pairs connected by ``path`` over the triples
    table. Inner nodes dedupe only at the top (one final shuffle);
    ``+`` sub-paths are internally distinct already (closure)."""
    base = triples.select("subj", "pred", "obj")
    return _compile_df(parse_path(path), base).distinct()


def _compile_sql(ast: Ast, base_name: str) -> str:
    kind = ast[0]
    if kind == "rep":
        return _compile_sql(_rep_expand(ast), base_name)
    if kind == "iri":
        iri = ast[1].replace("'", "''")
        return (f"(SELECT subj AS src, obj AS dst FROM {base_name} "
                f"WHERE pred = '{iri}')")
    if kind == "nps":
        in_list = ", ".join(
            "'" + i.replace("'", "''") + "'" for i in ast[1])
        return (f"(SELECT subj AS src, obj AS dst FROM {base_name} "
                f"WHERE pred NOT IN ({in_list}))")
    if kind == "inv":
        return (f"(SELECT dst AS src, src AS dst FROM "
                f"{_compile_sql(ast[1], base_name)} inv_t)")
    if kind == "seq":
        return (f"(SELECT a.src, b.dst FROM "
                f"{_compile_sql(ast[1], base_name)} a JOIN "
                f"{_compile_sql(ast[2], base_name)} b ON a.dst = b.src)")
    if kind == "alt":
        return (f"(SELECT src, dst FROM {_compile_sql(ast[1], base_name)} "
                f"alt_a UNION ALL SELECT src, dst FROM "
                f"{_compile_sql(ast[2], base_name)} alt_b)")
    if kind == "plus":
        inner = _compile_sql(ast[1], base_name)
        # bounded recursive CTE (same termination argument as
        # components.transitive_closure_oracle: shortest paths are
        # simple, so dist <= |E| covers every true pair on cycles)
        return f"""(
  WITH RECURSIVE plus_e AS (SELECT DISTINCT src, dst FROM {inner} plus_in),
  plus_reach(src, dst, dist) AS (
    SELECT src, dst, 1 FROM plus_e
    UNION
    SELECT r.src, e.dst, r.dist + 1
    FROM plus_reach r JOIN plus_e e ON e.src = r.dst
    WHERE r.dist < (SELECT count(*) FROM plus_e)
  )
  SELECT DISTINCT src, dst FROM plus_reach)"""
    raise AssertionError(f"unknown path node {kind!r}")


def path_sql(path: str, base_cte: str, base_name: str = "base") -> str:
    """DuckDB twin of ``path_pairs``: the same AST compiled to SQL over a
    triples CTE — the oracle for driver path queries."""
    body = _compile_sql(parse_path(path), base_name)
    return (f"WITH {base_name} AS ({base_cte})\n"
            f"SELECT DISTINCT src, dst FROM {body} path_t")
