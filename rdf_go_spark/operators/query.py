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
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _compile_pattern(base: DataFrame, pat: Tuple[str, str, str]) -> Tuple[DataFrame, List[str]]:
    if len(pat) != 3:
        raise ValueError(f"pattern {pat!r} is not a triple")
    df = base
    rename: Dict[str, str] = {}
    for pos, term in zip(_POSITIONS, pat):
        if _is_var(term):
            var = term[1:]
            if var in rename.values():
                # ?x p ?x — equality within the pattern
                prev = next(p for p, v in rename.items() if v == var)
                df = df.filter(F.col(pos) == F.col(prev))
            else:
                rename[pos] = var
        else:
            df = df.filter(F.col(pos) == term)
    return (df.select(*[F.col(p).alias(v) for p, v in rename.items()]),
            list(rename.values()))


def bgp_match(triples: DataFrame, patterns: Sequence[Tuple[str, str, str]],
              optionals: Sequence[Tuple[str, str, str]] = (),
              allow_cross: bool = False) -> DataFrame:
    """Match a conjunction of triple patterns; returns one column per
    distinct variable, one row per binding (bag semantics — add
    .distinct() for set semantics; the driver query aggregates anyway).

    ``optionals``: SPARQL-OPTIONAL-style patterns, each LEFT-joined on
    its shared variables after the required block — unmatched rows keep
    null for the optional variables."""
    if not patterns:
        raise ValueError("empty BGP")
    base = triples.select(*_POSITIONS)
    result: DataFrame = None
    bound: List[str] = []
    for idx, pat in enumerate(patterns):
        df, varset = _compile_pattern(base, pat)
        if result is None:
            result, bound = df, varset
            continue
        on = [v for v in varset if v in bound]
        if not on and not allow_cross:
            raise ValueError(
                f"pattern {idx} shares no variable with previous patterns "
                f"(cartesian); pass allow_cross=True if intended")
        result = result.join(df, on=on) if on else result.crossJoin(df)
        bound += [v for v in varset if v not in bound]
    for idx, pat in enumerate(optionals):
        df, varset = _compile_pattern(base, pat)
        on = [v for v in varset if v in bound]
        if not on:
            raise ValueError(
                f"optional pattern {idx} shares no variable with the "
                f"required block")
        result = result.join(df, on=on, how="left")
        bound += [v for v in varset if v not in bound]
    return result


def bgp_sql(patterns: Sequence[Tuple[str, str, str]],
            base_cte: str, base_name: str = "base",
            optionals: Sequence[Tuple[str, str, str]] = ()) -> str:
    """DuckDB twin: the same BGP as self-joins over a triples CTE —
    used as the oracle for driver BGP queries. Optional patterns become
    LEFT JOINs with their constant conditions in the ON clause."""
    selects: List[str] = []
    joins: List[str] = []
    where: List[str] = []
    seen: Dict[str, str] = {}

    def compile_one(i: int, pat, optional: bool):
        alias = f"t{i}"
        conds = []
        for pos, term in zip(_POSITIONS, pat):
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
        if i == 0:
            joins.append(f"{base_name} {alias}")
            where.extend(conds)
        elif conds:
            kw = "LEFT JOIN" if optional else "JOIN"
            joins.append(f"{kw} {base_name} {alias} ON "
                         + " AND ".join(conds))
        else:
            joins.append(f"CROSS JOIN {base_name} {alias}")

    for i, pat in enumerate(patterns):
        compile_one(i, pat, optional=False)
    for j, pat in enumerate(optionals):
        compile_one(len(patterns) + j, pat, optional=True)
    sql = f"WITH {base_name} AS ({base_cte})\n" \
          f"SELECT {', '.join(selects)}\nFROM " + "\n".join(joins)
    if where:
        sql += "\nWHERE " + " AND ".join(where)
    return sql
