"""Shared fixtures: a session-scoped local Spark and a driver-style
Spark-vs-DuckDB comparator."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from rdf_go_spark.session import get_spark
    s = get_spark(app_name="rdf_go_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


SF_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the sf0.001 tables registered as views,
    mirroring the driver's oracle environment."""
    import duckdb
    con = duckdb.connect()
    for t in SF_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'")
    return con


def assert_frames_match(spark_df, duck_df, check_schema_names=True):
    """Order-insensitive multiset comparison, columns sorted by name —
    the driver's compare semantics."""
    sp = spark_df.toPandas()
    du = duck_df if hasattr(duck_df, "columns") else duck_df.df()
    assert sorted(sp.columns) == sorted(du.columns), \
        f"column mismatch: {sorted(sp.columns)} vs {sorted(du.columns)}"

    def canon(p):
        p = p[sorted(p.columns)].copy()
        for c in p.columns:
            p[c] = p[c].map(lambda v: _norm(v))
        return sorted(map(tuple, p.values.tolist()))

    a, b = canon(sp), canon(du)
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    if a != b:
        sa, sb = set(a), set(b)
        raise AssertionError(
            f"value mismatch; only-spark={list(sa - sb)[:3]} "
            f"only-oracle={list(sb - sa)[:3]}")


def _norm(v):
    import math
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return f"{v:.9g}"
    try:
        import numpy as np
        if isinstance(v, np.floating):
            return f"{float(v):.9g}"
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.ndarray):
            return tuple(_norm(x) for x in v)
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return str(v)
