#!/usr/bin/env python
"""Data-scaling probe for the SPARQL QUERY family (round 4): BGP match,
BGP algebra (FILTER/MINUS/UNION), property path, and the parsed SPARQL
queries, at sf0.1 vs the derived sf1 (rows x10, scripts/gen_sf1.py).

The graph table is materialized ONCE per scale (the production shape:
build is a one-time cost, every query scans the bucketed columnar
table), then each query is timed best-of-2 over the same table. Prints
one JSON line per sf level; record ratios in BENCH/BASELINE.md §6.

Usage: python scripts/query_scaling.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /root/repo/.bench/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, REPO)
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", f"{REPO}/.bench/sf1"]
    from rdf_go_spark.session import get_spark
    from rdf_go_spark.operators.graph import materialize_bucketed
    from rdf_go_spark.operators.paths import path_pairs
    from rdf_go_spark.operators.query import bgp_match, bgp_union
    from rdf_go_spark.operators.sparql import sparql_select
    from rdf_go_spark.plans import pipeline as P

    spark = get_spark(app_name="query_scaling")

    def queries(table):
        g = spark.table(table)
        return {
            "bgp_match": lambda: bgp_match(
                g, P._BGP_PATTERNS, optionals=P._BGP_OPTIONALS),
            "bgp_algebra": lambda: bgp_union(g, P._ALG_BLOCKS),
            "property_path": lambda: path_pairs(g, P._PATH_EXPR),
            "sparql_select": lambda: sparql_select(g, P._SPARQL_SELECT),
            "sparql_construct": lambda: sparql_select(
                g, P._SPARQL_CONSTRUCT),
            "sparql_describe": lambda: sparql_select(
                g, P._SPARQL_DESCRIBE),
            # r5: entity_tools merged into builtins (one combined query)
            "sparql_builtins": lambda: sparql_select(
                g, P._SPARQL_BUILTINS),
            "sparql_subquery": lambda: sparql_select(
                g, P._SPARQL_SUBQUERY),
            "sparql_path_star": lambda: sparql_select(
                g, P._SPARQL_PATH_STAR),
        }

    # warm-up at smoke scale: codegen + python workers + closure rounds
    t0 = time.perf_counter()
    smoke = P.kg_triples(spark, "/root/testdata/sf0.001").select(
        "subj", "pred", "obj")
    materialize_bucketed(smoke, "qscale_warm", n_buckets=8)
    for fn in queries("qscale_warm").values():
        fn().count()

    for sf_dir in dirs:
        tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        table = f"qscale_graph_{tag.replace('.', '_')}"
        t = P.kg_triples(spark, sf_dir).select("subj", "pred", "obj")
        t0 = time.perf_counter()
        materialize_bucketed(t, table, n_buckets=8)
        build = round(time.perf_counter() - t0, 2)
        rec = {"sf": tag, "build_seconds": build,
               "n_triples": spark.table(table).count(), "queries": {}}
        for name, fn in queries(table).items():
            best, rows = None, 0
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn().count()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            rec["queries"][name] = {"seconds": round(best, 2),
                                    "rows": rows}
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
