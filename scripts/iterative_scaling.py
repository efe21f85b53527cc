#!/usr/bin/env python
"""Data-scaling probe for the ITERATIVE query family (VERDICT r3 #4):
kg_turn_reachability (path-doubling transitive closure) and
dedup_clusters (label-propagation connected components) at sf0.1 vs the
derived sf1 (rows x10, scripts/gen_sf1.py). Prints one JSON line per sf
level; record the ratio in BENCH/BASELINE.md §6.

The risky plan at scale is the closure self-join (intermediate |closure|
joined with itself) — so the probe also reports OUTPUT size (closure
pairs / cluster rows / input pair count) to separate honest output
growth from plan blow-up.

Usage: python scripts/iterative_scaling.py [sf_dir ...]
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
    from rdf_go_spark.operators import dedup
    from rdf_go_spark.operators.components import dedup_clusters
    from rdf_go_spark.plans.pipeline import kg_turn_reachability

    spark = get_spark(app_name="iterative_scaling")
    # warm-up: codegen + python workers at smoke scale
    kg_turn_reachability(spark, "/root/testdata/sf0.001").count()
    dedup_clusters(dedup.minhash_lsh_pairs(spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"))).count()

    for sf_dir in dirs:
        rec: dict = {"sf_dir": sf_dir}
        best, rows = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = kg_turn_reachability(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        rec["kg_turn_reachability_sec"] = round(best, 3)
        rec["closure_pairs"] = rows

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_pairs = dedup.minhash_lsh_pairs(docs).count()
        best, rows = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = dedup_clusters(dedup.minhash_lsh_pairs(docs)).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        rec["dedup_clusters_sec"] = round(best, 3)
        rec["input_pairs"] = n_pairs
        rec["cluster_rows"] = rows
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
