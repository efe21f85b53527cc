#!/usr/bin/env python
"""A/B config experiment for transitive_closure_pairs on sf1 prevTurn
edges (fresh JVM per run; pass config pairs as k=v args)."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from rdf_go_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench/sf1")
    spark = get_spark(app_name="exp_closure")
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
        print(f"set {k}={v}")

    from rdf_go_spark.operators.components import transitive_closure_pairs
    from rdf_go_spark.operators.graph import materialize_bucketed
    from rdf_go_spark.plans.pipeline import kg_triples

    # warm-up
    kg_triples(spark, "/root/testdata/sf0.001").count()

    t = kg_triples(spark, sf_dir).select("subj", "pred", "obj")
    materialize_bucketed(t, "bx_path_graph", n_buckets=8)
    g = spark.table("bx_path_graph")
    edges = (g.filter(F.col("pred") == "<http://example.org/v/prevTurn>")
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    runs = []
    for i in range(3):
        t0 = time.perf_counter()
        (transitive_closure_pairs(edges)
         .write.format("noop").mode("overwrite").save())
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"RESULT closure runs={runs} best={min(runs)}")
    spark.stop()


if __name__ == "__main__":
    main()
