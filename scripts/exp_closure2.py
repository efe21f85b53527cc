#!/usr/bin/env python
"""Instrumented copy of transitive_closure_pairs: per-round timing."""
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
    spark = get_spark(app_name="exp_closure2")
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)

    from rdf_go_spark.operators.graph import materialize_bucketed
    from rdf_go_spark.plans.pipeline import kg_triples

    kg_triples(spark, "/root/testdata/sf0.001").count()
    t = kg_triples(spark, sf_dir).select("subj", "pred", "obj")
    materialize_bucketed(t, "bx_path_graph", n_buckets=8)
    g = spark.table("bx_path_graph")
    edges = (g.filter(F.col("pred") == "<http://example.org/v/prevTurn>")
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))

    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    for trial in range(2):
        t0 = time.perf_counter()
        e = edges.select("src", "dst").localCheckpoint()
        t1 = time.perf_counter()
        print(f"  checkpoint edges: {t1 - t0:.3f}s")
        paths = (e.repartition(nparts, "src")
                 .dropDuplicates(["src", "dst"]).persist())
        n = paths.count()
        t2 = time.perf_counter()
        print(f"  init dedup+count ({n}): {t2 - t1:.3f}s")
        for i in range(32):
            tr0 = time.perf_counter()
            comp = (paths.alias("a").join(
                        paths.alias("b"),
                        F.col("a.dst") == F.col("b.src"))
                    .select(F.col("a.src").alias("src"),
                            F.col("b.dst").alias("dst")))
            merged = (paths.unionByName(comp)
                      .repartition(nparts, "src").distinct())
            merged = merged.persist()
            m = merged.count()
            print(f"  round {i}: {time.perf_counter() - tr0:.3f}s "
                  f"n={n} -> m={m}")
            if m == n:
                merged.unpersist(False)
                break
            paths.unpersist(False)
            paths, n = merged, m
        print(f"TRIAL {trial}: total {time.perf_counter() - t0:.3f}s")
        paths.unpersist(False)
    spark.stop()


if __name__ == "__main__":
    main()
