#!/usr/bin/env python
"""Closure algorithm A/B: current path-doubling (P∘P) vs frontier
doubling (P' = P ∪ P∘F, F' = F∘F) on sf1 prevTurn edges."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def frontier_closure(edges, nparts):
    from pyspark.sql import functions as F
    e = (edges.select("src", "dst").localCheckpoint(eager=False))
    paths = (e.repartition(nparts, "src")
             .dropDuplicates(["src", "dst"]).persist())
    n = paths.count()
    frontier = paths
    for i in range(32):
        new = (paths.alias("a").join(frontier.alias("b"),
                                     F.col("a.dst") == F.col("b.src"))
               .select(F.col("a.src").alias("src"),
                       F.col("b.dst").alias("dst")))
        merged = (paths.unionByName(new)
                  .repartition(nparts, "src").distinct().persist())
        m = merged.count()
        if m == n:
            merged.unpersist(False)
            if frontier is not paths:
                frontier.unpersist(False)
            break
        nf = (frontier.alias("a").join(frontier.alias("b"),
                                      F.col("a.dst") == F.col("b.src"))
              .select(F.col("a.src").alias("src"),
                      F.col("b.dst").alias("dst"))
              .repartition(nparts, "src").distinct().persist())
        nf.count()
        if frontier is not paths:
            frontier.unpersist(False)
        paths.unpersist(False)
        paths, n, frontier = merged, m, nf
    return paths


def main() -> None:
    from pyspark.sql import functions as F

    from rdf_go_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench/sf1")
    spark = get_spark(app_name="exp_closure3")
    from rdf_go_spark.operators.components import transitive_closure_pairs
    from rdf_go_spark.operators.graph import materialize_bucketed
    from rdf_go_spark.plans.pipeline import kg_triples

    kg_triples(spark, "/root/testdata/sf0.001").count()
    t = kg_triples(spark, sf_dir).select("subj", "pred", "obj")
    materialize_bucketed(t, "bx_path_graph", n_buckets=8)
    g = spark.table("bx_path_graph")
    edges = (g.filter(F.col("pred") == "<http://example.org/v/prevTurn>")
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # equivalence check at small scale first
    small = edges.limit(20000).localCheckpoint()
    a = set(map(tuple, transitive_closure_pairs(small).collect()))
    b = set(map(tuple, frontier_closure(small, nparts).collect()))
    assert a == b, f"MISMATCH {len(a)} vs {len(b)}"
    print("equivalence ok", len(a))

    for name, fn in (("current", lambda: transitive_closure_pairs(edges)),
                     ("frontier", lambda: frontier_closure(edges, nparts)),
                     ("current2", lambda: transitive_closure_pairs(edges)),
                     ("frontier2", lambda: frontier_closure(edges, nparts))):
        runs = []
        for i in range(2):
            t0 = time.perf_counter()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            df.unpersist(False)
        print(name, runs, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
