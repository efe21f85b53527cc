"""Iterative connected components — the dedup-clustering step that turns
near-duplicate PAIRS into groups (keep one doc per component at corpus
scale), and the canonical "iterative algorithm" shape (driver loop over
distributed joins, convergence check, lineage truncation).

Algorithm: parallel label propagation to the minimum reachable id.
Each round: component[n] ← min(component[n], min over neighbors
component[neighbor]); converged when no label changes. Rounds are
O(diameter); every round is one shuffle join + aggregate. localCheckpoint
truncates the lineage so plans don't grow with iterations (the classic
iterative-Spark footgun).

Oracle: DuckDB WITH RECURSIVE reachability (min reachable node id) over
the same edges — a fully independent formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """(node, component) for the undirected graph given by edge pairs;
    component = min node id in the component."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct())
    sym = sym.localCheckpoint()
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("component", F.col("node")))
    labels = labels.localCheckpoint()

    for _ in range(max_iter):
        neighbor_min = (sym.join(labels, sym["b"] == labels["node"])
                        .groupBy(F.col("a").alias("node"))
                        .agg(F.min("component").alias("nmin")))
        updated = (labels.join(neighbor_min, "node", "left")
                   .select("node",
                           F.least(F.col("component"),
                                   F.coalesce(F.col("nmin"),
                                              F.col("component")))
                           .alias("component")))
        updated = updated.localCheckpoint()
        changed = (updated.alias("u")
                   .join(labels.alias("l"), "node")
                   .filter(F.col("u.component") != F.col("l.component"))
                   .count())
        labels = updated
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs → clusters: (doc_id, cluster_id, cluster_size,
    keep) where keep marks the representative (min doc id)."""
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (comp.join(sizes, "component")
            .select(F.col("node").alias("doc_id"),
                    F.col("component").alias("cluster_id"),
                    "cluster_size",
                    (F.col("node") == F.col("component")).alias("keep")))


def transitive_closure(edges: DataFrame, src: str = "src",
                       dst: str = "dst", max_iter: int = 32) -> DataFrame:
    """Directed transitive closure with shortest hop distance — the
    relational property-path ``pred+`` operator: (src, dst, dist) for
    every reachable pair. Path-doubling iteration (paths ∘ paths, min
    merge, localCheckpoint lineage truncation): O(log diameter) rounds
    — and driver round-trips — instead of O(diameter); per-round cost is
    a closure self-join, which beats edge-at-a-time for long thin graphs
    and is bounded by the final closure size either way. Cycles are
    safe: a pair's shortest-hop distance is present from the round the
    pair first appears (both halves of the shortest path exist
    inductively), so the count fixpoint is also the distance fixpoint."""
    e = (edges.select(F.col(src).alias("m"), F.col(dst).alias("d"))
         .distinct().localCheckpoint())
    paths = e.select(F.col("m").alias("src"), F.col("d").alias("dst"),
                     F.lit(1).alias("dist")).localCheckpoint()
    n = paths.count()
    # path doubling: composing paths with paths covers depth 2^k after k
    # rounds — O(log diameter) iterations (and driver round-trips)
    # instead of O(diameter)
    for _ in range(max_iter):
        comp = (paths.alias("a").join(
                    paths.alias("b"),
                    F.col("a.dst") == F.col("b.src"))
                .select(F.col("a.src").alias("src"),
                        F.col("b.dst").alias("dst"),
                        (F.col("a.dist") + F.col("b.dist")).alias("dist")))
        merged = (paths.unionByName(comp)
                  .groupBy("src", "dst").agg(F.min("dist").alias("dist"))
                  .localCheckpoint())
        m = merged.count()
        if m == n:
            break
        paths, n = merged, m
    return paths


def transitive_closure_oracle(edges_sql: str) -> str:
    """Recursive-CTE twin with min-distance group at the end."""
    return f"""
WITH RECURSIVE e AS ({edges_sql}),
reach(src, dst, dist) AS (
  SELECT src, dst, 1 FROM e
  UNION
  SELECT r.src, e.dst, r.dist + 1
  FROM reach r JOIN e ON e.src = r.dst
)
SELECT src, dst, min(dist)::INT AS dist FROM reach GROUP BY 1, 2
""".strip()


def dedup_keep_list(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """The dedup pipeline's end artifact: one keep/drop row for EVERY
    document — clustered docs keep only their representative, singletons
    (never in any pair) keep themselves. A left join of the corpus
    against the (tiny) cluster table; at 100 TB the cluster side stays
    proportional to the duplicate population, not the corpus."""
    clusters = dedup_clusters(pairs)
    return (docs.select("doc_id")
            .join(clusters, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
                F.coalesce("cluster_size", F.lit(1).cast("long"))
                .alias("cluster_size"),
                F.coalesce("keep", F.lit(True)).alias("keep")))


def dedup_keep_list_oracle(pairs_sql: str, table: str = "documents") -> str:
    inner = dedup_clusters_oracle(pairs_sql)
    return f"""
WITH clusters AS ({inner})
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       coalesce(c.cluster_size, 1)::BIGINT AS cluster_size,
       coalesce(c.keep, TRUE) AS keep
FROM {table} d LEFT JOIN clusters c USING (doc_id)
""".strip()


def dedup_clusters_oracle(pairs_sql: str) -> str:
    """Recursive-CTE oracle over the SAME pair set."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
),
comp AS (SELECT n, min(m) AS component FROM reach GROUP BY n),
sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1)
SELECT c.n AS doc_id, c.component AS cluster_id,
       s.cluster_size::BIGINT AS cluster_size,
       c.n = c.component AS keep
FROM comp c JOIN sizes s USING (component)
""".strip()
