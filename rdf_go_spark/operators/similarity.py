"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label).

- brute-force cosine top-k: the exactness baseline, fully expressible with
  built-in higher-order functions (zip_with + aggregate, JVM-side, f64) —
  no UDF. Ranking uses (rounded cosine DESC, vec_id ASC) so results are
  reproducible across engines despite float summation order.
- LSH-bucketed ANN (random hyperplanes): the scale path — signatures are
  map-side, the join is bucket-equi; recall is validated in pytest against
  the brute-force baseline (no SQL oracle — the planes are pseudo-random).
- label centroids: distributed array mean via posexplode + groupBy.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)


def _cosine(a, b):
    """Sequential-fold cosine over double arrays (matches a scalar loop)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def cosine_topk(embeddings: DataFrame, n_queries: int = 20,
                k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Plan: broadcast the (tiny) query side into a crossish equi-free join —
    the data side streams once; per-row cosine is whole-stage-codegen'd.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"))
    queries = (emb.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("e").alias("q")))
    joined = emb.join(F.broadcast(queries),
                      F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("q"), F.col("e")), 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("int").alias("rank")))


def cosine_topk_oracle(table: str = "embeddings", n_queries: int = 20,
                       k: int = 5) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM {table}),
q AS (SELECT vec_id AS query_id, e AS q FROM e WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.q, e.e), 4) AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id ASC)::INT AS rank
FROM scored
QUALIFY rank <= {k}
""".strip()


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

N_PLANES = 12

_SIG_SCHEMA = StructType([
    StructField("vec_id", LongType(), False),
    StructField("bucket", IntegerType(), False),
])


def _plane_matrix(dim: int):
    """Deterministic pseudo-random hyperplanes from md5 bytes (no RNG —
    resumable and identical across runs/executors)."""
    import hashlib

    import numpy as np
    rows = []
    for j in range(N_PLANES):
        vals = []
        for d in range(0, dim, 8):
            digest = hashlib.md5(f"plane:{j}:{d}".encode()).digest()
            vals.extend(b - 128 for b in digest[:min(8, dim - d)])
        rows.append(vals)
    return np.array(rows, dtype=np.float64)


def _sig_batches(dim: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        planes = _plane_matrix(dim)
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"vec_id": [], "bucket": []})
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            signs = (mat @ planes.T) > 0
            buckets = (signs * (1 << np.arange(N_PLANES))).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                                "bucket": buckets.astype("int32")})
    return fn


def lsh_ann_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5,
                 dim: int = 64) -> DataFrame:
    """ANN: hyperplane-LSH bucket join, exact cosine within bucket.

    At 100 TB the bucket join replaces the full cross product with a
    per-bucket product; multi-probe (flip one bit) would raise recall.
    """
    sigs = embeddings.select("vec_id", "embedding").mapInPandas(
        _sig_batches(dim), schema=_SIG_SCHEMA)
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")) \
        .join(sigs, "vec_id")
    queries = (emb.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("e").alias("q"),
                       F.col("bucket").alias("qbucket")))
    joined = emb.join(F.broadcast(queries),
                      (F.col("bucket") == F.col("qbucket")) &
                      (F.col("vec_id") != F.col("query_id")))
    scored = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("q"), F.col("e")), 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("int").alias("rank")))


def ivf_ann_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5,
                 nlist: int = 10, nprobe: int = 3) -> DataFrame:
    """IVF-style ANN: coarse quantization into ``nlist`` cells, query
    probes the ``nprobe`` nearest cells, exact cosine within probed cells.

    Cell centroids are derived deterministically from the data itself
    (per-label means — a stand-in for k-means; on a real corpus run a few
    Lloyd iterations on a sample and broadcast the table). All joins are
    bucket-equi with a broadcast centroid table — the cross product never
    materializes (the IVF scale property).
    """
    emb = embeddings.select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("e"))
    # centroid table (tiny) — collect + rebroadcast as literal arrays
    cent_rows = (emb.select("label", F.posexplode("e").alias("dim", "val"))
                 .groupBy("label", "dim").agg(F.avg("val").alias("c"))
                 .groupBy("label")
                 .agg(F.array_sort(F.collect_list(F.struct("dim", "c")))
                      .getField("c").alias("centroid"))
                 .collect())
    spark = embeddings.sparkSession
    cents = spark.createDataFrame(
        [(int(r.label) % nlist, [float(x) for x in r.centroid])
         for r in cent_rows], "cell int, centroid array<double>")

    def _dist(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                           F.lit(0.0), lambda acc, x: acc + x)

    # assign every vector to its nearest cell
    assigned = (emb.crossJoin(F.broadcast(cents))
                .withColumn("d", _dist(F.col("e"), F.col("centroid"))))
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("d").asc(),
                                                    F.col("cell").asc())
    cells = (assigned.withColumn("rn", F.row_number().over(w_assign))
             .filter(F.col("rn") == 1)
             .select("vec_id", "e", "cell"))
    # queries probe their nprobe nearest cells
    queries = (cells.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("e").alias("q")))
    probes = (queries.crossJoin(F.broadcast(cents))
              .withColumn("d", _dist(F.col("q"), F.col("centroid"))))
    w_probe = Window.partitionBy("query_id").orderBy(F.col("d").asc(),
                                                     F.col("cell").asc())
    probe_cells = (probes.withColumn("rn", F.row_number().over(w_probe))
                   .filter(F.col("rn") <= nprobe)
                   .select("query_id", "q", "cell"))
    # search within probed cells only
    joined = cells.join(F.broadcast(probe_cells), "cell") \
        .filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("q"), F.col("e")), 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine",
                    F.col("rank").cast("int").alias("rank")))


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid: posexplode → groupBy(label, dim) → avg."""
    exploded = embeddings.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("dim", "val"))
    return (exploded.groupBy("label", "dim")
            .agg(F.round(F.avg("val"), 5).alias("centroid"),
                 F.count("*").alias("n"))
            .withColumn("dim", F.col("dim").cast("int")))


def label_centroids_oracle(table: str = "embeddings") -> str:
    return f"""
SELECT label, (t.i - 1)::INT AS dim,
       round(avg(embedding[t.i]::DOUBLE), 5) AS centroid,
       count(*)::BIGINT AS n
FROM {table}, LATERAL UNNEST(generate_series(1, len(embedding))) AS t(i)
GROUP BY label, dim
""".strip()
