"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label).

- brute-force cosine top-k: the exactness baseline, fully expressible with
  built-in higher-order functions (zip_with + aggregate, JVM-side, f64) —
  no UDF. Ranking uses (rounded cosine DESC, vec_id ASC) so results are
  reproducible across engines despite float summation order.
- LSH-bucketed ANN (random hyperplanes): the scale path — signatures are
  map-side, the join is bucket-equi, and multi-probe (the query bucket
  plus its one-bit-flip neighbors) raises recall at bounded cost. The
  planes are deterministic md5-derived integers, so they inline into the
  DuckDB oracle as literal arrays and the driver hash-checks the query
  exactly; sign inputs are quantized to integers (round(x*1e6)) so the
  bucket bit can never differ between engines on a borderline dot
  product. Recall is additionally validated in pytest against the
  brute-force baseline.
- label centroids: distributed array mean via posexplode + groupBy.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType,
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


def _dot_fold(a, b):
    """The dot component of _cosine alone (same fold, same op order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm_fold(a):
    """The norm component of _cosine alone (same fold, same op order)."""
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(embeddings: DataFrame, n_queries: int = 20,
                k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Plan: broadcast the (tiny) query side into a crossish equi-free join —
    the data side streams once. Each side's norm is hoisted BELOW the
    join (r6): computed once per row instead of once per (query, row)
    pair — identical fold, identical float ops and values, ~2x at
    driver scale. (A plan-time static unroll of the fold was measured
    SLOWER than the interpreted higher-order path and rejected.)
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"))
    emb = emb.withColumn("n_e", _norm_fold(F.col("e")))
    queries = (emb.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("e").alias("q"),
                       F.col("n_e").alias("n_q")))
    cos = _dot_fold(F.col("q"), F.col("e")) / (F.col("n_q") * F.col("n_e"))
    joined = emb.join(F.broadcast(queries),
                      F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 4).alias("cosine"))
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
            # quantize to integers before signing: |x|*1e6 <= ~1e6 and
            # |plane| <= 128, so the dot is exact in f64 regardless of
            # summation order — the sign can never disagree with the
            # oracle's sequential list_dot_product on a borderline value.
            # Rounding is half-AWAY-FROM-ZERO (floor(|x|+0.5) with the
            # sign restored) to match DuckDB's round(); np.rint would
            # round half-to-even and could disagree on a component
            # landing exactly on .5 micro-units
            qmat = np.copysign(np.floor(np.abs(mat * 1e6) + 0.5), mat)
            signs = (qmat @ planes.T) > 0
            buckets = (signs * (1 << np.arange(N_PLANES))).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                                "bucket": buckets.astype("int32")})
    return fn


def _bucket_column(e: "F.Column", dim: int) -> "F.Column":
    """Hyperplane bucket as a pure JVM column expression (whole-stage
    codegen, zero Python): quantize each component half-AWAY-FROM-ZERO
    to integer micro-units (same arithmetic as the pandas path and
    DuckDB's round()), then sign 12 exact integer dot products against
    the inlined literal plane rows. |x*1e6| <= ~1e6 and |plane| <= 128,
    so every product and the 64-term sum stay exact in f64 — the bucket
    bit cannot differ between engines or implementations."""
    planes = _plane_matrix(dim)
    vq = F.transform(
        e, lambda x: F.signum(x) * F.floor(F.abs(x * 1e6) + F.lit(0.5)))
    bucket = F.lit(0)
    for j in range(N_PLANES):
        row = F.array(*[F.lit(float(v)) for v in planes[j]])
        dot = F.aggregate(F.zip_with(vq, row, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


def _signatures(embeddings: DataFrame, dim: int,
                sig_impl: str = "jvm") -> DataFrame:
    """(vec_id, e double[], bucket) — ``jvm`` (default, production: no
    Python stage) or ``pandas`` (the original vectorized mapInPandas,
    kept as the equivalence reference; test_training_ops pins both to
    identical buckets)."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"))
    if sig_impl == "jvm":
        return emb.withColumn("bucket", _bucket_column(F.col("e"), dim))
    if sig_impl == "pandas":
        sigs = embeddings.select("vec_id", "embedding").mapInPandas(
            _sig_batches(dim), schema=_SIG_SCHEMA)
        return emb.join(sigs, "vec_id")
    raise ValueError(f"unknown sig_impl {sig_impl!r}")


def lsh_ann_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5,
                 dim: int = 64, multiprobe: int = 0,
                 sig_impl: str = "jvm") -> DataFrame:
    """ANN: hyperplane-LSH bucket join, exact cosine within bucket.

    At 100 TB the bucket join replaces the full cross product with a
    per-bucket product. ``multiprobe`` = number of one-bit-flip probe
    buckets per query (0 = the query bucket only, N_PLANES = all
    Hamming-1 neighbors): the query side explodes into 1+multiprobe
    deterministic buckets — recall rises while the data side still joins
    on its single bucket key (probes are query-side only, so the blowup
    is bounded by the tiny broadcast side)."""
    emb = _signatures(embeddings, dim, sig_impl)
    queries = (emb.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("e").alias("q"),
                       F.col("bucket").alias("qbucket")))
    if multiprobe:
        probe_masks = [0] + [1 << j for j in range(multiprobe)]
        queries = queries.select(
            "query_id", "q",
            F.explode(F.array(*[
                F.col("qbucket").bitwiseXOR(F.lit(m)) for m in probe_masks]))
            .alias("qbucket"))
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


def _bucket_expr_sql(dim: int) -> str:
    """Inlined hyperplane bucket expression over the 6-dp-quantized
    integer vector ``vq`` — integer dot products are exact in f64, so the
    sign matches the Spark side bit-for-bit."""
    planes = _plane_matrix(dim)
    sig_terms = []
    for j in range(N_PLANES):
        arr = "[" + ", ".join(str(int(x)) for x in planes[j]) + "]"
        sig_terms.append(
            f"(CASE WHEN list_dot_product(vq, {arr}) > 0 "
            f"THEN {1 << j} ELSE 0 END)")
    return "\n     + ".join(sig_terms)


def lsh_ann_oracle(table: str = "embeddings", n_queries: int = 20,
                   k: int = 5, dim: int = 64, multiprobe: int = 0) -> str:
    """DuckDB oracle for lsh_ann_topk: the hyperplanes are deterministic
    md5-derived integers, so they inline as literal arrays; signatures
    sign exact integer dots (see _bucket_expr_sql). Multi-probe explodes
    the query bucket XOR each one-bit mask."""
    masks = [0] + [1 << j for j in range(multiprobe)]
    masks_sql = "[" + ", ".join(str(m) for m in masks) + "]"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  list_transform(embedding::DOUBLE[],
                                 x -> round(x * 1000000)) AS vq
           FROM {table}),
sig AS (
  SELECT vec_id, v,
       {_bucket_expr_sql(dim)} AS bucket
  FROM e),
q AS (SELECT query_id, q, xor(qbucket::BIGINT, m.m::BIGINT) AS qbucket
      FROM (SELECT vec_id AS query_id, v AS q, bucket AS qbucket
            FROM sig WHERE vec_id < {n_queries}),
           UNNEST({masks_sql}) AS m(m)),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.q, s.v), 4) AS cosine
  FROM q JOIN sig s ON s.bucket = q.qbucket AND s.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id ASC)::INT AS rank
FROM scored
QUALIFY rank <= {k}
""".strip()


KMEANS_ITERS = 3
KMEANS_SAMPLE_MOD = 5  # deterministic ~20% sample: vec_id % 5 == 0


def _dist(a, b):
    """Squared euclidean distance as a sequential fold (no sqrt — argmin
    is invariant; avoids one more rounding step vs the SQL oracle)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def kmeans_centroids(emb: DataFrame, nlist: int = 10,
                     iters: int = KMEANS_ITERS,
                     sample_mod: int = KMEANS_SAMPLE_MOD):
    """Deterministic sampled k-means (Lloyd): init = the ``nlist``
    lowest-vec_id sample vectors, then ``iters`` assign/update rounds on
    the sample only. Per-dim means use exact DECIMAL sums (order-
    independent → a SQL oracle reproduces them bit-for-bit), rounded to
    6 dp. Returns a Python list[(cell, centroid)] — nlist×dim doubles, a
    legitimate driver-side table that is re-broadcast each iteration
    (the Spark-MLlib k-means shape). Empty cells drop identically in
    both engines."""
    sample = (emb.filter(F.col("vec_id") % sample_mod == 0)
              .select("vec_id",
                      F.transform("e", lambda x: F.round(x, 6)).alias("v")))
    init_rows = sample.orderBy("vec_id").limit(nlist).collect()
    cents = [(i, [float(x) for x in r.v]) for i, r in enumerate(init_rows)]
    spark = emb.sparkSession
    for _ in range(iters):
        cdf = spark.createDataFrame(cents, "cell int, centroid array<double>")
        assigned = (sample.crossJoin(F.broadcast(cdf))
                    .withColumn("d", _dist(F.col("v"), F.col("centroid"))))
        w = Window.partitionBy("vec_id").orderBy(F.col("d").asc(),
                                                 F.col("cell").asc())
        members = (assigned.withColumn("rn", F.row_number().over(w))
                   .filter(F.col("rn") == 1).select("cell", "v"))
        new_rows = (members.select("cell",
                                   F.posexplode("v").alias("dim", "val"))
                    .groupBy("cell", "dim")
                    .agg(F.round(
                        F.sum(F.col("val").cast("decimal(27,6)"))
                        .cast("double") / F.count("*"), 6).alias("c"))
                    .groupBy("cell")
                    .agg(F.array_sort(F.collect_list(F.struct("dim", "c")))
                         .getField("c").alias("centroid"))
                    .collect())
        cents = [(int(r.cell), [float(x) for x in r.centroid])
                 for r in sorted(new_rows, key=lambda r: r.cell)]
    return cents


def ivf_ann_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5,
                 nlist: int = 10, nprobe: int = 3) -> DataFrame:
    """IVF-style ANN: coarse quantization into ``nlist`` k-means cells,
    query probes the ``nprobe`` nearest cells, exact cosine within probed
    cells.

    Centroids come from deterministic sampled k-means (kmeans_centroids) —
    sample → Lloyd iterations → broadcast; no dependence on any label
    column. All joins are bucket-equi with a broadcast centroid table —
    the cross product never materializes (the IVF scale property).
    """
    emb = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"))
    spark = embeddings.sparkSession
    cents = spark.createDataFrame(
        kmeans_centroids(emb, nlist=nlist),
        "cell int, centroid array<double>")

    # assign every vector to its nearest cell (quantized view for the
    # assignment so it matches the oracle; original e for scoring)
    emb = emb.withColumn("v", F.transform("e", lambda x: F.round(x, 6)))
    assigned = (emb.crossJoin(F.broadcast(cents))
                .withColumn("d", _dist(F.col("v"), F.col("centroid"))))
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("d").asc(),
                                                    F.col("cell").asc())
    cells = (assigned.withColumn("rn", F.row_number().over(w_assign))
             .filter(F.col("rn") == 1)
             .select("vec_id", "e", "v", "cell"))
    # queries probe their nprobe nearest cells
    queries = (cells.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("e").alias("q"),
                       F.col("v").alias("qv")))
    probes = (queries.crossJoin(F.broadcast(cents))
              .withColumn("d", _dist(F.col("qv"), F.col("centroid"))))
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


def ivf_ann_oracle(table: str = "embeddings", n_queries: int = 20,
                   k: int = 5, nlist: int = 10, nprobe: int = 3,
                   dim: int = 64, iters: int = KMEANS_ITERS,
                   sample_mod: int = KMEANS_SAMPLE_MOD) -> str:
    """DuckDB oracle for ivf_ann_topk: replays the deterministic sampled
    k-means (same init, same Lloyd iterations, same exact-DECIMAL means)
    then the probed-cell search. Cross-engine determinism: per-dim means
    are exact DECIMAL sums cast to double; inputs are quantized to 6 dp;
    distance ties break on cell ASC."""
    def dist(a, b):
        return (f"list_sum(list_transform(list_zip({a}, {b}), "
                f"x -> (x[1] - x[2]) * (x[1] - x[2])))")

    parts = [f"""
samp AS (
  SELECT vec_id, list_transform(embedding::DOUBLE[], x -> round(x, 6)) AS v
  FROM {table} WHERE vec_id % {sample_mod} = 0),
c0 AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cell,
         v AS centroid
  FROM samp QUALIFY row_number() OVER (ORDER BY vec_id) <= {nlist})"""]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        parts.append(f"""
a{i} AS (
  SELECT vec_id, v, cell FROM (
    SELECT s.vec_id, s.v, c.cell,
           row_number() OVER (PARTITION BY s.vec_id ORDER BY
             {dist('s.v', 'c.centroid')} ASC, c.cell ASC) AS rn
    FROM samp s CROSS JOIN {prev} c)
  WHERE rn = 1),
c{i} AS (
  SELECT cell, list(c ORDER BY dim) AS centroid FROM (
    SELECT a.cell, t.i - 1 AS dim,
           round(CAST(sum(CAST(a.v[t.i] AS DECIMAL(27,6))) AS DOUBLE)
                 / count(*), 6) AS c
    FROM a{i} a, generate_series(1, {dim}) t(i)
    GROUP BY a.cell, dim)
  GROUP BY cell)""")
    final = f"c{iters}"
    parts.append(f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS ev,
             list_transform(embedding::DOUBLE[], x -> round(x, 6)) AS v
      FROM {table}),
cells AS (
  SELECT vec_id, ev, v, cell FROM (
    SELECT e.vec_id, e.ev, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {dist('e.v', 'c.centroid')} ASC, c.cell ASC) AS rn
    FROM e CROSS JOIN {final} c)
  WHERE rn = 1),
q AS (SELECT vec_id AS query_id, ev AS q, v AS qv
      FROM cells WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, q, cell FROM (
    SELECT q.query_id, q.q, c.cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             {dist('q.qv', 'c.centroid')} ASC, c.cell ASC) AS rn
    FROM q CROSS JOIN {final} c)
  WHERE rn <= {nprobe}),
scored AS (
  SELECT p.query_id, s.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.q, s.ev), 4) AS cosine
  FROM probes p JOIN cells s USING (cell)
  WHERE s.vec_id <> p.query_id)""")
    body = ",".join(parts)
    return f"""WITH {body.lstrip()}
SELECT query_id, neighbor_id, cosine,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id ASC)::INT AS rank
FROM scored
QUALIFY rank <= {k}""".strip()


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


def embedding_near_dup_pairs(embeddings: DataFrame,
                             threshold: float = 0.95,
                             dim: int = 64,
                             sig_impl: str = "jvm") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from the
    hyperplane-LSH bucket equi-join (same signatures as lsh_ann_topk —
    never an all-pairs product), verified with exact cosine >= threshold.
    The dedup counterpart of MinHash for the embedding modality."""
    emb = _signatures(embeddings, dim, sig_impl)
    a, b = emb.alias("a"), emb.alias("b")
    cand = a.join(b, (F.col("a.bucket") == F.col("b.bucket")) &
                  (F.col("a.vec_id") < F.col("b.vec_id")))
    return (cand.select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.round(_cosine(F.col("a.e"), F.col("b.e")), 4)
                .alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def embedding_near_dup_oracle(table: str = "embeddings",
                              threshold: float = 0.95,
                              dim: int = 64) -> str:
    """DuckDB twin: same inlined hyperplane buckets (exact integer-dot
    signs), same candidate join, same rounded exact-cosine verify."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  list_transform(embedding::DOUBLE[],
                                 x -> round(x * 1000000)) AS vq
           FROM {table}),
sig AS (
  SELECT vec_id, v,
       {_bucket_expr_sql(dim)} AS bucket
  FROM e)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 4) AS cosine
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {threshold}
""".strip()
