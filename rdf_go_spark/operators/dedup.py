"""Deduplication operators for training-data pipelines: exact (see
textstats.exact_dedup), n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (100 TB target):
- The shingle self-join (`ngram_jaccard_pairs`) is exact but quadratic in
  bucket size; it exists as the verification kernel and the small-corpus
  baseline. The scale path is `minhash_lsh_pairs`: signatures are computed
  map-side, the only shuffles are (doc,band-bucket) grouping and the
  candidate-pair verify join — standard shingle→minhash→band→bucket-join.
- Hashing uses a cross-engine-portable md5-derived value (== DuckDB
  ``md5_number_lower``; 31-bit masked so the affine minhash family runs
  in plain LONG arithmetic on both engines) so every stage has an exact
  DuckDB oracle. The production swap is ``hash_family="xxhash64"``
  (JVM hash, same plan shape, no cross-engine contract).
- SimHash has three hash-family settings: "md5" (Arrow-batched pandas,
  the portable-oracle default), "md5-jvm" (the SAME hash via built-ins —
  bit-identical, zero Python stages), and "xxhash64" (production: JVM
  hash + the same wide bit-vote agg, one shuffle). Pair generation is a
  banded equi-join; bit_count(xor) verifies JVM-side.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_TOKEN_RE = r"[^a-z0-9]+"
MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4  # MINHASH_K == LSH_BANDS * LSH_ROWS
# production parameters (the standard 128-perm / 16-band / 8-row setting);
# the wide-agg plan is identical — only the column count changes
MINHASH_K_PROD = 128
LSH_BANDS_PROD = 16


def _hash64(col):
    """Portable md5-derived uint64 (== DuckDB md5_number_lower): upper 8
    digest bytes, little-endian — validated byte-for-byte cross-engine.
    Production swap: F.xxhash64(col) (JVM, seeded)."""
    hexc = F.md5(col)
    rev = F.concat(*[F.substring(hexc, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(rev, 16, 10).cast("decimal(20,0)")


M31 = (1 << 31) - 1


def _hash31(col):
    """Portable md5-derived 31-bit value: the low 7 hex digits of the
    md5_number_lower bytes fit a LONG exactly in both engines — the whole
    affine minhash family then runs in plain 64-bit integer arithmetic
    (max product 259 * 2^31 < 2^63), no DECIMAL. DuckDB twin:
    ``md5_number_lower(s) & 2147483647``."""
    hexc = F.md5(col)
    # low 4 little-endian bytes of md5_number_lower = digest bytes 11..8
    # MSB-first = hex chars 23-24, 21-22, 19-20, 17-18
    low = F.concat(*[F.substring(hexc, 23 - 2 * i, 2) for i in range(4)])
    return F.conv(low, 16, 10).cast("long").bitwiseAND(F.lit(M31))


def tokens_col():
    return F.array_remove(F.split(F.lower(F.col("text")), _TOKEN_RE), "")


def shingles(docs: DataFrame, n: int = 3, by_doc: bool = False) -> DataFrame:
    """Distinct (doc_id, shingle) pairs of word n-grams.

    ``by_doc=True`` routes the exploded rows through ONE doc_id-keyed
    exchange before the distinct (r6): hashpartitioning(doc_id)
    satisfies the clustering of the (doc_id, shingle) distinct, the
    per-doc size aggregate, AND the k-wide signature aggregate, so the
    whole minhash pipeline runs off a single shuffle — the former plan
    re-exchanged the shingle table per consumer, and the signature
    partial-agg's map-side output grew with k (every doc's k-long
    buffer repeated per input partition: ~1.6 GB at k=128/sf1)."""
    df = docs.withColumn("toks", tokens_col())
    gram = F.expr(
        f"transform(sequence(0, size(toks) - {n}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {n})))")
    df = df.withColumn(
        "shingle",
        F.explode(F.when(F.size("toks") >= n, gram)
                  .otherwise(F.array().cast("array<string>"))))
    out = df.select("doc_id", "shingle")
    if by_doc:
        nparts = int(docs.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
        out = out.repartition(nparts, "doc_id")
    return out.distinct()


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                        max_df: int = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, j >= threshold).

    ``max_df``: document-frequency cap on CANDIDATE-generating shingles —
    the scale guard for the shingle self-join. Hot shingles (common
    trigrams appearing in thousands of documents) make the equi-join
    quadratic within their group; capping df bounds every join group at
    max_df while the Jaccard VALUE stays exact (the intersection count
    uses ALL shingles, restricted to candidate pairs). A pair is missed
    only if every shared shingle is hotter than the cap — at j >= 0.8
    near-dups share many (mostly rare) shingles, so recall loss is
    negligible. None = uncapped exact baseline (the verification kernel).
    """
    sh = shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    if max_df is None:
        cand_sh = sh
    else:
        rare = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
                .filter(F.col("df") <= max_df).select("shingle"))
        cand_sh = sh.join(rare, "shingle")
    a = cand_sh.alias("a")
    b = cand_sh.alias("b")
    cand = (a.join(b, (F.col("a.shingle") == F.col("b.shingle")) &
                   (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    if max_df is None:
        inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle")) &
                        (F.col("a.doc_id") < F.col("b.doc_id")))
                 .groupBy(F.col("a.doc_id").alias("doc_a"),
                          F.col("b.doc_id").alias("doc_b"))
                 .agg(F.count("*").alias("inter")))
    else:
        # exact intersection over ALL shingles, restricted to candidates.
        # No broadcast hint: the candidate-pair count is bounded only by
        # ~max_df²/2 per shingle, which can exceed driver memory on a
        # large corpus — let AQE pick the join strategy from actual size.
        sh_a = sh.select(F.col("doc_id").alias("doc_a"),
                         F.col("shingle").alias("sh_a"))
        sh_b = sh.select(F.col("doc_id").alias("_db"),
                         F.col("shingle").alias("sh_b"))
        inter = (sh_a.join(cand, "doc_a")
                 .join(sh_b, (F.col("doc_b") == F.col("_db")) &
                       (F.col("sh_a") == F.col("sh_b")))
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = (inter.join(sa, "doc_a").join(sb, "doc_b")
           .withColumn("jaccard", F.round(
               F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
           .filter(F.col("jaccard") >= threshold))
    return jac.select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_oracle(table: str = "documents", threshold: float = 0.8,
                         n: int = 3, max_df: int = None) -> str:
    if max_df is None:
        cand_sh = "sh"
        extra = ""
    else:
        cand_sh = "rare_sh"
        extra = f""",
rare_sh AS (
  SELECT sh.* FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {max_df}) r USING (shingle)
)"""
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                     x -> x <> '') AS toks
  FROM {table}
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i:i+{n - 1}], ' ') AS shingle
  FROM docs, LATERAL UNNEST(generate_series(1, len(toks) - {n - 1})) AS t(i)
  WHERE len(toks) >= {n}
){extra},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM {cand_sh} a JOIN {cand_sh} b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= {threshold}
""".strip()


def minhash_wide_signatures(sh: DataFrame, k: int = MINHASH_K,
                            hash_family: str = "md5") -> DataFrame:
    """Wide signature aggregation: k min-columns over ONE base hash per
    shingle — no row explosion, map-side partial agg, a SINGLE shuffle of
    k-wide rows instead of k x |shingles| rows. The plan shape is
    independent of k (verified at k=128 in tests/bench).

    hash_family: "md5" = portable md5-derived uint64 in exact DECIMAL
    arithmetic (cross-engine oracle, see _hash64); "xxhash64" = the
    production swap — JVM xxHash64 base hash masked to 31 bits with the
    affine family mod (2^31-1) in plain LONG arithmetic (max product
    259 * 2^31 < 2^63, no ANSI overflow), no DECIMAL — identical plan
    shape, cheaper per row. 31-bit signature space is ample for minhash:
    band keys concatenate rows before bucketing."""
    base = F.xxhash64(F.col("shingle")).bitwiseAND(F.lit(M31)) \
        if hash_family == "xxhash64" else _hash31(F.col("shingle"))
    based = sh.withColumn("x", base)
    sig_cols = [
        F.min(F.pmod(F.lit(2 * i + 3).cast("long") * F.col("x")
                     + F.lit(i * i + 1), F.lit(M31)))
        .alias(f"sig{i}")
        for i in range(k)
    ]
    return based.groupBy("doc_id").agg(*sig_cols)


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.8,
                      k: int = MINHASH_K, bands: int = LSH_BANDS,
                      hash_family: str = "md5") -> DataFrame:
    """MinHash + banded LSH candidate generation + exact-Jaccard verify.

    shuffle plan: (doc,shingle)→(doc,i) partial-agg; band bucket groupBy;
    candidate join; verify join — each keyed, AQE-coalesced.
    """
    rows = k // bands
    # reused by signatures AND verify; doc-keyed so every downstream
    # aggregate/join clusters without further exchanges (see shingles)
    sh = shingles(docs, by_doc=True).cache()
    wide = minhash_wide_signatures(sh, k=k, hash_family=hash_family)
    band_cols = [
        F.md5(F.concat_ws(",", *[
            F.col(f"sig{b * rows + r}").cast("string") for r in range(rows)]))
        .alias(f"band{b}")
        for b in range(bands)
    ]
    wide_bands = wide.select("doc_id", *band_cols)
    stack_expr = "stack({n}, {args}) as (band, bucket)".format(
        n=bands, args=", ".join(f"{b}, band{b}" for b in range(bands)))
    banded = wide_bands.select("doc_id", F.expr(stack_expr))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band")) &
                   (F.col("a.bucket") == F.col("b.bucket")) &
                   (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    # exact-Jaccard verification restricted to CANDIDATES only — the whole
    # point of LSH: the O(n²) shingle self-join never materializes.
    # Candidate set is tiny → broadcast both restriction joins. The
    # b-side is ALSO pre-restricted to candidate doc_bs (r6): without
    # it the planner sort-merge-joined the full shingle table against
    # the already-restricted a-side — two |shingles|-row exchanges to
    # look up a handful of documents. cand is persisted so its pipeline
    # (signatures → bands → self-join) runs once, not once per use.
    cand = cand.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"),
                     F.col("shingle").alias("sh_a"))
    b_keys = cand.select(F.col("doc_b").alias("_db")).distinct()
    sh_b = (sh.select(F.col("doc_id").alias("_db"),
                      F.col("shingle").alias("sh_b"))
            .join(F.broadcast(b_keys), "_db"))
    inter = (sh_a.join(F.broadcast(cand), "doc_a")
             .join(sh_b, (F.col("doc_b") == F.col("_db")) &
                   (F.col("sh_a") == F.col("sh_b")))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (inter.join(F.broadcast(sa), "doc_a")
            .join(F.broadcast(sb), "doc_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


def minhash_lsh_oracle(table: str = "documents", threshold: float = 0.8,
                       k: int = MINHASH_K, bands: int = LSH_BANDS,
                       n: int = 3) -> str:
    rows = k // bands
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                     x -> x <> '') AS toks
  FROM {table}
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS shingle
  FROM docs, LATERAL UNNEST(generate_series(1, len(toks) - {n - 1})) AS t(i)
  WHERE len(toks) >= {n}
),
sigs AS (
  SELECT doc_id, i,
         min(((2*i + 3)::BIGINT
              * (md5_number_lower(shingle) & 2147483647)::BIGINT
              + (i*i + 1)) % 2147483647) AS sig
  FROM sh, LATERAL UNNEST(generate_series(0, {k - 1})) AS t(i)
  GROUP BY doc_id, i
),
banded AS (
  SELECT doc_id, (i // {rows})::INT AS band,
         md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) AS bucket
  FROM sigs GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
SELECT c.doc_a, c.doc_b,
       round(p.inter * 1.0 / (sa.n + sb.n - p.inter), 6) AS jaccard
FROM cand c
JOIN pairs p ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE round(p.inter * 1.0 / (sa.n + sb.n - p.inter), 6) >= {threshold}
""".strip()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # fits a signed 64-bit value in every engine

_SIMHASH_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("simhash", StringType(), False),  # 15-hex-char, zero-padded
])


def _simhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched SimHash: per doc, sum ±1 per bit over distinct-token
    hashes; bit set where the sum is positive. numpy-vectorized per batch."""
    import hashlib

    import numpy as np

    mask = (1 << SIMHASH_BITS) - 1
    for pdf in batches:
        out_ids, out_hashes = [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = set(t for t in
                       __import__("re").split(_TOKEN_RE, str(text).lower())
                       if t)
            if not toks:
                out_ids.append(int(doc_id))
                out_hashes.append("0" * 15)
                continue
            hs = np.array(
                [int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
                 & mask for t in sorted(toks)], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64))
                    & np.uint64(1)).astype(np.int8)
            votes = (2 * bits - 1).sum(axis=0)
            sim = 0
            for b in range(SIMHASH_BITS):
                if votes[b] > 0:
                    sim |= 1 << b
            out_ids.append(int(doc_id))
            out_hashes.append(format(sim, "015x"))
        yield pd.DataFrame({"doc_id": out_ids, "simhash": out_hashes})


def _hash60(col):
    """Portable md5-derived 60-bit value == the pandas path's
    ``int.from_bytes(md5(t).digest()[8:], 'little') & (2^60-1)``: the
    64-bit little-endian tail mod 2^60 drops the top nibble — hex char 32
    (low nibble of digest byte 15) followed by bytes 14..8 MSB-first."""
    hexc = F.md5(col)
    h15 = F.concat(F.substring(hexc, 32, 1),
                   *[F.substring(hexc, 29 - 2 * i, 2) for i in range(7)])
    return F.conv(h15, 16, 10).cast("long")


def _simhash_jvm(docs: DataFrame, hash_family: str) -> DataFrame:
    """All-JVM SimHash: distinct tokens exploded, base hash via built-ins,
    60 bit-vote aggregate columns in ONE shuffle (map-side combine), zero
    Python stages — the production shape (mirrors minhash's wide agg).

    hash_family "md5" reproduces the pandas path bit-identically
    (equivalence-tested); "xxhash64" is the cheap production hash."""
    from functools import reduce
    from operator import add

    mask = (1 << SIMHASH_BITS) - 1
    base = F.xxhash64("tok").bitwiseAND(F.lit(mask)) \
        if hash_family == "xxhash64" else _hash60(F.col("tok"))
    toks = (docs.select("doc_id",
                        F.explode(F.array_distinct(tokens_col())).alias("tok"))
            .withColumn("h", base))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = reduce(add, [
        F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for b in range(SIMHASH_BITS)
    ])
    sims = agg.select("doc_id", sim.alias("sim"))
    # docs with zero tokens have no vote rows → simhash 0, like pandas
    return (docs.select("doc_id").join(sims, "doc_id", "left")
            .select("doc_id",
                    F.lpad(F.lower(F.conv(
                        F.coalesce(F.col("sim"), F.lit(0)).cast("string"),
                        10, 16)), 15, "0").alias("simhash")))


def simhash(docs: DataFrame, hash_family: str = "md5") -> DataFrame:
    """"md5" (default): Arrow-batched pandas path — the portable-oracle
    setting. "md5-jvm": the SAME hash computed entirely JVM-side,
    bit-identical output (proves the JVM plan against the oracle path).
    "xxhash64": the production swap — same zero-Python plan, JVM xxHash64
    base hash, no cross-engine contract."""
    if hash_family in ("md5-jvm", "xxhash64"):
        return _simhash_jvm(
            docs, "md5" if hash_family == "md5-jvm" else "xxhash64")
    return docs.select("doc_id", "text").mapInPandas(
        _simhash_batches, schema=_SIMHASH_SCHEMA)


def simhash_oracle(table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.tok
  FROM {table},
  LATERAL UNNEST(list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                             x -> x <> '')) AS t(tok)
),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (md5_number_lower(tok) & ((1::UBIGINT << 60) - 1))
                       >> b.bit & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM toks, LATERAL UNNEST(generate_series(0, {SIMHASH_BITS - 1})) AS b(bit)
  GROUP BY doc_id, b.bit
),
vals AS (
  SELECT doc_id,
         sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit::INT) ELSE 0 END)::BIGINT AS v
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       lower(lpad(to_hex(COALESCE(v.v, 0)::BIGINT), 15, '0')) AS simhash
FROM {table} d LEFT JOIN vals v ON v.doc_id = d.doc_id
""".strip()


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  hash_family: str = "md5") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded for scale.

    Pigeonhole: the 60-bit simhash splits into ``max_hamming + 1``
    segments; any pair within Hamming ``max_hamming`` must agree exactly
    on at least one segment. So candidates come from an EQUI-join on
    (band, segment-key) — a hash-partitioned shuffle join, never a
    cartesian — then the exact Hamming filter keeps the output identical
    to the all-pairs definition (the SQL oracle still states it that way).
    """
    n_bands = max_hamming + 1
    seg_bits = SIMHASH_BITS // n_bands  # 60 bits -> 4 x 15-bit segments
    seg_mask = (1 << seg_bits) - 1
    sh = simhash(docs, hash_family=hash_family) \
        .withColumn("v", F.conv("simhash", 16, 10).cast("long"))
    segs = sh.select(
        "doc_id", "v",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("v"), i * seg_bits)
                .bitwiseAND(F.lit(seg_mask)).alias("key"))
            for i in range(n_bands)])).alias("bk")) \
        .select("doc_id", "v", F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key"))
    a, b = segs.alias("a"), segs.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band")) &
                   (F.col("a.key") == F.col("b.key")) &
                   (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
            .dropDuplicates(["doc_a", "doc_b"]))
    return (cand.withColumn("hamming", F.bit_count(
                F.col("va").bitwiseXOR(F.col("vb"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b",
                    F.col("hamming").cast("int").alias("hamming")))


def simhash_pairs_oracle(table: str = "documents", max_hamming: int = 3) -> str:
    inner = simhash_oracle(table)
    return f"""
WITH sims AS ({inner})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(('0x' || a.simhash)::BIGINT,
                     ('0x' || b.simhash)::BIGINT))::INT AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(('0x' || a.simhash)::BIGINT,
                    ('0x' || b.simhash)::BIGINT)) <= {max_hamming}
""".strip()
