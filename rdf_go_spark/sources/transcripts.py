"""Deterministic multi-turn transcript synthesis (FIXTURES.md §1) and the
matching DuckDB SQL generator used by oracle queries.

Shape (BASELINE.json input_hint):
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp

Everything is generated DISTRIBUTED with built-in column expressions over
``spark.range`` — no driver-side loop, no Python UDF — so the same generator
scales from 50 conversations (smoke) to the partition counts a 10^12-turn
corpus would need. The DuckDB constant reproduces the generator byte-for-byte
so extraction queries get a fully independent arithmetic oracle.

Generator rules (seed-free, pure arithmetic in (i, j)):
  conv_id   = printf('conv-%06d', i)
  n_turns   = 1 + (i mod 8); j = turn_idx in [0, n_turns)
  role      = ['user','assistant','tool'][j mod 3]
  tool      = '' unless role='tool' else ['search','code','browse'][(j/3) mod 3]
  k(mention)= 0 if i mod 5 = 0 else (i*7 + j*3) mod 100   -- hot-entity skew
  text      = '<role> turn <j> of <conv_id>: discussing entity <k> with café nuance.'
              + (' <http://example.org/e/<k>> <http://example.org/rel/mentions>
                  "entity <k>" .'  when (i+j) mod 5 = 0)   -- embedded NT payload
  ts        = 2026-01-01T00:00:00Z + i*3600s + j*60s

The hot-entity rule sends 20% of conversations to entity 0 to exercise
salting + AQE skew-join handling (FIXTURES.md §4 skew fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ENTITIES = 100
ENTITY_NS = "http://example.org/e/"
EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z

_N_CONV_BY_SF = {"0.001": 50, "0.01": 2000, "0.1": 50000}


def n_conv_for_sf_dir(sf_dir: str) -> int:
    """Map a /root/testdata/sfX dir to the transcript scale (FIXTURES.md §1)."""
    tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if tag in _N_CONV_BY_SF:
        return _N_CONV_BY_SF[tag]
    try:
        return max(50, int(float(tag) * 500000))
    except ValueError:
        return 2000


def synth_transcripts(spark: SparkSession, n_conv: int,
                      partitions: int | None = None) -> DataFrame:
    """Distributed deterministic transcript table."""
    base = spark.range(0, n_conv, numPartitions=partitions)
    df = (
        base.select(F.col("id").alias("i"))
        .withColumn("n_turns", (F.col("i") % 8 + 1).cast("int"))
        .select("i", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1))
                .alias("turn_idx"))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("turn_idx") % 3 + 1).cast("int"))
    tool = F.when(
        F.col("turn_idx") % 3 == 2,
        F.element_at(
            F.array(F.lit("search"), F.lit("code"), F.lit("browse")),
            ((F.col("turn_idx") / 3).cast("int") % 3 + 1).cast("int")),
    ).otherwise(F.lit(""))
    k = F.when(F.col("i") % 5 == 0, F.lit(0)).otherwise(
        (F.col("i") * 7 + F.col("turn_idx") * 3) % 100).cast("int")
    conv_id = F.format_string("conv-%06d", F.col("i"))
    base_text = F.format_string(
        "%s turn %d of %s: discussing entity %d with café nuance.",
        role, F.col("turn_idx"), conv_id, k)
    payload = F.when(
        (F.col("i") + F.col("turn_idx")) % 5 == 0,
        F.format_string(
            ' <http://example.org/e/%d> <http://example.org/rel/mentions> "entity %d" .',
            k, k),
    ).otherwise(F.lit(""))
    ts = F.timestamp_seconds(
        F.lit(EPOCH_2026) + F.col("i") * 3600 + F.col("turn_idx") * 60)
    return df.select(
        conv_id.alias("conv_id"),
        F.col("turn_idx"),
        role.alias("role"),
        F.concat(base_text, payload).alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def synth_entities(spark: SparkSession, n_entities: int = N_ENTITIES) -> DataFrame:
    """Broadcastable entity dictionary (FIXTURES.md §4)."""
    return (
        spark.range(0, n_entities)
        .select(
            F.format_string("entity %d", F.col("id")).alias("mention_norm"),
            F.format_string(ENTITY_NS + "%d", F.col("id")).alias("entity_iri"),
            (1.0 - F.col("id") / n_entities).alias("score_prior"),
        )
    )


def synth_candidates(spark: SparkSession,
                     n_entities: int = N_ENTITIES) -> DataFrame:
    """Ambiguous candidate dictionary for link SCORING: every mention has
    a primary entity (prior 1 - k/n) and a decoy (prior (k mod 10)/20) —
    for large k the decoy outranks the primary, so disambiguation is
    non-trivial and arithmetically decidable (oracle-checkable)."""
    base = spark.range(0, n_entities).select(
        F.format_string("entity %d", F.col("id")).alias("mention_norm"),
        F.col("id").alias("k"))
    primary = base.select(
        "mention_norm",
        F.format_string(ENTITY_NS + "%d", F.col("k")).alias("entity_iri"),
        F.round(1.0 - F.col("k") / n_entities, 6).alias("score_prior"))
    decoy = base.select(
        "mention_norm",
        F.format_string("http://example.org/alt/%d", F.col("k")).alias("entity_iri"),
        F.round((F.col("k") % 10) / 20.0, 6).alias("score_prior"))
    return primary.unionByName(decoy)


def candidates_sql(n_entities: int = N_ENTITIES) -> str:
    return f"""
candidates AS (
  SELECT printf('entity %d', k) AS mention_norm,
         printf('{ENTITY_NS}%d', k) AS entity_iri,
         round(1.0 - k * 1.0 / {n_entities}, 6) AS score_prior
  FROM range(0, {n_entities}) t(k)
  UNION ALL
  SELECT printf('entity %d', k),
         printf('http://example.org/alt/%d', k),
         round((k % 10) / 20.0, 6)
  FROM range(0, {n_entities}) t(k)
)""".strip()


def transcripts_sql(n_conv: int) -> str:
    """DuckDB CTE reproducing ``synth_transcripts`` byte-for-byte.

    Emits a CTE named ``transcripts`` (columns conv_id, turn_idx, role,
    text, tool, ts, plus helper i, k) to prepend to oracle queries.
    """
    return f"""
transcripts AS (
  SELECT
    printf('conv-%06d', i) AS conv_id,
    j::INT AS turn_idx,
    ['user','assistant','tool'][(j % 3)::INT + 1] AS role,
    printf('%s turn %d of %s: discussing entity %d with café nuance.',
           ['user','assistant','tool'][(j % 3)::INT + 1], j,
           printf('conv-%06d', i), k)
      || CASE WHEN (i + j) % 5 = 0
              THEN printf(' <http://example.org/e/%d> <http://example.org/rel/mentions> "entity %d" .', k, k)
              ELSE '' END AS text,
    CASE WHEN j % 3 = 2
         THEN ['search','code','browse'][((j // 3) % 3)::INT + 1]
         ELSE '' END AS tool,
    TIMESTAMP '2026-01-01 00:00:00' + (i*3600 + j*60) * INTERVAL 1 SECOND AS ts,
    i, k
  FROM (
    SELECT i, j, CASE WHEN i % 5 = 0 THEN 0 ELSE (i*7 + j*3) % 100 END AS k
    FROM range(0, {n_conv}) r(i), range(0, 8) s(j)
    WHERE j < 1 + (i % 8)
  )
)""".strip()


def entities_sql(n_entities: int = N_ENTITIES) -> str:
    return f"""
entities AS (
  SELECT printf('entity %d', e) AS mention_norm,
         printf('{ENTITY_NS}%d', e) AS entity_iri,
         1.0 - e / {n_entities} AS score_prior
  FROM range(0, {n_entities}) t(e)
)""".strip()
