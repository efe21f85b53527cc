"""Entity-linking join strategies with explicit skew handling.

The generator sends ~20% of all mentions to a single hot entity
(transcripts.py k-rule), which is exactly the pathological key for a
shuffle join. Three strategies, selected by dictionary size:

1. ``broadcast`` — dictionary fits the broadcast threshold (the common
   case: entity dictionaries are ~10^6 rows): zero shuffle of the fact
   side. extraction.py uses this.
2. ``salted`` — dictionary too big to broadcast AND keys skewed: fact
   rows get a salt from hash(conv_id); the dictionary side is exploded
   ×N_SALT so every (mention, salt) bucket joins a roughly even share.
   Classic salting, AQE-independent.
3. ``shuffle`` — plain sort-merge/shuffle-hash join with AQE skew-join
   splitting (spark.sql.adaptive.skewJoin.enabled, session default) as
   the backstop.

All three produce identical rows — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALT = 8


def detect_mentions(transcripts: DataFrame) -> DataFrame:
    """JVM-regex mention detection; one row per turn with a mention."""
    return (transcripts
            .withColumn("mention_norm",
                        F.concat(F.lit("entity "),
                                 F.regexp_extract("text", r"entity ([0-9]+)", 1)))
            .filter(F.col("mention_norm") != "entity "))


def detect_mentions_pandas(transcripts: DataFrame) -> DataFrame:
    """Arrow-batched pandas-UDF variant of mention detection (the north
    star's "vectorized pandas/Arrow UDFs perform batched mention
    detection"): vectorized ``Series.str.extract`` over each batch.
    Result-identical to the JVM-regex path (asserted in tests); the JVM
    path remains the default because it needs no Python at all."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _extract(text):
        hits = text.str.extract(r"entity ([0-9]+)", expand=False)
        return ("entity " + hits).where(hits.notna(), None)

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't resolve in local scope — attach real ones
    _extract.__annotations__ = {"text": pd.Series, "return": pd.Series}
    extract_mention = pandas_udf(_extract, "string")

    return (transcripts
            .withColumn("mention_norm", extract_mention(F.col("text")))
            .filter(F.col("mention_norm").isNotNull()))


def link_broadcast(mentions: DataFrame, entities: DataFrame) -> DataFrame:
    return mentions.join(F.broadcast(entities), "mention_norm", "inner")


def link_scored(mentions: DataFrame, candidates: DataFrame) -> DataFrame:
    """Entity-link SCORING: when a mention has several candidate entities,
    keep the argmax by (score_prior DESC, entity_iri ASC) per
    (conv_id, turn_idx, mention) — broadcast candidate join + window
    top-1, the disambiguation shape of the north star."""
    from pyspark.sql import Window
    joined = mentions.join(F.broadcast(candidates), "mention_norm", "inner")
    w = Window.partitionBy("conv_id", "turn_idx", "mention_norm").orderBy(
        F.col("score_prior").desc(), F.col("entity_iri").asc())
    return (joined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))


def link_shuffle(mentions: DataFrame, entities: DataFrame) -> DataFrame:
    """Shuffle join (AQE skew-split backstop). hint('shuffle_hash') keeps
    Catalyst from choosing broadcast so the strategy is actually exercised."""
    return mentions.join(entities.hint("shuffle_hash"), "mention_norm", "inner")


def link_salted(mentions: DataFrame, entities: DataFrame,
                n_salt: int = N_SALT) -> DataFrame:
    """Salted equi-join: fact side salts by conv hash; dim side explodes
    ×n_salt. Join key becomes (mention_norm, salt) — the hot entity's rows
    spread over n_salt shuffle partitions."""
    salted_facts = mentions.withColumn(
        "salt", F.pmod(F.hash("conv_id"), F.lit(n_salt)).cast("int"))
    salted_dim = entities.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))) \
        .withColumn("salt", F.col("salt").cast("int"))
    out = salted_facts.join(salted_dim.hint("shuffle_hash"),
                            ["mention_norm", "salt"], "inner")
    return out.drop("salt")
