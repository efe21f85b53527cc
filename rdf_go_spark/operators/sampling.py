"""Corpus sampling / mixing operators for training-data pipelines.

Sampling a web-scale corpus must be DETERMINISTIC (resumable jobs,
reproducible training mixes, auditable membership) — so no RNG: a
document is kept iff ``hash31("salt|doc_id") / M < fraction(source)``.
The same md5-derived 31-bit hash used across the dedup family makes the
decision bit-exact in the DuckDB oracle, stable under reruns and
partitioning changes, and re-derivable per document (membership proofs).

At 100 TB both operators are a single scan: the sample is a pure filter
(predicate on hash arithmetic — no shuffle at all), the mix report is
one groupBy plus a broadcast-sized total.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import M31, _hash31
from .textstats import _TOKEN_RE

SAMPLE_SALT = "sample"


def _uniform(col, salt: str):
    """Deterministic U[0,1) per key: 31-bit md5 hash scaled."""
    return _hash31(F.concat(F.lit(salt + "|"), col.cast("string"))) \
        / F.lit(float(M31))


def stratified_sample(docs: DataFrame,
                      fractions: Optional[Dict[str, float]] = None,
                      default_fraction: float = 0.5,
                      salt: str = SAMPLE_SALT) -> DataFrame:
    """Per-source stratified sample: keep a document iff its
    deterministic uniform falls under its source's target fraction.
    Zero shuffles — the whole operator is a filter."""
    fractions = fractions or {}
    frac = F.lit(float(default_fraction))
    for src, f in sorted(fractions.items()):
        frac = F.when(F.col("source") == src, F.lit(float(f))).otherwise(frac)
    u = _uniform(F.col("doc_id"), salt)
    return (docs.withColumn("u", F.round(u, 6))
            .filter(u < frac)
            .select("doc_id", "source", "lang", "u"))


def stratified_sample_oracle(table: str = "documents",
                             fractions: Optional[Dict[str, float]] = None,
                             default_fraction: float = 0.5,
                             salt: str = SAMPLE_SALT) -> str:
    fractions = fractions or {}
    frac = str(float(default_fraction))
    for src, f in sorted(fractions.items()):
        frac = f"CASE WHEN source = '{src}' THEN {float(f)} ELSE {frac} END"
    u = (f"(md5_number_lower('{salt}|' || doc_id::VARCHAR) & 2147483647)"
         f" / {float(M31)}")
    return f"""
SELECT doc_id, source, lang, round({u}, 6) AS u
FROM {table}
WHERE {u} < {frac}
""".strip()


def corpus_mix_report(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) corpus composition: document and token counts
    plus each cell's share of total tokens — the numbers a training-mix
    designer weights against. One groupBy; the global total is an
    unpartitioned window over the (tiny) aggregate, not the data."""
    toks = F.size(F.array_remove(
        F.split(F.lower(F.col("text")), _TOKEN_RE), ""))
    agg = (docs.withColumn("n_toks", toks)
           .groupBy("source", "lang")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_toks").alias("n_tokens")))
    total = F.sum("n_tokens").over(Window.partitionBy())
    return agg.select(
        "source", "lang", "n_docs", "n_tokens",
        F.round(F.col("n_tokens") / total, 6).alias("token_share"))


def corpus_mix_report_oracle(table: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT source, lang,
         count(*)::BIGINT AS n_docs,
         sum(len(list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                             x -> x <> '')))::BIGINT AS n_tokens
  FROM {table} GROUP BY 1, 2
)
SELECT source, lang, n_docs, n_tokens,
       round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS token_share
FROM t
""".strip()
