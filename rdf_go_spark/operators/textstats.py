"""Text-analysis operators for training-data pipelines over the
``documents`` table — all JVM-side column expressions (whole-stage codegen,
zero Python on the hot path), each with an exact DuckDB oracle twin.

Operators: token counting (whitespace + a BPE-ish pre-tokenizer regex),
quality scoring (length/punct/stopword ratios), n-gram language ID
heuristic, document fingerprinting (normalized-md5 + order-sensitive
polynomial rolling hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny embedded stopword list for the language-ID heuristic; the regexes
# below must stay in lockstep with the SQL in oracles
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]
_EN_RE = r"\b(the|a|of|and|to|in|is|for|on|with)\b"
_PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"
_TOKEN_RE = r"[^a-z0-9]+"


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token/char/punct stats + a quality score.

    quality = min(1, tokens/100) * (1 - punct_ratio) — a simple
    length × cleanliness heuristic; scores are rounded for cross-engine
    float stability.
    """
    toks = F.split(F.lower(F.col("text")), _TOKEN_RE)
    n_tokens = F.size(F.array_remove(toks, ""))
    n_chars = F.length("text")
    n_punct = F.size(F.split(F.col("text"), _PUNCT_RE)) - 1
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    quality = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * (1 - punct_ratio), 6)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_computed"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


def token_stats_oracle(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                       x -> x <> ''))::BIGINT AS n_tokens,
       length(text)::INT AS n_chars_computed,
       round((len(regexp_split_to_array(text, '[.,;:!?''"()\\[\\]{{}}-]')) - 1)
             * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,
       round(least(len(list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                                   x -> x <> '')) / 100.0, 1.0)
             * (1 - round((len(regexp_split_to_array(text, '[.,;:!?''"()\\[\\]{{}}-]')) - 1)
                          * 1.0 / greatest(length(text), 1), 6)), 6) AS quality
FROM {table}
""".strip()


# GPT-2-style pre-tokenizer, restricted to the regex subset Java regex
# and RE2 (DuckDB) evaluate identically: contraction suffixes, space-
# prefixed letter/digit runs, space-prefixed punctuation runs, whitespace.
# (The original's \p{L}/\p{N} classes and the (?!\S) lookahead are
# avoided — RE2 has no lookahead and unicode classes differ at the edges.
# \s is spelled as an explicit class because the engines disagree on it:
# Java's \s includes vertical tab \x0B, RE2's does not.)
_BPE_WS = r" \t\n\x0B\f\r"
_BPE_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+"
           r"| ?[^a-zA-Z0-9" + _BPE_WS + r"]+|[" + _BPE_WS + r"]+")


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Subword-style token accounting: pieces under the BPE-ish
    pre-tokenizer vs whitespace words, plus fertility (pieces per word —
    the metric that prices a corpus in tokens). Pure column expressions;
    regexp_extract_all stays in codegen."""
    pieces = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    words = F.array_remove(F.split(F.lower(F.col("text")), _TOKEN_RE), "")
    n_pieces = F.size(pieces)
    n_words = F.size(words)
    return docs.select(
        "doc_id",
        n_pieces.alias("n_pieces"),
        n_words.alias("n_words"),
        F.round(n_pieces / F.greatest(n_words, F.lit(1)), 6)
        .alias("fertility"),
        F.round(F.length("text") / F.greatest(n_pieces, F.lit(1)), 6)
        .alias("chars_per_piece"),
    )


def bpe_token_stats_oracle(table: str = "documents") -> str:
    bpe_sql = _BPE_RE.replace("'", "''")
    return f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{bpe_sql}'))::INT AS n_pieces,
         len(list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                         x -> x <> ''))::INT AS n_words,
         length(text) AS n_chars
  FROM {table}
)
SELECT doc_id, n_pieces, n_words,
       round(n_pieces * 1.0 / greatest(n_words, 1), 6) AS fertility,
       round(n_chars * 1.0 / greatest(n_pieces, 1), 6) AS chars_per_piece
FROM t
""".strip()


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram-free heuristic language ID: ratio of English stopword hits
    to tokens; >= 0.05 → 'en', else 'unk'. (A real model is out of scope;
    the shape — pure column expr, broadcastable wordlist — is the point.)"""
    toks = F.size(F.array_remove(F.split(F.lower(F.col("text")), _TOKEN_RE), ""))
    # stopword matches = split-count minus one (pure column expression)
    hits = F.size(F.split(F.lower(F.col("text")), _EN_RE)) - 1
    ratio = F.round(hits / F.greatest(toks, F.lit(1)), 6)
    return docs.select(
        "doc_id", "lang",
        hits.alias("sw_hits"),
        ratio.alias("sw_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk"))
        .alias("lang_pred"),
    )


def lang_id_oracle(table: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT doc_id, lang,
    len(list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                    x -> x <> ''))::INT AS toks,
    (len(regexp_split_to_array(lower(text), '{_EN_RE.replace("'", "''")}')) - 1)::INT AS hits
  FROM {table}
)
SELECT doc_id, lang, hits AS sw_hits,
       round(hits * 1.0 / greatest(toks, 1), 6) AS sw_ratio,
       CASE WHEN round(hits * 1.0 / greatest(toks, 1), 6) >= 0.05
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM t
""".strip()


def fingerprint(docs: DataFrame) -> DataFrame:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text. Deterministic and identical in any engine
    with md5 — the basis for exact dedup."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), _TOKEN_RE, " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def fingerprint_oracle(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '{_TOKEN_RE}', ' ', 'g'))) AS fp
FROM {table}
""".strip()


ROLL_B = 131
ROLL_M = (1 << 31) - 1


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-SENSITIVE polynomial rolling hash over the token stream:
    ``h = fold(tokens, acc -> (acc*B + hash31(tok)) % M)`` — unlike the
    normalized-md5 fingerprint, token reordering changes it, so it
    distinguishes shuffled near-copies. All arithmetic in plain LONG
    (max acc*B + h < 2^39), portable to the DuckDB oracle via
    list_reduce over the same md5-derived 31-bit token hashes."""
    from .dedup import _hash31

    toks = F.array_remove(F.split(F.lower(F.col("text")), _TOKEN_RE), "")
    hashes = F.transform(toks, lambda t: _hash31(t))
    roll = F.aggregate(
        hashes, F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * ROLL_B + x, F.lit(ROLL_M)))
    return docs.select("doc_id", roll.alias("roll_fp"))


def rolling_fingerprint_oracle(table: str = "documents") -> str:
    # The fold is seeded with a prepended 0 so DuckDB's list_reduce
    # (which otherwise keeps the FIRST element unreduced) applies the
    # % M step to every element exactly like Spark's F.aggregate from
    # acc=0 — without the seed, a first token hashing to exactly M31
    # would stay M31 in DuckDB but fold to 0 in Spark. The [0]-seed
    # also makes the empty-token case yield 0 with no CASE needed.
    return f"""
WITH t AS (
  SELECT doc_id,
         list_transform(
           list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                       x -> x <> ''),
           tok -> (md5_number_lower(tok) & 2147483647)::BIGINT) AS hs
  FROM {table}
)
SELECT doc_id,
       list_reduce([0::BIGINT] || hs,
                   (a, x) -> (a * {ROLL_B} + x) % {ROLL_M})::BIGINT AS roll_fp
FROM t
""".strip()


def text_profile(docs: DataFrame) -> DataFrame:
    """All five per-document text-analysis operators in ONE scan:
    token/quality stats, BPE-piece accounting, language-ID, normalized
    fingerprint, and the order-sensitive rolling hash. Every column is
    a pure JVM expression over the same ``text`` value, so fusing them
    costs nothing and saves four extra scans of the corpus — at 100 TB
    the scan IS the cost, so profile passes must be single-scan."""
    from .dedup import _hash31

    toks = F.array_remove(F.split(F.lower(F.col("text")), _TOKEN_RE), "")
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.size(F.split(F.col("text"), _PUNCT_RE)) - 1
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    quality = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * (1 - punct_ratio), 6)
    pieces = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    n_pieces = F.size(pieces)
    hits = F.size(F.split(F.lower(F.col("text")), _EN_RE)) - 1
    sw_ratio = F.round(hits / F.greatest(n_tokens, F.lit(1)), 6)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), _TOKEN_RE, " "))
    hashes = F.transform(toks, lambda t: _hash31(t))
    roll = F.aggregate(
        hashes, F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * ROLL_B + x, F.lit(ROLL_M)))
    return docs.select(
        "doc_id", "lang",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_computed"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
        n_pieces.alias("n_pieces"),
        F.round(n_pieces / F.greatest(n_tokens, F.lit(1)), 6)
        .alias("fertility"),
        F.round(n_chars / F.greatest(n_pieces, F.lit(1)), 6)
        .alias("chars_per_piece"),
        hits.alias("sw_hits"),
        sw_ratio.alias("sw_ratio"),
        F.when(sw_ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk"))
        .alias("lang_pred"),
        F.md5(norm).alias("fp"),
        roll.alias("roll_fp"),
    )


def text_profile_oracle(table: str = "documents") -> str:
    """Twin = the five per-operator oracles joined on doc_id (DuckDB
    flattens the CTEs; values must match the fused Spark scan exactly)."""
    return f"""
WITH tok AS ({token_stats_oracle(table)}),
     bpe AS ({bpe_token_stats_oracle(table)}),
     lng AS ({lang_id_oracle(table)}),
     fpr AS ({fingerprint_oracle(table)}),
     rol AS ({rolling_fingerprint_oracle(table)})
SELECT tok.doc_id, lng.lang, tok.n_tokens, tok.n_chars_computed,
       tok.punct_ratio, tok.quality, bpe.n_pieces,
       round(bpe.n_pieces * 1.0 / greatest(tok.n_tokens, 1), 6)
         AS fertility,
       bpe.chars_per_piece, lng.sw_hits, lng.sw_ratio, lng.lang_pred,
       fpr.fp, rol.roll_fp
FROM tok
JOIN bpe ON tok.doc_id = bpe.doc_id
JOIN lng ON tok.doc_id = lng.doc_id
JOIN fpr ON tok.doc_id = fpr.doc_id
JOIN rol ON tok.doc_id = rol.doc_id
""".strip()


def term_stats(docs: DataFrame, k: int = 30) -> DataFrame:
    """Corpus vocabulary statistics — the tokenizer/IDF-table build job:
    per term, total occurrences, document frequency, and IDF, top-k by
    occurrence count (term as the deterministic tie-break).

    The 100 TB shape: explode → groupBy(term) runs with map-side partial
    aggregation (the shuffle carries one row per term per partition, not
    one per token), document frequency rides the same shuffle via
    count_distinct, the corpus size joins in as a broadcast 1-row
    aggregate, and the final top-k is TakeOrderedAndProject (per-
    partition heaps, no global sort shuffle)."""
    toks = F.explode(
        F.array_remove(F.split(F.lower(F.col("text")), _TOKEN_RE), "")
    ).alias("term")
    stats = (docs.select("doc_id", toks)
             .groupBy("term")
             .agg(F.count("*").alias("n_occurrences"),
                  F.count_distinct("doc_id").alias("n_docs")))
    total = docs.agg(F.count("*").alias("n_total"))
    return (stats.crossJoin(F.broadcast(total))
            .select("term", "n_occurrences", "n_docs",
                    F.round(F.log((F.col("n_total") + 1.0)
                                  / (F.col("n_docs") + 1.0)), 6)
                    .alias("idf"))
            .orderBy(F.col("n_occurrences").desc(), F.col("term"))
            .limit(k))


def term_stats_oracle(table: str = "documents", k: int = 30) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '{_TOKEN_RE}'),
                            x -> x <> '')) AS term
  FROM {table}
),
s AS (
  SELECT term, count(*)::BIGINT AS n_occurrences,
         count(DISTINCT doc_id)::BIGINT AS n_docs
  FROM t GROUP BY term
),
n AS (SELECT count(*)::BIGINT AS n_total FROM {table})
SELECT term, n_occurrences, n_docs,
       round(ln((n_total + 1.0) / (n_docs + 1.0)), 6) AS idf
FROM s, n
ORDER BY n_occurrences DESC, term
LIMIT {k}
""".strip()


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content fingerprint: keep min doc_id,
    count group size. hash-groupBy — one shuffle on the fingerprint,
    map-side partial aggregation for free."""
    fp = fingerprint(docs)
    return (fp.groupBy("fp")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_members"))
            .filter(F.col("n_members") >= 1))


def exact_dedup_oracle(table: str = "documents") -> str:
    return f"""
SELECT md5(trim(regexp_replace(lower(text), '{_TOKEN_RE}', ' ', 'g'))) AS fp,
       min(doc_id) AS keep_doc_id,
       count(*)::BIGINT AS n_members
FROM {table} GROUP BY 1
""".strip()
