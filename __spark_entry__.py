"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction query at sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver compares against
at sf0.01. Transcript-based queries regenerate the deterministic transcript
corpus arithmetically on BOTH sides (Spark built-ins vs DuckDB range()), so
the oracle is fully independent of the Spark execution path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_go_spark.plans.pipeline import kg_triples
from rdf_go_spark.sources.transcripts import n_conv_for_sf_dir, synth_transcripts

N_CONV_ORACLE = 2000  # driver correctness scale (sf0.01, FIXTURES.md §1)


# ---------------------------------------------------------------------------
# KG pipeline queries
# ---------------------------------------------------------------------------

def _q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kg_triples(spark, sf_dir)


def _q_kg_conversation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn assembly: per-conversation aggregates under stable ordering."""
    t = synth_transcripts(spark, n_conv_for_sf_dir(sf_dir))
    return (
        t.groupBy("conv_id").agg(
            F.count("*").alias("n_turns"),
            F.count_distinct("role").alias("n_roles"),
            F.sum(F.length("text")).alias("total_chars"),
            F.date_format(F.max("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("last_ts"),
        )
    )


def _q_kg_entity_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-link aggregation (hot-key skewed groupBy over linked
    mentions). Computes the mention rule directly — Catalyst can't prune
    the other union branches (incl. the Python payload parse) out of the
    full kg_triples plan, so we don't make it try."""
    from rdf_go_spark.operators.linking import detect_mentions, link_broadcast
    from rdf_go_spark.sources.transcripts import synth_entities

    t = synth_transcripts(spark, n_conv_for_sf_dir(sf_dir))
    linked = link_broadcast(detect_mentions(t), synth_entities(spark))
    return (
        linked.groupBy(
            F.concat(F.lit("<"), F.col("entity_iri"), F.lit(">"))
            .alias("entity_iri"))
        .agg(F.count("*").alias("n_mentions"),
             F.count_distinct("conv_id").alias("n_convs"))
    )


def _q_kg_turn_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) window ordering — reassemble turns through a window
    and re-emit them; must equal the generator output byte-for-byte."""
    from pyspark.sql import Window
    t = synth_transcripts(spark, n_conv_for_sf_dir(sf_dir))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        t.withColumn("rn", F.row_number().over(w) - 1)
        .select("conv_id", F.col("rn").cast("int").alias("turn_idx"),
                "role", "text", "tool",
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_iso"))
    )


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


SAMPLE_FRACTIONS = {"src0": 0.2, "src1": 0.8, "src2": 1.0, "src3": 0.0}


def _training_data_queries():
    from rdf_go_spark.operators import (
        dedup, multimodal, sampling, similarity, textstats,
    )

    return {
        "doc_sample_stratified": lambda s, d: sampling.stratified_sample(
            _docs(s, d), fractions=SAMPLE_FRACTIONS),
        "corpus_mix_report": lambda s, d: sampling.corpus_mix_report(
            _docs(s, d)),
        # text analysis — all five profile operators (token/quality
        # stats, BPE pieces, lang-ID, md5 fingerprint, rolling hash)
        # fused into ONE corpus scan; each remains individually
        # oracle-tested in tests/test_training_ops.py
        "doc_text_profile": lambda s, d: textstats.text_profile(_docs(s, d)),
        # vocabulary / IDF-table build (map-side-combined term shuffle
        # + broadcast corpus size + TakeOrdered top-k)
        "corpus_term_stats": lambda s, d: textstats.term_stats(_docs(s, d)),
        "doc_exact_dedup": lambda s, d: textstats.exact_dedup(_docs(s, d)),
        # near-dup detection
        # df-capped candidates (scale guard for hot shingles); exact
        # Jaccard values on the candidate set — oracle applies same cap
        "dedup_ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(
            _docs(s, d), max_df=100),
        "dedup_minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(_docs(s, d)),
        "dedup_minhash_k128": lambda s, d: dedup.minhash_lsh_pairs(
            _docs(s, d), k=dedup.MINHASH_K_PROD, bands=dedup.LSH_BANDS_PROD),
        # md5-jvm: bit-identical to the pandas path (equivalence-tested)
        # with ZERO Python stages — the production plan, same oracle
        "dedup_simhash": lambda s, d: dedup.simhash(
            _docs(s, d), hash_family="md5-jvm"),
        "dedup_simhash_pairs": lambda s, d: dedup.simhash_pairs(
            _docs(s, d), hash_family="md5-jvm"),
        "dedup_clusters": lambda s, d: __import__(
            "rdf_go_spark.operators.components", fromlist=["x"])
            .dedup_clusters(dedup.minhash_lsh_pairs(_docs(s, d))),
        "dedup_keep_list": lambda s, d: __import__(
            "rdf_go_spark.operators.components", fromlist=["x"])
            .dedup_keep_list(_docs(s, d), dedup.minhash_lsh_pairs(_docs(s, d))),
        # similarity search
        "emb_cosine_topk": lambda s, d: similarity.cosine_topk(_emb(s, d)),
        # multi-probe: the query bucket + all N_PLANES one-bit-flip probes
        "emb_lsh_ann": lambda s, d: similarity.lsh_ann_topk(
            _emb(s, d), multiprobe=similarity.N_PLANES),
        # synthetic embeddings are near-orthogonal (no planted dups), so
        # the demo threshold sits below the production 0.95 to exercise
        # the candidate+verify path with non-empty output
        "emb_near_dup": lambda s, d: similarity.embedding_near_dup_pairs(
            _emb(s, d), threshold=0.25),
        "emb_ivf_ann": lambda s, d: similarity.ivf_ann_topk(_emb(s, d)),
        "emb_label_centroids": lambda s, d: similarity.label_centroids(_emb(s, d)),
        # multimodal plumbing
        "media_metadata": lambda s, d: multimodal.media_metadata(_docs(s, d)),
        "media_audio_frames": lambda s, d: multimodal.audio_frame_stats(_docs(s, d)),
        "media_video_samples": lambda s, d: multimodal.video_frame_sample(_docs(s, d)),
    }


def _analytics_queries():
    from rdf_go_spark.plans import analytics as A
    return {
        "pricing_summary": A.q_pricing_summary,
        "top_customers": A.q_top_customers,
        "events_user_stats": A.q_events_user_stats,
        "sessionize_events": A.q_sessionize_events,
        "orders_without_lineitems": A.q_orders_without_lineitems,
        "repeat_buyers": A.q_repeat_buyers,
    }


def _q_kg_export_ntriples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rdf_go_spark.plans.pipeline import kg_export_ntriples
    return kg_export_ntriples(spark, sf_dir)


def _q_rdf_parse_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rdf_go_spark.plans.pipeline import rdf_parse_multiformat
    return rdf_parse_multiformat(spark, sf_dir)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "kg_triples": _q_kg_triples,
    "kg_conversation_stats": _q_kg_conversation_stats,
    "kg_entity_mentions": _q_kg_entity_mentions,
    "kg_turn_text_roundtrip": _q_kg_turn_text_roundtrip,
    # kg_export_ntriples routes through a second canonicalization pass
    # (plans/pipeline.py) — this one hash row checks encoder line shape
    # AND canonicalization idempotence (formerly kg_canonical_roundtrip)
    "kg_export_ntriples": _q_kg_export_ntriples,
    "rdf_parse_multiformat": _q_rdf_parse_multiformat,
    "rdf_parse_quarantine": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .rdf_parse_quarantine(s, d)),
    "rdf_parse_graphs": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .rdf_parse_graphs(s, d)),
    "kg_partition_metrics": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_partition_metrics(s, d)),
    "kg_entity_link_scored": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_entity_link_scored(s, d)),
    "kg_two_hop": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_two_hop(s, d)),
    "kg_bgp_match": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_bgp_match(s, d)),
    "kg_property_path": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_property_path(s, d)),
    "kg_bgp_algebra": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_bgp_algebra(s, d)),
    "kg_sparql_select": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_sparql_select(s, d)),
    "kg_sparql_construct": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_sparql_construct(s, d)),
    "kg_sparql_describe": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_sparql_describe(s, d)),
    "kg_graph_provenance": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_graph_provenance(s, d)),
    "kg_sparql_builtins": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_sparql_builtins(s, d)),
    "kg_sparql_subquery": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_sparql_subquery(s, d)),
    "kg_sparql_path_star": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_sparql_path_star(s, d)),
    "kg_turn_reachability": (lambda s, d: __import__(
        "rdf_go_spark.plans.pipeline", fromlist=["x"])
        .kg_turn_reachability(s, d)),
    "kg_streaming_turn_metrics": (lambda s, d: __import__(
        "rdf_go_spark.streaming.pipeline", fromlist=["x"])
        .kg_streaming_turn_metrics(s, d)),
    "kg_streaming_prev_turn": (lambda s, d: __import__(
        "rdf_go_spark.streaming.pipeline", fromlist=["x"])
        .kg_streaming_prev_turn(s, d)),
    **_training_data_queries(),
    **_analytics_queries(),
}


def _build_oracles() -> dict[str, str]:
    from rdf_go_spark.operators import dedup, multimodal, textstats
    from rdf_go_spark.operators.similarity import (
        N_PLANES, cosine_topk_oracle, embedding_near_dup_oracle,
        ivf_ann_oracle, label_centroids_oracle, lsh_ann_oracle,
    )
    from rdf_go_spark.plans import analytics as A
    from rdf_go_spark.plans.oracles import kg_oracles

    oracles = kg_oracles(N_CONV_ORACLE)
    _streaming = __import__("rdf_go_spark.streaming.pipeline",
                            fromlist=["x"])
    oracles["kg_streaming_turn_metrics"] = \
        _streaming.kg_streaming_turn_metrics_oracle_sql(N_CONV_ORACLE)
    oracles["kg_streaming_prev_turn"] = \
        _streaming.kg_streaming_prev_turn_oracle_sql(N_CONV_ORACLE)
    oracles.update({
        "doc_text_profile": textstats.text_profile_oracle(),
        "corpus_term_stats": textstats.term_stats_oracle(),
        "doc_exact_dedup": textstats.exact_dedup_oracle(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_oracle(max_df=100),
        "dedup_minhash_lsh": dedup.minhash_lsh_oracle(),
        "dedup_minhash_k128": dedup.minhash_lsh_oracle(
            k=dedup.MINHASH_K_PROD, bands=dedup.LSH_BANDS_PROD),
        "dedup_clusters": __import__(
            "rdf_go_spark.operators.components", fromlist=["x"])
            .dedup_clusters_oracle(dedup.minhash_lsh_oracle()),
        "dedup_keep_list": __import__(
            "rdf_go_spark.operators.components", fromlist=["x"])
            .dedup_keep_list_oracle(dedup.minhash_lsh_oracle()),
        "dedup_simhash": dedup.simhash_oracle(),
        "dedup_simhash_pairs": dedup.simhash_pairs_oracle(),
        "emb_cosine_topk": cosine_topk_oracle(),
        "emb_lsh_ann": lsh_ann_oracle(multiprobe=N_PLANES),
        "emb_near_dup": embedding_near_dup_oracle(threshold=0.25),
        "emb_ivf_ann": ivf_ann_oracle(),
        "emb_label_centroids": label_centroids_oracle(),
        "media_metadata": multimodal.media_metadata_oracle(),
        "doc_sample_stratified": __import__(
            "rdf_go_spark.operators.sampling", fromlist=["x"])
            .stratified_sample_oracle(fractions=SAMPLE_FRACTIONS),
        "corpus_mix_report": __import__(
            "rdf_go_spark.operators.sampling", fromlist=["x"])
            .corpus_mix_report_oracle(),
        "media_audio_frames": multimodal.audio_frame_stats_oracle(),
        "media_video_samples": multimodal.video_frame_sample_oracle(),
        "pricing_summary": A.q_pricing_summary_oracle(),
        "top_customers": A.q_top_customers_oracle(),
        "events_user_stats": A.q_events_user_stats_oracle(),
        "sessionize_events": A.q_sessionize_events_oracle(),
        "orders_without_lineitems": A.q_orders_without_lineitems_oracle(),
        "repeat_buyers": A.q_repeat_buyers_oracle(),
    })
    return oracles


ORACLES: dict[str, str] = _build_oracles()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on the smoke-scale corpus; driver checks rows>0."""
    return kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
