#!/usr/bin/env python
"""Headline benchmark: runs the flagship KG queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: triples_per_sec (throughput of the flagship extraction) and
n_conv / n_triples for context. Set SPARK_GRAFT_BENCH_QUERIES to a
comma-separated subset to iterate faster.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from rdf_go_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="rdf_go_spark_bench")
    qdict = entrymod.queries()
    # headline subset: one per operator family (full list via env override)
    default_names = [
        "kg_triples", "kg_entity_mentions", "kg_conversation_stats",
        "kg_two_hop", "kg_property_path",
        "dedup_minhash_lsh", "dedup_minhash_k128", "dedup_simhash",
        "emb_cosine_topk",
        "doc_text_profile", "pricing_summary", "top_customers",
        "sessionize_events",
    ]
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = [n.strip() for n in subset.split(",")] if subset \
        else [n for n in default_names if n in qdict]

    # warm-up: compile codegen + start python workers on a tiny corpus so
    # the measurements reflect steady-state task throughput, not JIT
    for warm in ("kg_triples", "dedup_minhash_lsh", "emb_cosine_topk"):
        try:
            qdict[warm](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    # best-of-2 per query: the VM has bursty co-tenant noise (2-4x on the
    # same job); a single sample conflates the engine with the neighbor
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name in names:
        if name == "kg_two_hop":
            # build (one-time adjacency-table materialization) and query
            # (the census itself) are separate production phases — timing
            # them together reads as query regression (round-3 finding)
            from rdf_go_spark.operators.graph import (
                materialize_adjacency, two_hop_census,
            )
            from rdf_go_spark.plans.pipeline import kg_triples
            best_b, best_c = None, None
            for _ in range(2):
                t = kg_triples(spark, sf_dir).select(
                    "subj", "pred", "obj", "obj_is_literal")
                t0 = time.perf_counter()
                by_subj, by_obj = materialize_adjacency(
                    t, "kg_graph", n_buckets=8)
                dtb = time.perf_counter() - t0
                t0 = time.perf_counter()
                n = two_hop_census(spark, by_subj, by_obj).count()
                dtc = time.perf_counter() - t0
                best_b = dtb if best_b is None or dtb < best_b else best_b
                best_c = dtc if best_c is None or dtc < best_c else best_c
            timings["kg_two_hop_build"] = round(best_b, 3)
            timings["kg_two_hop"] = round(best_c, 3)
            counts["kg_two_hop"] = n
            continue
        if name == "kg_property_path":
            # same build/query split: the bucketed graph table is a
            # one-time materialization; the path evaluation is the query
            from rdf_go_spark.operators.graph import materialize_bucketed
            from rdf_go_spark.operators.paths import path_pairs
            from rdf_go_spark.plans.pipeline import _PATH_EXPR, kg_triples
            best_b, best_c = None, None
            for _ in range(2):
                t = kg_triples(spark, sf_dir).select("subj", "pred", "obj")
                t0 = time.perf_counter()
                materialize_bucketed(t, "kg_path_graph", n_buckets=8)
                dtb = time.perf_counter() - t0
                t0 = time.perf_counter()
                n = path_pairs(spark.table("kg_path_graph"),
                               _PATH_EXPR).count()
                dtc = time.perf_counter() - t0
                best_b = dtb if best_b is None or dtb < best_b else best_b
                best_c = dtc if best_c is None or dtc < best_c else best_c
            timings["kg_property_path_build"] = round(best_b, 3)
            timings["kg_property_path"] = round(best_c, 3)
            counts["kg_property_path"] = n
            continue
        fn = qdict[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        counts[name] = n

    # production-hash delta: the same k=128/16-band MinHash with the
    # xxhash64 family (JVM hash, identical plan) — timed for comparison
    # with the portable-md5/DECIMAL oracle setting, not a driver query
    xxh_sec = None
    if "dedup_minhash_k128" in names:
        from rdf_go_spark.operators import dedup
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for _ in range(2):
            t0 = time.perf_counter()
            dedup.minhash_lsh_pairs(docs, k=dedup.MINHASH_K_PROD,
                                    bands=dedup.LSH_BANDS_PROD,
                                    hash_family="xxhash64").count()
            dt = round(time.perf_counter() - t0, 3)
            xxh_sec = dt if xxh_sec is None or dt < xxh_sec else xxh_sec

    total = round(sum(timings.values()), 3)
    n_triples = counts.get("kg_triples", 0)
    tps = round(n_triples / timings["kg_triples"], 1) if timings.get("kg_triples") else None
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "rows": counts,
        "triples_per_sec": tps,
    }
    if xxh_sec is not None:
        out["minhash_k128_xxhash64_sec"] = xxh_sec
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
