#!/usr/bin/env python
"""Per-stage isolation benchmarks (guide §1.4: noop sink, labeled jobs).

NOT the driver bench — bench.py stays frozen. This tool times individual
sub-stages of the headline queries so optimization work targets the
right operator. Usage:

  SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf1 python bench_extra.py [probe ...]

Prints one line per probe: "<probe>  <best>s  (runs: a, b)". Probes run
best-of-2 in one session after a warm-up, mirroring bench.py methodology.
"""

from __future__ import annotations

import os
import sys
import time


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from rdf_go_spark.session import get_spark
    from rdf_go_spark.sources.transcripts import (
        n_conv_for_sf_dir, synth_entities, synth_transcripts,
    )

    spark = get_spark(app_name="bench_extra")
    sc = spark.sparkContext
    n_conv = n_conv_for_sf_dir(sf_dir)

    def transcripts():
        return synth_transcripts(spark, n_conv)

    def triples():
        from rdf_go_spark.plans.pipeline import kg_triples
        return kg_triples(spark, sf_dir)

    def docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def emb():
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # ---- probe definitions: name -> zero-arg callable that runs an action
    def p_transcripts():
        noop(transcripts())

    def p_extract_structural():
        from rdf_go_spark.operators.extraction import extract_triples
        noop(extract_triples(transcripts(), synth_entities(spark),
                             include_payload=False))

    def p_extract_payload_only():
        from rdf_go_spark.operators.extraction import (
            TRIPLE_SCHEMA, _parse_payload_batches,
        )
        t = transcripts()
        payload_rows = t.filter(F.col("text").contains(" <http"))
        parsed = payload_rows.select("conv_id", "turn_idx", "text") \
            .mapInPandas(_parse_payload_batches, schema=TRIPLE_SCHEMA)
        noop(parsed)

    def p_kg_triples():
        noop(triples())

    def p_two_hop_build():
        from rdf_go_spark.operators.graph import materialize_adjacency
        t = triples().select("subj", "pred", "obj", "obj_is_literal")
        materialize_adjacency(t, "bx_graph", n_buckets=8)

    def p_two_hop_build_from_parquet():
        # write cost alone: input pre-materialized to plain parquet
        from rdf_go_spark.operators.graph import materialize_adjacency
        pre = "/tmp/bx_pre_triples"
        if not os.path.isdir(pre):
            (triples().select("subj", "pred", "obj", "obj_is_literal")
             .write.mode("overwrite").parquet(pre))
        materialize_adjacency(spark.read.parquet(pre), "bx_graph2",
                              n_buckets=8)

    def p_two_hop_census():
        from rdf_go_spark.operators.graph import (
            materialize_adjacency, two_hop_census,
        )
        if not spark.catalog.tableExists("bx_graph_by_subj"):
            t = triples().select("subj", "pred", "obj", "obj_is_literal")
            materialize_adjacency(t, "bx_graph", n_buckets=8)
        noop(two_hop_census(spark, "bx_graph_by_subj", "bx_graph_by_obj"))

    def p_path_build():
        from rdf_go_spark.operators.graph import materialize_bucketed
        t = triples().select("subj", "pred", "obj")
        materialize_bucketed(t, "bx_path_graph", n_buckets=8)

    def _ensure_path_graph():
        from rdf_go_spark.operators.graph import materialize_bucketed
        if not spark.catalog.tableExists("bx_path_graph"):
            t = triples().select("subj", "pred", "obj")
            materialize_bucketed(t, "bx_path_graph", n_buckets=8)
        return spark.table("bx_path_graph")

    def p_path_closure_only():
        from rdf_go_spark.operators.components import (
            transitive_closure_pairs,
        )
        g = _ensure_path_graph()
        edges = (g.filter(F.col("pred") == "<http://example.org/v/prevTurn>")
                 .select(F.col("subj").alias("src"),
                         F.col("obj").alias("dst")))
        noop(transitive_closure_pairs(edges))

    def p_path_pairs():
        from rdf_go_spark.operators.paths import path_pairs
        from rdf_go_spark.plans.pipeline import _PATH_EXPR
        g = _ensure_path_graph()
        path_pairs(g, _PATH_EXPR).count()

    def p_minhash_shingles():
        from rdf_go_spark.operators.dedup import shingles
        noop(shingles(docs()))

    def p_minhash_sigs_k128():
        from rdf_go_spark.operators.dedup import (
            minhash_wide_signatures, shingles,
        )
        noop(minhash_wide_signatures(shingles(docs()), k=128))

    def p_minhash_k128():
        from rdf_go_spark.operators import dedup
        dedup.minhash_lsh_pairs(docs(), k=128, bands=16).count()

    def p_minhash_k16():
        from rdf_go_spark.operators import dedup
        dedup.minhash_lsh_pairs(docs()).count()

    def p_simhash():
        from rdf_go_spark.operators import dedup
        dedup.simhash(docs(), hash_family="md5-jvm").count()

    def p_cosine_topk():
        from rdf_go_spark.operators.similarity import cosine_topk
        noop(cosine_topk(emb()))

    def p_reachability():
        from rdf_go_spark.operators.components import transitive_closure
        t = triples()
        edges = (t.filter(
            F.col("pred") == "<http://example.org/v/prevTurn>")
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
        noop(transitive_closure(edges))

    probes = {k[2:]: v for k, v in list(locals().items())
              if k.startswith("p_") and callable(v)}
    names = sys.argv[1:] or list(probes)

    # warm-up (codegen + python workers) on the smoke corpus
    from rdf_go_spark.plans.pipeline import kg_triples as _kt
    _kt(spark, "/root/testdata/sf0.001").count()

    results = {}
    for name in names:
        fn = probes[name]
        runs = []
        for i in range(2):
            sc.setJobDescription(f"bench_extra:{name}#{i}")
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
        results[name] = runs
        print(f"{name:28s} {min(runs):8.3f}s  (runs: "
              f"{', '.join(str(r) for r in runs)})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
