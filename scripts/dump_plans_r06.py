#!/usr/bin/env python
"""Dump .explain('formatted') for every bench-headline query into
plans/r06/<query>_<tag>.txt (optimization-round evidence).

Usage: python scripts/dump_plans_r06.py <tag>     # tag = before | after
Plans are captured at sf0.1 (plan SHAPE is scale-independent; the bench
tables are built once into tables named like bench.py's own).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sys.path.insert(0, REPO)
    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from rdf_go_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r06")
    qdict = entry.queries()

    def formatted(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")

    plans = {}

    for name in ("kg_triples", "kg_entity_mentions",
                 "kg_conversation_stats", "dedup_minhash_lsh",
                 "dedup_minhash_k128", "dedup_simhash", "emb_cosine_topk",
                 "doc_text_profile", "pricing_summary", "top_customers",
                 "sessionize_events"):
        plans[name] = formatted(qdict[name](spark, SF))

    # bench.py's split build/query pairs, on the same tables it uses
    from rdf_go_spark.operators.graph import (
        materialize_adjacency, materialize_bucketed, two_hop_census,
    )
    from rdf_go_spark.operators.paths import path_pairs
    from rdf_go_spark.plans.pipeline import _PATH_EXPR, kg_triples

    t = kg_triples(spark, SF).select("subj", "pred", "obj", "obj_is_literal")
    by_subj, by_obj = materialize_adjacency(t, "kg_graph", n_buckets=8)
    plans["kg_two_hop"] = formatted(two_hop_census(spark, by_subj, by_obj))

    t2 = kg_triples(spark, SF).select("subj", "pred", "obj")
    materialize_bucketed(t2, "kg_path_graph", n_buckets=8)
    plans["kg_property_path"] = formatted(
        path_pairs(spark.table("kg_path_graph"), _PATH_EXPR))

    # closure round-0 plan (the iterative part localCheckpoint hides)
    from rdf_go_spark.operators import components
    edges = (spark.table("kg_path_graph")
             .filter(F.col("pred") == "<http://example.org/v/prevTurn>")
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    components.transitive_closure_pairs(edges).count()
    plans["closure_round0"] = components.LAST_ITERATION_PLANS.get(
        "transitive_closure_pairs", "(not captured)")

    for name, text in plans.items():
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text if text.endswith("\n") else text + "\n")
        print(f"wrote {path} ({len(text)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
