#!/usr/bin/env python
"""Deterministic sf1 dataset generator (scale evidence for BENCH).

/root/testdata ships sf{0.001,0.01,0.1} and is read-only, so sf1 is
derived locally: every parquet table becomes 10 key-shifted copies of
its sf0.1 twin (fact keys offset per copy so joins keep their
selectivity; document text gets a per-copy suffix token so the near-dup
structure scales instead of exploding into 10-way exact-dup cliques;
embeddings get a tiny per-copy first-dim nudge so cosine ties do not
multiply). Dimension tables (nation/region/part/supplier/customer) and
transcripts are NOT what the scaling probe measures — transcripts are
arithmetic (n_conv_for_sf_dir('sf1') = 500000) and dims stay broadcast-
small by design, exactly as a 100 TB layout would keep them.

Usage: python scripts/gen_sf1.py [out_root]   (default /root/repo/.bench)
Writes <out_root>/sf1/*.parquet. Idempotent (overwrite).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"
COPIES = 10

# per-copy row offsets chosen >= table cardinality at sf0.1
OFFSETS = {  # >= table key range at sf0.1 (max o/l_orderkey 149999,
    "documents": ("doc_id", 5_000),          # max event_id 99999,
    "embeddings": ("vec_id", 2_000),         # max doc_id 4999, vec_id 1999)
    "orders": ("o_orderkey", 200_000),
    "lineitem": ("l_orderkey", 200_000),
    "events": ("event_id", 100_000),
}


def replicate(df: DataFrame, table: str) -> DataFrame:
    copies = df.crossJoin(
        F.broadcast(df.sparkSession.range(COPIES).select(
            F.col("id").alias("_copy"))))
    key, off = OFFSETS[table]
    out = copies.withColumn(key, F.col(key) + F.col("_copy") * off)
    if table == "documents":
        # keep near-dup structure: copies are distinct docs, not clones
        out = out.withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" copyvariant"),
                         F.col("_copy").cast("string"))))
    elif table == "embeddings":
        out = out.withColumn(
            "embedding",
            F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.array((F.element_at("embedding", 1)
                             + F.col("_copy").cast("float") / 1000.0
                             ).cast("float")),
                    F.slice("embedding", 2, 10_000))))
    elif table == "events":
        # spread replicated activity across distinct users to keep the
        # sessionize/user-stats key cardinality scaling with the data
        out = out.withColumn(
            "user_id", F.col("user_id") + F.col("_copy") * 10_000)
    # orders.o_custkey stays unshifted: customer is a dim table and the
    # fact:dim ratio rising 10x is exactly the 100 TB broadcast shape
    return out.drop("_copy").select(*df.columns)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench"
    dest = os.path.join(out_root, "sf1")
    os.makedirs(dest, exist_ok=True)
    from rdf_go_spark.session import get_spark
    spark = get_spark(app_name="gen_sf1")
    for table in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode(
            "overwrite").parquet(f"{dest}/{table}.parquet")
    for table in ("documents", "embeddings", "orders", "lineitem", "events"):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        replicate(df, table).repartition(32).write.mode(
            "overwrite").parquet(f"{dest}/{table}.parquet")
        print(table, "->", spark.read.parquet(
            f"{dest}/{table}.parquet").count(), "rows", flush=True)
    spark.stop()
    print("sf1 written to", dest)


if __name__ == "__main__":
    main()
