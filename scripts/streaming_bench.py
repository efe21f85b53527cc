#!/usr/bin/env python
"""Streaming throughput at bench scale (VERDICT r3 #6): the stateful
prev-turn operator and the watermarked windowed aggregation run over the
sf0.1 transcript corpus arriving as a MULTI-BATCH file stream, writing
to a real file (parquet) sink with a checkpoint — not the oracle-scale
memory-sink drain. Reports rows/s across micro-batches and the state
store's size (rows + bytes) from StreamingQueryProgress, i.e. evidence
that state stays bounded while throughput holds.

Usage: python scripts/streaming_bench.py [sf_dir] [n_input_files]
Prints one JSON line. Record results in BENCH/BASELINE.md §7.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_to_file_sink(spark, data_dir: str, base: str, tag: str, build,
                     max_files_per_trigger: int = 4) -> dict:
    from rdf_go_spark.streaming.pipeline import stream_transcripts

    out = build(stream_transcripts(
        spark, data_dir, max_files_per_trigger=max_files_per_trigger))
    t0 = time.perf_counter()
    q = (out.writeStream
         .format("parquet")
         .option("path", f"{base}/out_{tag}")
         .option("checkpointLocation", f"{base}/ckpt_{tag}")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    wall = time.perf_counter() - t0

    progress = q.recentProgress
    rows_in = sum(p["numInputRows"] for p in progress)
    state_rows = state_bytes = 0
    for p in progress:  # last non-empty stateOperators entry wins
        for so in p.get("stateOperators") or []:
            state_rows = so.get("numRowsTotal", 0)
            state_bytes = so.get("memoryUsedBytes", 0)
    out_rows = spark.read.parquet(f"{base}/out_{tag}").count()
    return {
        "wall_sec": round(wall, 3),
        "micro_batches": sum(1 for p in progress if p["numInputRows"]),
        "rows_in": rows_in,
        "rows_out": out_rows,
        "rows_per_sec": round(rows_in / wall, 1),
        "state_rows": state_rows,
        "state_bytes": state_bytes,
    }


def main() -> None:
    sys.path.insert(0, REPO)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # state-store sizing knobs (VERDICT r4 #4): the stateful operator
    # pins its partition count at first checkpoint — each state
    # partition pays a store commit per micro-batch, so partitions >>
    # cores multiplies pure overhead. Also optionally swap the store
    # provider (rocksdb) to separate commit cost from provider cost.
    n_shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else None
    provider = sys.argv[4] if len(sys.argv) > 4 else None
    from pyspark.sql import functions as F

    from rdf_go_spark.session import get_spark
    from rdf_go_spark.sources.transcripts import (
        n_conv_for_sf_dir, synth_transcripts,
    )
    from rdf_go_spark.streaming.pipeline import streaming_prev_turn

    spark = get_spark(app_name="streaming_bench")
    if n_shuffle:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    base = tempfile.mkdtemp(prefix="kg_stream_bench_")
    try:
        n = n_conv_for_sf_dir(sf_dir)
        data_dir = f"{base}/input"
        # n_files input files + maxFilesPerTrigger=4 → n_files/4 batches;
        # conversations are hash-spread across files, so a conversation's
        # turns arrive across DIFFERENT micro-batches — the stateful op
        # must merge them through its state, the realistic arrival order
        synth_transcripts(spark, n).repartition(n_files).write.mode(
            "overwrite").parquet(data_dir)

        def windowed(stream):
            return (stream
                    .withWatermark("ts", "2 hours")
                    .groupBy(F.window("ts", "1 hour").alias("w"),
                             F.col("role"))
                    .agg(F.count("*").alias("n_turns"))
                    .select(F.col("w.start").alias("window_start"),
                            "role", "n_turns"))

        result = {
            "sf_dir": sf_dir,
            "n_conv": n,
            "n_input_files": n_files,
            "shuffle_partitions": spark.conf.get(
                "spark.sql.shuffle.partitions"),
            "state_provider": provider or "hdfs",
            "stateful_prev_turn": run_to_file_sink(
                spark, data_dir, base, "prev_turn", streaming_prev_turn),
            # coarse keying: hash(conv)%1024 buckets — same output, ~50x
            # fewer python-group boundaries per micro-batch
            "stateful_prev_turn_coarse1k": run_to_file_sink(
                spark, data_dir, base, "prev_coarse",
                lambda s: streaming_prev_turn(s, coarse_buckets=1024)),
            # append + watermark: only windows the watermark has closed
            # are emitted by end-of-drain; rows_out < distinct windows is
            # expected — throughput and bounded state are the measurement
            "windowed_turn_metrics": run_to_file_sink(
                spark, data_dir, base, "windowed", windowed),
        }
        print(json.dumps(result), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
