"""Structured Streaming variant of the KG pipeline.

The reference is record-streaming (pull-based Reader), not event-time
streaming (SURVEY.md §2.4); this module is the Spark-native upgrade:
incremental transcript arrivals → triple extraction → windowed metrics,
with watermarked late-data handling. The same extraction column
expressions run unchanged on a streaming DataFrame — that is the point of
declaring the pipeline relationally.

Tested with a file source + ``availableNow`` trigger and a memory sink
(tests/test_streaming.py); swap source/sink for Kafka/Iceberg in
production — the query graph is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import TRIPLE_SCHEMA, extract_triples

TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


def stream_transcripts(spark: SparkSession, input_dir: str,
                       max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream
            .schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def streaming_triples(transcripts: DataFrame,
                      entities: DataFrame = None) -> DataFrame:
    """Triple extraction on a stream. The prev-turn window rule is omitted
    (windows over unbounded streams need state; covered instead by the
    windowed-metrics query below) — everything else is identical to batch."""
    return extract_triples(transcripts, entities=entities,
                           include_payload=True, include_prev_turn=False)


def windowed_turn_metrics(transcripts: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window turn counts — late rows beyond the
    watermark are dropped, state is bounded."""
    return (transcripts
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), F.col("role"))
            .agg(F.count("*").alias("n_turns"),
                 F.approx_count_distinct("conv_id").alias("n_convs"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "role", "n_turns", "n_convs"))


def run_availablenow(stream_df: DataFrame, checkpoint: str,
                     query_name: str) -> None:
    """Drain everything currently available into a memory sink and stop —
    the batch-parity harness used by tests."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_availablenow_complete(stream_df: DataFrame, checkpoint: str,
                              query_name: str) -> None:
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
