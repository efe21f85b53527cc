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

from ..operators.extraction import extract_triples

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
    """Stateless triple extraction on a stream. The prev-turn lag rule
    needs per-conversation state on an unbounded stream — it is the
    stateful companion operator ``streaming_prev_turn`` below; union the
    two streams for full batch parity."""
    return extract_triples(transcripts, entities=entities,
                           include_payload=True, include_prev_turn=False)


def streaming_prev_turn(transcripts: DataFrame,
                        coarse_buckets: int = None) -> DataFrame:
    """The batch prev-turn window rule as a custom stateful streaming
    operator (applyInPandasWithState keyed on conv_id): every turn with
    turn_idx > 0 emits ``bnode(conv,idx) v:prevTurn bnode(conv,idx-1)``
    exactly once, even when a conversation's turns arrive out of order
    across many micro-batches. State per conversation is one LONG bitmask
    of already-emitted turn indexes (turns beyond bit 62 fall back to a
    hex-set string — unbounded-turn safety without unbounded state for
    the common case). Output matches batch extraction's prevTurn triples
    byte-for-byte (deterministic sha256 skolem bnodes,
    operators/extraction.py).

    ``coarse_buckets``: key the state on ``hash(conv_id) % N`` instead
    of conv_id, holding a per-conversation bitmask MAP inside each
    bucket's state. The micro-batch measurement (BENCH/BASELINE.md §7)
    shows the stateful path is bound by PER-GROUP overhead — one Python
    call, one Arrow round trip, and one state get/update per group per
    batch — not by state-store commits, so collapsing 50k conversation
    groups into ~1k buckets removes ~98% of those boundaries while
    total state stays the same size (the map shards the identical
    bitmasks). Size N ≈ |active conversations| / 1000 so a bucket's map
    stays small; semantics and output are identical (equivalence test in
    tests/test_streaming.py)."""
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("conv_id string, turn_idx int, subj string, "
                  "pred string, obj string")
    if coarse_buckets:
        return _prev_turn_coarse(transcripts, coarse_buckets, out_schema)
    state_schema = "seen long, overflow string"

    def bnode(conv_id: str, idx: int) -> str:
        return "_:b" + hashlib.sha256(
            f"{conv_id}|{idx}".encode()).hexdigest()[:16]

    def lag(key, pdf_iter, state):
        conv_id = key[0]
        if state.exists:
            seen, overflow = state.get
            big = set(overflow.split(",")) - {""} if overflow else set()
        else:
            seen, big = 0, set()
        rows = {"conv_id": [], "turn_idx": [], "subj": [], "pred": [],
                "obj": []}
        for pdf in pdf_iter:
            for t in pdf["turn_idx"]:
                t = int(t)
                if t <= 0:
                    continue
                if t < 63:
                    if (seen >> t) & 1:
                        continue
                    seen |= 1 << t
                else:
                    if str(t) in big:
                        continue
                    big.add(str(t))
                rows["conv_id"].append(conv_id)
                rows["turn_idx"].append(t)
                rows["subj"].append(bnode(conv_id, t))
                rows["pred"].append("<http://example.org/v/prevTurn>")
                rows["obj"].append(bnode(conv_id, t - 1))
        state.update((seen, ",".join(sorted(big))))
        if rows["conv_id"]:
            yield pd.DataFrame(rows)

    return (transcripts
            .groupBy("conv_id")
            .applyInPandasWithState(
                lag, outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def _prev_turn_coarse(transcripts: DataFrame, n_buckets: int,
                      out_schema: str) -> DataFrame:
    """Coarse-keyed variant of streaming_prev_turn (see its docstring):
    state per bucket = parallel arrays (conv_ids, bitmasks) encoding the
    same per-conversation LONG bitmask; turns ≥ 63 carry a per-conv
    overflow entry keyed ``conv|idx`` in a shared array."""
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    state_schema = ("convs array<string>, masks array<long>, "
                    "overflow array<string>")

    def bnode(conv_id: str, idx: int) -> str:
        return "_:b" + hashlib.sha256(
            f"{conv_id}|{idx}".encode()).hexdigest()[:16]

    def lag(key, pdf_iter, state):
        if state.exists:
            convs, masks, overflow = state.get
            seen = dict(zip(convs, masks))
            big = set(overflow or [])
        else:
            seen, big = {}, set()
        rows = {"conv_id": [], "turn_idx": [], "subj": [], "pred": [],
                "obj": []}
        for pdf in pdf_iter:
            for conv_id, t in zip(pdf["conv_id"], pdf["turn_idx"]):
                t = int(t)
                if t <= 0:
                    continue
                if t < 63:
                    mask = seen.get(conv_id, 0)
                    if (mask >> t) & 1:
                        continue
                    seen[conv_id] = mask | (1 << t)
                else:
                    k = f"{conv_id}|{t}"
                    if k in big:
                        continue
                    big.add(k)
                rows["conv_id"].append(conv_id)
                rows["turn_idx"].append(t)
                rows["subj"].append(bnode(conv_id, t))
                rows["pred"].append("<http://example.org/v/prevTurn>")
                rows["obj"].append(bnode(conv_id, t - 1))
        state.update((list(seen.keys()), list(seen.values()),
                      sorted(big)))
        if rows["conv_id"]:
            yield pd.DataFrame(rows)

    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    return (transcripts
            .withColumn("_bucket", bucket)
            .groupBy("_bucket")
            .applyInPandasWithState(
                lag, outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


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


def conversation_state_assembly(transcripts: DataFrame,
                                timeout_minutes: int | None = 120) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-conversation accumulation of turns, emitting a running snapshot
    per update; idle conversations are evicted after ``timeout_minutes``
    (bounded state). Pass ``timeout_minutes=None`` for drain-style
    ``availableNow`` runs — processing-time timeouts keep scheduling
    batches forever under availableNow, so finite drains must use
    NoTimeout.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    output_schema = ("conv_id string, n_turns long, n_user long, "
                     "n_assistant long, n_tool long, text_sha string")
    state_schema = ("n_turns long, n_user long, n_assistant long, "
                    "n_tool long, digest string")

    def assemble(key, pdf_iter, state):
        conv_id = key[0]
        if state.hasTimedOut:
            # idle conversation: drop state; snapshots were already emitted
            state.remove()
            return
        if state.exists:
            n, nu, na, nt, digest = state.get
        else:
            n, nu, na, nt, digest = 0, 0, 0, 0, ""
        h = hashlib.sha256(digest.encode())
        for pdf in pdf_iter:
            pdf = pdf.sort_values("turn_idx")
            n += len(pdf)
            nu += int((pdf["role"] == "user").sum())
            na += int((pdf["role"] == "assistant").sum())
            nt += int((pdf["role"] == "tool").sum())
            for t in pdf["text"]:
                h.update(str(t).encode())
        digest = h.hexdigest()[:16]
        state.update((n, nu, na, nt, digest))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        # emit a running snapshot per update (append-mode friendly; a
        # later batch with more turns emits a newer snapshot)
        yield pd.DataFrame({"conv_id": [conv_id], "n_turns": [n],
                            "n_user": [nu], "n_assistant": [na],
                            "n_tool": [nt], "text_sha": [digest]})

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if timeout_minutes is not None
                    else GroupStateTimeout.NoTimeout)
    return (transcripts
            .groupBy("conv_id")
            .applyInPandasWithState(
                assemble, outputStructType=output_schema,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=timeout_conf))


# Last executed micro-batch physical plan per driver streaming query —
# the memory-sink drain hides the executed plan from a static audit, so
# the drain harness records it here for scripts/plan_audit.py.
LAST_MICROBATCH_PLANS: dict[str, str] = {}


def run_availablenow(stream_df: DataFrame, checkpoint: str,
                     query_name: str):
    """Drain everything currently available into a memory sink and stop —
    the batch-parity harness used by tests. Returns the (terminated)
    StreamingQuery so callers can inspect progress/plan."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def run_availablenow_complete(stream_df: DataFrame, checkpoint: str,
                              query_name: str):
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def kg_streaming_turn_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing Structured Streaming query: the sf-scale transcript
    corpus is written to parquet, re-read as a STREAM (file source,
    maxFilesPerTrigger batching), aggregated into watermarked 1-hour
    tumbling windows per role, drained with availableNow into a memory
    sink, and returned as a DataFrame. Exact counts only (streaming
    forbids exact distinct) so the DuckDB oracle is the same aggregation
    over the same deterministic transcripts — epoch-aligned window start
    == date_trunc('hour', ts)."""
    from ..sources.transcripts import n_conv_for_sf_dir, synth_transcripts

    n = n_conv_for_sf_dir(sf_dir)

    def build(stream):
        return (stream
                .withWatermark("ts", "2 hours")
                .groupBy(F.window("ts", "1 hour").alias("w"), F.col("role"))
                .agg(F.count("*").alias("n_turns"))
                .select(F.date_format(F.col("w.start"),
                                      "yyyy-MM-dd HH:mm:ss")
                        .alias("window_start"), "role", "n_turns"))

    return _drain_stream_query(
        spark, synth_transcripts(spark, n), build,
        "window_start string, role string, n_turns long", complete=True,
        plan_label="kg_streaming_turn_metrics")


def _drain_stream_query(spark: SparkSession, batch_input: DataFrame,
                        build, result_schema: str,
                        complete: bool = False,
                        plan_label: str | None = None) -> DataFrame:
    """Shared drain harness for driver-facing streaming queries: write the
    deterministic input to a temp parquet dir, re-read it as a file
    stream, run ``build(stream)``, drain with availableNow into a memory
    sink, then localize the (small) result and CLEAN UP — the temp dir,
    checkpoint, and memory-sink table do not accumulate across repeated
    driver runs."""
    import shutil
    import tempfile
    import uuid

    base = tempfile.mkdtemp(prefix="kg_stream_")
    name = "kg_stream_" + uuid.uuid4().hex[:8]
    try:
        data_dir = f"{base}/input"
        batch_input.write.mode("overwrite").parquet(data_dir)
        out = build(stream_transcripts(spark, data_dir))
        runner = run_availablenow_complete if complete else run_availablenow
        q = runner(out, f"{base}/ckpt", name)
        if plan_label:
            try:  # record the last micro-batch plan for the plan audit
                LAST_MICROBATCH_PLANS[plan_label] = \
                    q._jsq.explainInternal(False)  # physical plan only
            except Exception:
                pass
        rows = spark.table(name).collect()
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, result_schema)


def kg_streaming_prev_turn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing stateful streaming query: the prev-turn lag rule
    (streaming_prev_turn) over the sf-scale transcripts arriving as a
    multi-batch file stream. The drained edge set must equal batch
    extraction's prevTurn triples — the oracle is the same arithmetic
    rule the batch kg_triples oracle uses, filtered to the predicate."""
    from ..sources.transcripts import n_conv_for_sf_dir, synth_transcripts

    n = n_conv_for_sf_dir(sf_dir)
    return _drain_stream_query(
        spark, synth_transcripts(spark, n), streaming_prev_turn,
        "conv_id string, turn_idx int, subj string, pred string, obj string",
        plan_label="kg_streaming_prev_turn")


def kg_streaming_prev_turn_oracle_sql(n_conv: int) -> str:
    from ..sources.transcripts import transcripts_sql
    return f"""
WITH {transcripts_sql(n_conv)}
SELECT conv_id, turn_idx::INT AS turn_idx,
       '_:b' || substr(sha256(conv_id || '|' || turn_idx::VARCHAR), 1, 16) AS subj,
       '<http://example.org/v/prevTurn>' AS pred,
       '_:b' || substr(sha256(conv_id || '|' || (turn_idx - 1)::VARCHAR), 1, 16) AS obj
FROM transcripts WHERE turn_idx > 0
""".strip()


def kg_streaming_turn_metrics_oracle_sql(n_conv: int) -> str:
    from ..sources.transcripts import transcripts_sql
    return f"""
WITH {transcripts_sql(n_conv)}
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       role, count(*)::BIGINT AS n_turns
FROM transcripts
GROUP BY 1, 2
""".strip()
