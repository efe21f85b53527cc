"""Structured Streaming pipeline: streaming extraction == batch extraction
(parity), watermarked windowed metrics, checkpointed incremental resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def transcript_dir(spark, tmp_path):
    from rdf_go_spark.sources.transcripts import synth_transcripts
    d = str(tmp_path / "in")
    synth_transcripts(spark, 40).repartition(4).write.parquet(d)
    return d


class TestStreamingPipeline:
    def test_streaming_triples_match_batch(self, spark, transcript_dir, tmp_path):
        from rdf_go_spark.operators.extraction import extract_triples
        from rdf_go_spark.sources.transcripts import synth_entities
        from rdf_go_spark.streaming import (
            run_availablenow, stream_transcripts, streaming_triples,
        )
        entities = synth_entities(spark)
        stream = stream_transcripts(spark, transcript_dir)
        run_availablenow(streaming_triples(stream, entities),
                         str(tmp_path / "ckpt1"), "stream_triples")
        got = spark.sql("select * from stream_triples")

        batch = extract_triples(
            spark.read.parquet(transcript_dir), entities,
            include_prev_turn=False)
        a = sorted(map(tuple, got.drop("graph").collect()))
        b = sorted(map(tuple, batch.drop("graph").collect()))
        assert a == b and len(a) > 0

    def test_windowed_metrics_with_watermark(self, spark, transcript_dir, tmp_path):
        from rdf_go_spark.streaming import (
            run_availablenow_complete, stream_transcripts,
            windowed_turn_metrics,
        )
        stream = stream_transcripts(spark, transcript_dir)
        run_availablenow_complete(windowed_turn_metrics(stream),
                                  str(tmp_path / "ckpt2"), "stream_windows")
        got = spark.sql("select * from stream_windows")
        rows = got.collect()
        assert rows
        total = sum(r.n_turns for r in rows)
        assert total == spark.read.parquet(transcript_dir).count()

    def test_incremental_resume_from_checkpoint(self, spark, tmp_path):
        """New files after a drained run are picked up on the next run with
        the same checkpoint — no reprocessing of old files."""
        from rdf_go_spark.sources.transcripts import synth_transcripts
        from rdf_go_spark.streaming import (
            run_availablenow, stream_transcripts, streaming_triples,
        )
        d = str(tmp_path / "inc")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt3")

        def drain():
            q = (streaming_triples(stream_transcripts(spark, d)).writeStream
                 .format("parquet")
                 .option("path", out)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append")
                 .trigger(availableNow=True)
                 .start())
            q.awaitTermination()

        synth_transcripts(spark, 10).coalesce(1).write.mode("append").parquet(d)
        drain()
        n1 = spark.read.parquet(out).count()

        more = synth_transcripts(spark, 30).filter(
            F.col("conv_id") >= "conv-000010")
        more.coalesce(1).write.mode("append").parquet(d)
        drain()
        result = spark.read.parquet(out)
        n2 = result.count()
        assert n1 > 0 and n2 > n1
        # no conversation processed twice: distinct (conv,turn,pred,obj)
        dupes = (result.groupBy("conv_id", "turn_idx", "subj", "pred", "obj")
                 .count().filter(F.col("count") > 1).count())
        assert dupes == 0


class TestStatefulAssembly:
    def test_conversation_state_assembly(self, spark, transcript_dir, tmp_path):
        """applyInPandasWithState custom operator: per-conversation running
        snapshots; final snapshot per conversation must match the batch
        aggregate exactly."""
        import hashlib

        from rdf_go_spark.streaming.pipeline import (
            conversation_state_assembly, stream_transcripts,
        )
        q = (conversation_state_assembly(
                stream_transcripts(spark, transcript_dir),
                timeout_minutes=None)
             .writeStream.format("memory").queryName("conv_state")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt_state"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)
        # multiple snapshots per conversation are possible if its turns
        # span micro-batches; the final one has the max turn count
        got = {}
        for r in spark.sql("select * from conv_state").collect():
            if r.conv_id not in got or r.n_turns > got[r.conv_id].n_turns:
                got[r.conv_id] = r

        batch = spark.read.parquet(transcript_dir).orderBy(
            "conv_id", "turn_idx").collect()
        expected = {}
        for r in batch:
            st = expected.setdefault(
                r.conv_id, {"n": 0, "user": 0, "assistant": 0, "tool": 0,
                            "h": hashlib.sha256(b"")})
            st["n"] += 1
            st[r.role] += 1
            st["h"].update(r.text.encode())
        assert set(got) == set(expected)
        for conv_id, st in expected.items():
            row = got[conv_id]
            assert row.n_turns == st["n"]
            assert (row.n_user, row.n_assistant, row.n_tool) == \
                (st["user"], st["assistant"], st["tool"])
            assert row.text_sha == st["h"].hexdigest()[:16]


class TestStatefulPrevTurn:
    def test_prev_turn_matches_batch_across_batches(
            self, spark, transcript_dir, tmp_path):
        """The stateful lag rule over a MULTI-micro-batch stream (4 files,
        maxFilesPerTrigger=2 → conversations span batches) must equal
        batch extraction's prevTurn triples exactly, with no duplicates."""
        from rdf_go_spark.plans.pipeline import kg_triples
        from rdf_go_spark.streaming import (
            run_availablenow, stream_transcripts, streaming_prev_turn,
        )
        stream = stream_transcripts(spark, transcript_dir,
                                    max_files_per_trigger=2)
        run_availablenow(streaming_prev_turn(stream),
                         str(tmp_path / "ckpt_pt"), "stream_prev_turn")
        got = [(r.subj, r.pred, r.obj)
               for r in spark.sql("select * from stream_prev_turn").collect()]
        batch = kg_triples(spark, "/root/testdata/sf0.001")
        expected = [(r.subj, r.pred, r.obj) for r in batch.filter(
            F.col("pred") == "<http://example.org/v/prevTurn>")
            .collect() if r.conv_id < "conv-000040"]
        assert len(got) == len(set(got)), "duplicate edges across batches"
        assert sorted(got) == sorted(expected)

    def test_prev_turn_coarse_buckets_equivalent(
            self, spark, transcript_dir, tmp_path):
        """The coarse-keyed variant (state on hash(conv)%N with a
        per-conversation bitmask map per bucket) must emit exactly the
        per-conversation variant's edge set across multi-batch arrival —
        the per-group-overhead optimization cannot change semantics."""
        from rdf_go_spark.plans.pipeline import kg_triples
        from rdf_go_spark.streaming import (
            run_availablenow, stream_transcripts, streaming_prev_turn,
        )
        stream = stream_transcripts(spark, transcript_dir,
                                    max_files_per_trigger=2)
        run_availablenow(streaming_prev_turn(stream, coarse_buckets=7),
                         str(tmp_path / "ckpt_ptc"), "stream_prev_coarse")
        got = [(r.subj, r.pred, r.obj) for r in
               spark.sql("select * from stream_prev_coarse").collect()]
        batch = kg_triples(spark, "/root/testdata/sf0.001")
        expected = [(r.subj, r.pred, r.obj) for r in batch.filter(
            F.col("pred") == "<http://example.org/v/prevTurn>")
            .collect() if r.conv_id < "conv-000040"]
        assert len(got) == len(set(got)), "duplicate edges across batches"
        assert sorted(got) == sorted(expected)

    def test_prev_turn_driver_query_matches_oracle(self, spark, duck):
        import __spark_entry__ as e

        from rdf_go_spark.sources.transcripts import n_conv_for_sf_dir
        from rdf_go_spark.streaming.pipeline import (
            kg_streaming_prev_turn_oracle_sql,
        )
        from tests.conftest import assert_frames_match
        sdf = e.queries()["kg_streaming_prev_turn"](
            spark, "/root/testdata/sf0.001")
        ddf = duck.execute(kg_streaming_prev_turn_oracle_sql(
            n_conv_for_sf_dir("/root/testdata/sf0.001"))).df()
        assert_frames_match(sdf, ddf)


def test_streaming_turn_metrics_matches_oracle(spark, duck):
    """The driver-facing streaming query (file stream -> watermarked
    windowed agg -> availableNow drain) must value-match its DuckDB
    oracle — streaming is oracle-checked like every batch query."""
    import __spark_entry__ as e

    from tests.conftest import assert_frames_match
    sdf = e.queries()["kg_streaming_turn_metrics"](
        spark, "/root/testdata/sf0.001")
    from rdf_go_spark.sources.transcripts import n_conv_for_sf_dir
    from rdf_go_spark.streaming.pipeline import (
        kg_streaming_turn_metrics_oracle_sql,
    )
    ddf = duck.execute(kg_streaming_turn_metrics_oracle_sql(
        n_conv_for_sf_dir("/root/testdata/sf0.001"))).df()
    assert_frames_match(sdf, ddf)
