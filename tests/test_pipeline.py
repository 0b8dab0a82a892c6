"""End-to-end CDC pipeline scenarios (FIXTURES.md §5): replay equality,
resume without dupes/gaps, duplicate replay, schema evolution, lineage,
vectorized normalization equality."""

import os
import shutil

from pyspark.sql import functions as F

from nifi_spark.feedgen import generate_change_feed, materialize_feed
from nifi_spark.lineage import read_lineage
from nifi_spark.normalize import normalize_json, normalize_json_arrow
from nifi_spark.streaming.job import CdcPipeline

from .oracle import assert_final_state_equal, pandas_fold


def _run_stream(pipeline, feed_dir):
    q = pipeline.start(feed_dir, available_now=True)
    q.awaitTermination()


def _table_pd(pipeline):
    return (
        pipeline.table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
    )


def test_streaming_replay_equals_oracle(spark, tmp_path):
    feed = generate_change_feed(spark, n_conversations=60, max_turns=8, max_edits=4, ts_jitter_s=3)
    feed_dir = str(tmp_path / "feed")
    materialize_feed(feed, feed_dir, n_segments=4, disorder_window=500)

    p = CdcPipeline(spark, str(tmp_path / "table"), str(tmp_path / "ckpt"), n_buckets=8)
    _run_stream(p, feed_dir)

    assert_final_state_equal(_table_pd(p), pandas_fold(feed.toPandas()))


def test_resume_no_dupes_no_gaps(spark, tmp_path):
    """Kill after segment 1, restart, feed segment 2 (≙ reference
    CaptureChangeMySQLTest.java:948 transaction-across-executions)."""
    feed = generate_change_feed(spark, n_conversations=40, max_turns=8, max_edits=4)
    seg_dir = str(tmp_path / "segs")
    materialize_feed(feed, seg_dir, n_segments=2)
    parts = sorted(
        f for f in os.listdir(seg_dir) if f.endswith(".parquet") and not f.startswith(".")
    )
    assert len(parts) == 2

    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    shutil.copy(os.path.join(seg_dir, parts[0]), feed_dir)

    table_path, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    p1 = CdcPipeline(spark, table_path, ckpt, n_buckets=8)
    _run_stream(p1, feed_dir)
    v_after_seg1 = p1.table.current_version()
    assert v_after_seg1 >= 1

    # "restart": fresh pipeline object, same checkpoint; second segment arrives
    shutil.copy(os.path.join(seg_dir, parts[1]), feed_dir)
    p2 = CdcPipeline(spark, table_path, ckpt, n_buckets=8)
    _run_stream(p2, feed_dir)

    # final state equals full-log oracle → no gaps; version advanced once more
    assert_final_state_equal(_table_pd(p2), pandas_fold(feed.toPandas()))

    # lineage: applied event count equals feed size, seq ranges don't overlap dup
    lin = read_lineage(spark, table_path).toPandas()
    assert lin["n_events"].sum() == feed.count()  # no dupes, no gaps

    # replaying the whole feed dir against the same checkpoint is a no-op
    p3 = CdcPipeline(spark, table_path, ckpt, n_buckets=8)
    _run_stream(p3, feed_dir)
    assert p3.table.current_version() == p2.table.current_version()


def test_duplicate_batch_replay_is_idempotent(spark, tmp_path):
    """Simulates foreachBatch re-run after sink success, before checkpoint commit."""
    feed = generate_change_feed(spark, n_conversations=10, max_turns=4, max_edits=3)
    p = CdcPipeline(spark, str(tmp_path / "table"), str(tmp_path / "ckpt"), n_buckets=4)
    m1 = p.apply_batch(feed, batch_id=0)
    assert m1["version"] == 1
    m2 = p.apply_batch(feed, batch_id=0)  # same batch id → skipped
    assert m2["version"] is None
    assert p.table.current_version() == 1
    assert_final_state_equal(_table_pd(p), pandas_fold(feed.toPandas()))


def test_late_events_are_skipped_and_counted(spark, tmp_path):
    p = CdcPipeline(
        spark, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        n_buckets=4, watermark_delay_s=60,
    )
    feed = generate_change_feed(spark, n_conversations=20, max_turns=4, max_edits=3).cache()
    p.apply_batch(feed, batch_id=0)
    max_ts = feed.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]

    # a batch arriving entirely before (max_ts - delay) → all late, no merge
    late_events = feed.filter(F.unix_timestamp("ts") < max_ts - 120).withColumn(
        "text", F.lit("SHOULD NOT APPEAR")
    )
    n_late_expected = late_events.count()
    assert n_late_expected > 0
    m = p.apply_batch(late_events, batch_id=1)
    assert m["n_late"] == n_late_expected
    assert m["n_events"] == 0
    got = _table_pd(p)
    assert not (got["text"] == "SHOULD NOT APPEAR").any()
    assert_final_state_equal(got, pandas_fold(feed.toPandas()))
    feed.unpersist()


def test_schema_evolution_mid_stream(spark, tmp_path):
    """tool_meta appears from a seq onward (FIXTURES t4-evolution)."""
    feed = generate_change_feed(
        spark, n_conversations=30, max_turns=4, max_edits=3, v2_from_seq=None
    )
    mid = feed.approxQuantile("seq", [0.5], 0.01)[0]
    feed_v2 = generate_change_feed(
        spark, n_conversations=30, max_turns=4, max_edits=3, v2_from_seq=int(mid)
    ).cache()
    seg1 = feed_v2.filter(F.col("seq") < mid).drop("tool_meta")
    seg2 = feed_v2.filter(F.col("seq") >= mid)

    p = CdcPipeline(spark, str(tmp_path / "table"), str(tmp_path / "ckpt"), n_buckets=4)
    p.apply_batch(seg1, batch_id=0)
    assert "tool_meta" not in p.table.read().columns
    p.apply_batch(seg2, batch_id=1)
    out = p.table.read().toPandas()
    assert "tool_meta" in out.columns
    # rows whose winner predates the switch are null; later winners populated
    assert_final_state_equal(out, pandas_fold(feed_v2.toPandas()))
    winners = feed_v2.toPandas()
    idx = winners.groupby(["conv_id", "turn_idx"])["seq"].idxmax()
    w = winners.loc[idx]
    w = w[w.op != "D"]
    exp_meta = w.set_index(["conv_id", "turn_idx"])["tool_meta"].to_dict()
    got_meta = out.set_index(["conv_id", "turn_idx"])["tool_meta"].to_dict()
    assert got_meta == exp_meta
    feed_v2.unpersist()


def test_arrow_normalization_matches_jvm(spark):
    """FIXTURES §5.10: payload_json path == typed path, both vectorized."""
    feed = generate_change_feed(spark, n_conversations=15, max_turns=4, max_edits=3).cache()
    jvm = normalize_json(feed).toPandas().sort_values("seq").reset_index(drop=True)
    arrow = normalize_json_arrow(feed).toPandas().sort_values("seq").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(jvm, arrow, check_dtype=False)
    # and the parsed payload equals the typed source columns
    typed = feed.select("seq", "op", "ts", "conv_id", "turn_idx", "role", "text", "tool") \
        .toPandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        jvm.drop(columns=["tool_meta"]), typed, check_dtype=False
    )
    feed.unpersist()


def test_json_feed_pipeline(spark, tmp_path):
    """Pipeline over the raw-JSON payload path end-to-end."""
    feed = generate_change_feed(spark, n_conversations=15, max_turns=4, max_edits=3)
    p = CdcPipeline(
        spark, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        n_buckets=4, from_json_payload=True,
    )
    p.apply_batch(feed.select("payload_json", "source_file", "source_pos"), batch_id=0)
    got = _table_pd(p)
    assert_final_state_equal(got, pandas_fold(feed.toPandas()))


def test_lineage_audit_clean_and_detects_corruption(spark, tmp_path):
    """lineage_audit: a drained stream is gap/dup-free; synthetic gap,
    overlap, and duplicate-replay records are each detected."""
    from nifi_spark.lineage import lineage_audit, write_lineage_rows

    feed = generate_change_feed(spark, n_conversations=20, max_turns=4, max_edits=3)
    feed_dir = str(tmp_path / "feed")
    materialize_feed(feed, feed_dir, n_segments=3)
    table_path = str(tmp_path / "table")
    p = CdcPipeline(spark, table_path, str(tmp_path / "ckpt"), n_buckets=4,
                    sink_mode="append")
    _run_stream(p, feed_dir)
    assert lineage_audit(spark, table_path).count() == 0

    # corrupt: a gap, an overlap, and a duplicated (batch, file) row
    write_lineage_rows(spark, [
        {"batch_id": 90, "snapshot_id": 90, "source_file": "gapfile",
         "min_pos": 0, "max_pos": 9, "min_seq": 1, "max_seq": 9,
         "n_events": 10, "n_late": 0, "committed_at": "x"},
        {"batch_id": 91, "snapshot_id": 91, "source_file": "gapfile",
         "min_pos": 20, "max_pos": 29, "min_seq": 20, "max_seq": 29,
         "n_events": 10, "n_late": 0, "committed_at": "x"},
        {"batch_id": 92, "snapshot_id": 92, "source_file": "gapfile",
         "min_pos": 25, "max_pos": 40, "min_seq": 25, "max_seq": 40,
         "n_events": 16, "n_late": 0, "committed_at": "x"},
        {"batch_id": 93, "snapshot_id": 93, "source_file": "dupfile",
         "min_pos": 0, "max_pos": 5, "min_seq": 0, "max_seq": 5,
         "n_events": 6, "n_late": 0, "committed_at": "x"},
        {"batch_id": 93, "snapshot_id": 93, "source_file": "dupfile",
         "min_pos": 0, "max_pos": 5, "min_seq": 0, "max_seq": 5,
         "n_events": 6, "n_late": 0, "committed_at": "x"},
    ], table_path)
    v = {r.violation for r in lineage_audit(spark, table_path).collect()}
    assert v == {"pos_gap", "pos_overlap", "dup_batch_file"}


def test_stream_json_watermark_late_skip(spark, tmp_path):
    """start() with from_json_payload + engine watermark: the parse/_bad
    prefix is baked into the streaming plan, while the file-state-dependent
    ``_late`` cutoff stays per-batch — late rows arriving in a later
    micro-batch are skipped, on-time rows applied."""
    feed = generate_change_feed(spark, n_conversations=20, max_turns=4, max_edits=3).cache()
    feed_dir = str(tmp_path / "feed")
    materialize_feed(feed, feed_dir, n_segments=2)
    table_path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def pipe():
        return CdcPipeline(
            spark, table_path, ckpt, n_buckets=4,
            from_json_payload=True, watermark_delay_s=60, sink_mode="append",
        )

    _run_stream(pipe(), feed_dir)
    assert_final_state_equal(_table_pd(pipe()), pandas_fold(feed.toPandas()))

    # append a segment file that is entirely older than (max_ts - delay);
    # its payload_json carries a marker that must never reach the table
    max_ts = feed.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    late = (
        feed.filter(F.unix_timestamp("ts") < max_ts - 120)
        .withColumn("text", F.lit("SHOULD NOT APPEAR"))
        .withColumn(
            "payload_json",
            F.to_json(F.struct(
                F.col("op").alias("type"), F.col("ts").alias("timestamp"),
                F.col("seq"), F.col("conv_id"), F.col("turn_idx"),
                F.col("role"), F.col("text"), F.col("tool"),
            )),
        )
    )
    assert late.count() > 0
    late.write.mode("append").parquet(feed_dir)
    _run_stream(pipe(), feed_dir)
    got = _table_pd(pipe())
    assert not (got["text"] == "SHOULD NOT APPEAR").any()
    assert_final_state_equal(got, pandas_fold(feed.toPandas()))
    feed.unpersist()
