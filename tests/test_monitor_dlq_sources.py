"""Tests for activity monitoring, observe-counters, DLQ routing, and the
incremental-JDBC state logic."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nifi_spark.feedgen import generate_change_feed, materialize_feed
from nifi_spark.sources.jdbc_incremental import (
    MaxValueState,
    incremental_predicate,
)
from nifi_spark.streaming.job import CdcPipeline
from nifi_spark.streaming.monitor import ActivityMonitor, with_counters


def test_with_counters_batch_observation(spark):
    df = spark.createDataFrame(
        [(1, "I"), (2, "D"), (3, "D")], "seq long, op string"
    )
    from pyspark.sql import Observation

    obs = Observation("cdc")
    out = df.observe(
        obs,
        F.count(F.when(F.col("op") == "D", 1)).alias("n_deletes"),
        F.max("seq").alias("max_seq"),
    )
    out.write.format("noop").mode("overwrite").save()
    assert obs.get == {"n_deletes": 2, "max_seq": 3}
    # the wrapper builds the same thing with named kwargs
    named = with_counters(df, "m", n=F.count(F.lit(1)))
    assert named.count() == 3


def test_activity_monitor_status_transitions():
    mon = ActivityMonitor(threshold_s=0.0)

    class _Started:
        id = "q1"

    mon.onQueryStarted(_Started())
    assert mon.status("q1") in ("active", "inactive")  # threshold 0 → flips fast

    class _Progress:
        class progress:
            id = "q1"
            numInputRows = 0

    mon.onQueryProgress(_Progress())
    assert mon.status("q1") == "inactive"
    flagged = []
    mon.on_restored = lambda q: flagged.append(q)

    class _Active:
        class progress:
            id = "q1"
            numInputRows = 5

    mon._flagged.add("q1")
    mon.onQueryProgress(_Active())
    assert flagged == ["q1"]
    assert mon.status("q2") == "unknown"


def test_dlq_routes_malformed_events(spark, tmp_path):
    feed = generate_change_feed(spark, n_conversations=20, max_turns=4, max_edits=2, seed=11)
    good = feed.select("payload_json", "source_file", "source_pos")
    bad = spark.createDataFrame(
        [('{"type": "U"}', "binlog.bad", 1), ("not json at all}", "binlog.bad", 2)],
        "payload_json string, source_file string, source_pos long",
    )
    # "not json at all}" → from_json null struct; '{"type":"U"}' → missing key cols
    batch = good.unionByName(bad)

    pipe = CdcPipeline(
        spark,
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        from_json_payload=True,
    )
    metrics = pipe.apply_batch(batch, batch_id=0)
    assert metrics["n_dlq"] == 2
    dlq = spark.read.parquet(str(tmp_path / "table" / "_dlq"))
    assert dlq.count() == 2
    assert set(dlq.columns) == {"batch_id", "payload_json", "source_file", "source_pos", "reason"}
    # good events all applied
    assert metrics["n_events"] == good.count()
    assert pipe.table.read().count() > 0


def test_max_value_state_roundtrip(tmp_path):
    st = MaxValueState(str(tmp_path / "state.json"))
    assert st.get("t", "id") is None
    assert incremental_predicate(st, "t", "id") is None
    st.update("t", "id", 100)
    assert st.get("t", "id") == 100
    assert incremental_predicate(st, "t", "id") == "id > 100"
    st.update("t", "id", 50)  # never regress
    assert st.get("t", "id") == 100
    # timestamp watermarks get a typed literal (≙ reference
    # AbstractDatabaseFetchProcessor type-aware literal formatting)
    st.update("t", "updated_at", "2024-01-02 00:00:00")
    assert (
        incremental_predicate(st, "t", "updated_at")
        == "updated_at > TIMESTAMP '2024-01-02 00:00:00'"
    )
    # embedded quotes in a string watermark are doubled, not interpolated raw
    st.update("t", "name", "O'Brien")
    assert incremental_predicate(st, "t", "name") == "name > 'O''Brien'"
    # state survives reload
    st2 = MaxValueState(str(tmp_path / "state.json"))
    assert st2.get("t", "id") == 100
