"""LakeTable merge semantics: FIXTURES.md §5.4 (delete-then-reinsert),
§5.5 (duplicate-replay idempotency), §5.7 (schema evolution), plus the
stale-update-after-delete hazard from SURVEY.md §7.3."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nifi_spark.sinks.laketable import LakeTable

KEYS = ["conv_id", "turn_idx"]
TS = dt.datetime(2024, 1, 1)


def _batch(spark, rows, with_meta=False):
    cols = "seq long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    if with_meta:
        cols += ", tool_meta string"
    return spark.createDataFrame(rows, cols)


def _rows(t):
    return {
        (r.conv_id, r.turn_idx): r.text
        for r in t.read().collect()
    }


def test_merge_insert_update_delete(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    b1 = _batch(spark, [
        (1, "I", "c1", 0, "user", "hello", None, TS),
        (2, "I", "c1", 1, "assistant", "hi", None, TS),
        (3, "I", "c2", 0, "user", "yo", None, TS),
    ])
    v1 = t.merge(b1, KEYS, batch_id=1)
    assert v1 == 1
    assert _rows(t) == {("c1", 0): "hello", ("c1", 1): "hi", ("c2", 0): "yo"}

    b2 = _batch(spark, [
        (4, "U", "c1", 0, "user", "hello v2", None, TS),
        (5, "D", "c2", 0, None, None, None, TS),
        (6, "I", "c3", 0, "system", "new", None, TS),
    ])
    t.merge(b2, KEYS, batch_id=2)
    assert _rows(t) == {("c1", 0): "hello v2", ("c1", 1): "hi", ("c3", 0): "new"}


def test_delete_then_reinsert_across_batches(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_batch(spark, [(1, "I", "c1", 0, "user", "v1", None, TS)]), KEYS, batch_id=1)
    t.merge(_batch(spark, [(2, "D", "c1", 0, None, None, None, TS)]), KEYS, batch_id=2)
    assert _rows(t) == {}
    # tombstone loses to higher-seq re-insert
    t.merge(_batch(spark, [(3, "I", "c1", 0, "user", "v3", None, TS)]), KEYS, batch_id=3)
    assert _rows(t) == {("c1", 0): "v3"}


def test_stale_update_after_delete_does_not_resurrect(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_batch(spark, [(1, "I", "c1", 0, "user", "v1", None, TS)]), KEYS, batch_id=1)
    t.merge(_batch(spark, [(5, "D", "c1", 0, None, None, None, TS)]), KEYS, batch_id=2)
    # seq=3 < tombstone seq=5 arrives late in a later batch: must be ignored
    t.merge(_batch(spark, [(3, "U", "c1", 0, "user", "stale", None, TS)]), KEYS, batch_id=3)
    assert _rows(t) == {}


def test_duplicate_replay_is_noop(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    b = _batch(spark, [(1, "I", "c1", 0, "user", "v1", None, TS)])
    assert t.merge(b, KEYS, batch_id=7) is not None
    v = t.current_version()
    # same batch id replayed (foreachBatch retry / restart overlap) → skipped
    assert t.merge(b, KEYS, batch_id=7) is None
    assert t.current_version() == v
    assert t.last_batch_id() == 7
    # stale (smaller) batch id also skipped
    assert t.merge(b, KEYS, batch_id=3) is None


def test_schema_evolution_adds_column(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_batch(spark, [(1, "I", "c1", 0, "user", "old", None, TS)]), KEYS, batch_id=1)
    assert "tool_meta" not in t.read().columns
    b2 = _batch(
        spark,
        [(2, "I", "c2", 0, "user", "new", None, TS, '{"call_id": 2}')],
        with_meta=True,
    )
    t.merge(b2, KEYS, batch_id=2)
    got = {(r.conv_id, r.turn_idx): r.tool_meta for r in t.read().collect()}
    # old rows null, new rows populated; pre-switch data intact
    assert got == {("c1", 0): None, ("c2", 0): '{"call_id": 2}'}
    assert _rows(t) == {("c1", 0): "old", ("c2", 0): "new"}


def test_bucket_pruning_rewrites_only_touched(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=8)
    rows = [(i, "I", f"c{i}", 0, "user", f"t{i}", None, TS) for i in range(1, 33)]
    t.merge(_batch(spark, rows), KEYS, batch_id=1)
    files_v1 = t._bucket_files()
    # update a single key → only its bucket's file list may change
    t.merge(_batch(spark, [(100, "U", "c1", 0, "user", "t1v2", None, TS)]), KEYS, batch_id=2)
    files_v2 = t._bucket_files()
    changed = [b for b in files_v1 if files_v1[b] != files_v2.get(b)]
    assert len(changed) == 1
    assert _rows(t)[("c1", 0)] == "t1v2"
    assert len(_rows(t)) == 32


def test_read_empty_table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "empty"))
    assert not t.exists()
    assert t.last_batch_id() is None
    assert t.read_raw().count() == 0


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    from pyspark.sql import functions as F

    from nifi_spark.sinks.laketable import LakeTable

    t = LakeTable(spark, str(tmp_path / "tt"), n_buckets=2)
    b1 = spark.createDataFrame(
        [("c1", 0, "hello", 1)], "conv_id string, turn_idx int, text string, seq long"
    ).withColumn("op", F.lit("I"))
    t.merge(b1.select("conv_id", "turn_idx", "seq", "op", "text"), ["conv_id", "turn_idx"], batch_id=0)
    v1 = t.current_version()
    b2 = b1.withColumn("seq", F.lit(2)).withColumn("text", F.lit("edited"))
    t.merge(b2.select("conv_id", "turn_idx", "seq", "op", "text"), ["conv_id", "turn_idx"], batch_id=1)
    assert t.read().collect()[0]["text"] == "edited"
    assert t.read(version=v1).collect()[0]["text"] == "hello"


def test_compact_purges_old_tombstones_and_keeps_semantics(spark, tmp_path):
    from pyspark.sql import functions as F

    from nifi_spark.sinks.laketable import LakeTable

    t = LakeTable(spark, str(tmp_path / "cp"), n_buckets=2)
    rows = [("c%d" % i, 0, i + 1, "I", "t%d" % i) for i in range(10)]
    b1 = spark.createDataFrame(rows, "conv_id string, turn_idx int, seq long, op string, text string")
    t.merge(b1, ["conv_id", "turn_idx"], batch_id=0)
    # delete c0 (seq 100), update c1 (seq 101)
    b2 = spark.createDataFrame(
        [("c0", 0, 100, "D", None), ("c1", 0, 101, "U", "t1b")],
        "conv_id string, turn_idx int, seq long, op string, text string",
    )
    t.merge(b2, ["conv_id", "turn_idx"], batch_id=1)
    before = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert "c0" not in before and before["c1"] == "t1b"
    raw_before = t.read_raw().count()  # includes the c0 tombstone
    assert raw_before == 10

    t.compact(purge_tombstones_below_seq=200)
    after = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert after == before
    assert t.read_raw().count() == 9  # tombstone physically gone
    # a stale pre-delete update must NOT resurrect after purge only because
    # the caller promised (watermark) no event below seq 200 arrives; a
    # NEWER re-insert must still win:
    b3 = spark.createDataFrame(
        [("c0", 0, 300, "I", "reborn")],
        "conv_id string, turn_idx int, seq long, op string, text string",
    )
    t.merge(b3, ["conv_id", "turn_idx"], batch_id=2)
    assert {r["conv_id"]: r["text"] for r in t.read().collect()}["c0"] == "reborn"
