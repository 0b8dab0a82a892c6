"""LakeTable.changes — CDC-OUT changelog read between snapshots
(≙ Iceberg incremental changelog scan / Delta Change Data Feed).

Covers: I/U/D classification on live-image transitions, before-image on
deletes, the delta fast path vs the general snapshot diff (same output,
different physical plan), schema evolution inside the range, stale events
that lose LWW (must NOT appear as changes), from_version=0 (everything is
an insert), empty ranges, and re-applying the emitted changelog to a
second table (the downstream-consumer contract).
"""

import pytest
from pyspark.sql import functions as F

from nifi_spark.sinks.laketable import LakeTable

KEYS = ["conv_id", "turn_idx"]


def _batch(spark, rows, with_meta=False):
    cols = "seq long, op string, conv_id string, turn_idx int, text string"
    if with_meta:
        cols += ", tool_meta string"
    return spark.createDataFrame(rows, cols)


def _changes(t, from_v, to_v=None, mode="auto"):
    return {
        (r.conv_id, r.turn_idx): (r.op, r.text, r.change_seq)
        for r in t.changes(from_v, to_v, mode=mode).collect()
    }


def test_changes_classifies_iud(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_batch(spark, [
        (1, "I", "a", 0, "a0-v1"),
        (2, "I", "b", 0, "b0-v1"),
        (3, "I", "c", 0, "c0-v1"),
    ]), KEYS, batch_id=1)
    t.merge(_batch(spark, [
        (4, "U", "a", 0, "a0-v2"),   # update
        (5, "D", "b", 0, None),       # delete
        (6, "I", "d", 0, "d0-v1"),   # insert
    ]), KEYS, batch_id=2)
    got = _changes(t, 1)
    assert got == {
        ("a", 0): ("U", "a0-v2", 4),
        ("b", 0): ("D", "b0-v1", 5),   # before-image text, tombstone seq
        ("d", 0): ("I", "d0-v1", 6),
    }
    # untouched key "c" is absent; the full-range view from v0 is all-I
    got0 = _changes(t, 0)
    assert got0[("c", 0)] == ("I", "c0-v1", 3)
    assert set(got0) == {("a", 0), ("c", 0), ("d", 0)}  # b is dead at head
    # empty range
    assert _changes(t, 2, 2) == {}


def test_changes_delete_then_reinsert_is_insert(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_batch(spark, [(1, "I", "a", 0, "v1")]), KEYS, batch_id=1)
    t.merge(_batch(spark, [(2, "D", "a", 0, None)]), KEYS, batch_id=2)
    t.merge(_batch(spark, [(3, "I", "a", 0, "v3")]), KEYS, batch_id=3)
    # across the whole range the key went live->live with a newer seq: U
    assert _changes(t, 1) == {("a", 0): ("U", "v3", 3)}
    # from the deleted snapshot it is an insert
    assert _changes(t, 2) == {("a", 0): ("I", "v3", 3)}
    # delete-only window
    assert _changes(t, 1, 2) == {("a", 0): ("D", "v1", 2)}


def test_changes_stale_events_are_not_changes(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_batch(spark, [(10, "I", "a", 0, "v10")]), KEYS, batch_id=1)
    # batch 2 carries only a STALE update (loses LWW) — no visible change
    t.merge(_batch(spark, [(5, "U", "a", 0, "v5-stale")]), KEYS, batch_id=2)
    assert _changes(t, 1) == {}


def test_changes_delta_fast_path_matches_diff(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    # v1 = COW base; v2..v4 = MOR appends (delta files only)
    t.append_events(_batch(spark, [
        (1, "I", "a", 0, "a-v1"), (2, "I", "b", 0, "b-v1"),
        (3, "I", "c", 1, "c-v1"),
    ]), KEYS, batch_id=1)
    t.append_events(_batch(spark, [(4, "U", "a", 0, "a-v4")]), KEYS, batch_id=2)
    t.append_events(_batch(spark, [(5, "D", "b", 0, None)]), KEYS, batch_id=3)
    t.append_events(_batch(spark, [
        (6, "I", "e", 2, "e-v6"), (2, "U", "c", 1, "stale"),
    ]), KEYS, batch_id=4)
    expect = {
        ("a", 0): ("U", "a-v4", 4),
        ("b", 0): ("D", "b-v1", 5),
        ("e", 2): ("I", "e-v6", 6),
    }
    assert _changes(t, 1, mode="delta") == expect
    assert _changes(t, 1, mode="diff") == expect
    assert _changes(t, 1, mode="auto") == expect
    # sub-ranges agree between paths too
    for lo, hi in [(1, 2), (2, 3), (1, 3), (3, 4)]:
        assert _changes(t, lo, hi, mode="delta") == _changes(t, lo, hi, mode="diff")


def test_changes_fast_path_rejected_after_rewrite(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.append_events(_batch(spark, [(1, "I", "a", 0, "v1")]), KEYS, batch_id=1)
    t.append_events(_batch(spark, [(2, "U", "a", 0, "v2")]), KEYS, batch_id=2)
    t.compact()  # rewrites bucket files -> delta list cleared
    v_compact = t.current_version()
    t.append_events(_batch(spark, [(3, "U", "a", 0, "v3")]), KEYS, batch_id=3)
    with pytest.raises(ValueError, match="fast path unavailable"):
        t.changes(1, mode="delta")
    # auto falls back to the snapshot diff and stays correct
    assert _changes(t, 1) == {("a", 0): ("U", "v3", 3)}
    # a range that starts AT the compacted snapshot is append-only again
    assert _changes(t, v_compact, mode="delta") == {("a", 0): ("U", "v3", 3)}


def test_changes_schema_evolution_in_range(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_batch(spark, [(1, "I", "a", 0, "v1")]), KEYS, batch_id=1)
    t.merge(
        _batch(spark, [(2, "U", "a", 0, "v2", '{"fn":"search"}'),
                       (3, "I", "b", 1, "b1", None)], with_meta=True),
        KEYS, batch_id=2,
    )
    out = {(r.conv_id, r.turn_idx): (r.op, r.text, r.tool_meta)
           for r in t.changes(1).collect()}
    assert out == {
        ("a", 0): ("U", "v2", '{"fn":"search"}'),
        ("b", 1): ("I", "b1", None),
    }
    # D before-image of a pre-evolution row null-fills the new column
    t.merge(_batch(spark, [(4, "D", "b", 1, None, None)], with_meta=True),
            KEYS, batch_id=3)
    row = t.changes(2).filter(F.col("op") == "D").collect()
    assert len(row) == 1 and row[0].tool_meta is None and row[0].text == "b1"


def test_changes_bad_range_raises(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge(_batch(spark, [(1, "I", "a", 0, "v1")]), KEYS, batch_id=1)
    with pytest.raises(ValueError, match="outside"):
        t.changes(2)
    with pytest.raises(ValueError, match="outside"):
        t.changes(-1)
    with pytest.raises(ValueError, match="outside"):
        t.changes(1, 0)


def test_changelog_reapplies_downstream(spark, tmp_path):
    """The emitted feed is itself a valid change feed: replaying it onto a
    second table reproduces the source's live state (the CDC-out
    contract a downstream incremental consumer relies on)."""
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    src.merge(_batch(spark, [
        (1, "I", "a", 0, "a-v1"), (2, "I", "b", 0, "b-v1"),
    ]), KEYS, batch_id=1)
    dst = LakeTable(spark, str(tmp_path / "dst"), n_buckets=4)
    dst.merge_events(
        src.changes(0, 1).withColumnRenamed("change_seq", "seq"),
        KEYS, batch_id=1,
    )
    src.merge(_batch(spark, [
        (3, "U", "a", 0, "a-v3"), (4, "D", "b", 0, None),
        (5, "I", "c", 1, "c-v5"),
    ]), KEYS, batch_id=2)
    dst.merge_events(
        src.changes(1, 2).withColumnRenamed("change_seq", "seq"),
        KEYS, batch_id=2,
    )
    src_state = {(r.conv_id, r.turn_idx): r.text for r in src.read().collect()}
    dst_state = {(r.conv_id, r.turn_idx): r.text for r in dst.read().collect()}
    assert src_state == dst_state == {("a", 0): "a-v3", ("c", 1): "c-v5"}
