"""Incremental aggregate-MV maintenance (operators/mv.py).

The contract under test: after each refresh over a changelog range, the
view table equals a from-scratch aggregate of the source's live image —
across inserts, updates, deletes, full-conversation deletion, and a
replayed (idempotent) refresh.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators.mv import refresh_agg_mv
from nifi_spark.sinks.laketable import LakeTable

KEYS = ["conv_id", "turn_idx"]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, conv_id string, turn_idx int, text string"
    )


def _agg(live):
    # live image exposes user columns only (seq is the sink-internal _seq)
    return live.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("turn_idx").alias("max_turn"),
        F.sum(F.length("text")).alias("sum_chars"),
    )


def _expect(src):
    return {
        r.conv_id: (r.n_turns, r.max_turn, r.sum_chars)
        for r in _agg(src.read()).collect()
    }


def _got(mv):
    return {
        r.conv_id: (r.n_turns, r.max_turn, r.sum_chars)
        for r in mv.read().select("conv_id", "n_turns", "max_turn", "sum_chars").collect()
    }


def test_mv_tracks_source_across_mixed_batches(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    mv = LakeTable(spark, str(tmp_path / "mv"), n_buckets=4)
    cursor = 0

    src.merge(_batch(spark, [
        (1, "I", "a", 0, "a0"),
        (2, "I", "a", 1, "a1-long"),
        (3, "I", "b", 0, "b0"),
    ]), KEYS, batch_id=1)
    cursor = refresh_agg_mv(src, mv, ["conv_id"], _agg, cursor)
    assert _got(mv) == _expect(src)
    assert _got(mv)["a"] == (2, 1, 2 + 7)

    # update one turn, delete another, add a new conversation
    src.merge(_batch(spark, [
        (4, "U", "a", 1, "a1-v2"),
        (5, "D", "b", 0, None),
        (6, "I", "c", 0, "c0"),
    ]), KEYS, batch_id=2)
    cursor = refresh_agg_mv(src, mv, ["conv_id"], _agg, cursor)
    assert _got(mv) == _expect(src)
    # conversation b is fully gone -> deleted from the view, not zeroed
    assert "b" not in _got(mv)

    # delete the rest of a; c untouched (its view row must survive)
    src.merge(_batch(spark, [
        (7, "D", "a", 0, None),
        (8, "D", "a", 1, None),
    ]), KEYS, batch_id=3)
    cursor = refresh_agg_mv(src, mv, ["conv_id"], _agg, cursor)
    assert _got(mv) == _expect(src) == {"c": (1, 0, 2)}


def test_mv_refresh_is_idempotent_and_skips_empty_range(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    mv = LakeTable(spark, str(tmp_path / "mv"), n_buckets=4)
    src.merge(_batch(spark, [(1, "I", "a", 0, "a0"), (2, "I", "b", 0, "b0")]),
              KEYS, batch_id=1)
    v1 = refresh_agg_mv(src, mv, ["conv_id"], _agg, 0)
    before = _got(mv)
    # replay the same range: same fold, idempotent batch_id -> no change
    assert refresh_agg_mv(src, mv, ["conv_id"], _agg, 0, to_version=v1) == v1
    assert _got(mv) == before
    # nothing new committed -> cursor unchanged, no write
    mv_ver = mv.current_version()
    assert refresh_agg_mv(src, mv, ["conv_id"], _agg, v1) == v1
    assert mv.current_version() == mv_ver


def test_mv_refresh_spans_multiple_commits(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    mv = LakeTable(spark, str(tmp_path / "mv"), n_buckets=4)
    src.merge(_batch(spark, [(1, "I", "a", 0, "a0")]), KEYS, batch_id=1)
    src.merge(_batch(spark, [(2, "U", "a", 0, "a0-v2"), (3, "I", "b", 0, "b0")]),
              KEYS, batch_id=2)
    src.merge(_batch(spark, [(4, "D", "b", 0, None)]), KEYS, batch_id=3)
    # one refresh over the whole 3-commit range
    cursor = refresh_agg_mv(src, mv, ["conv_id"], _agg, 0)
    assert cursor == src.current_version()
    assert _got(mv) == _expect(src) == {"a": (1, 0, 5)}


def test_mv_agg_must_keep_keys(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), n_buckets=4)
    mv = LakeTable(spark, str(tmp_path / "mv"), n_buckets=4)
    src.merge(_batch(spark, [(1, "I", "a", 0, "a0")]), KEYS, batch_id=1)
    with pytest.raises(ValueError, match="key columns"):
        refresh_agg_mv(src, mv, ["conv_id"],
                       lambda d: d.groupBy().count(), 0)
