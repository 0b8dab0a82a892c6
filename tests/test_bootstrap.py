"""Tests: snapshot bootstrap → incremental handoff.

Reference contract: CaptureChangeMySQL's "Retrieve All Records" /
Initial Binlog Filename+Position startup (CaptureChangeMySQL.java:
328-334) — either replay the whole history or start from a declared
snapshot position; both must converge to the same final table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_spark.feedgen import generate_change_feed, materialize_feed
from nifi_spark.lineage import read_lineage
from nifi_spark.operators.ordering import lww_fold
from nifi_spark.streaming.job import CdcPipeline

from .oracle import assert_final_state_equal, pandas_fold


def _snapshot_at(feed, snapshot_seq):
    """Consistent table image as of log position snapshot_seq: LWW fold
    of the history prefix, deletes absent."""
    prefix = feed.filter(F.col("seq") <= snapshot_seq)
    folded = lww_fold(prefix, key_cols=["conv_id", "turn_idx"], seq_col="seq")
    return folded.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


@pytest.mark.parametrize("tail_only", [False, True])
def test_bootstrap_then_stream_converges(spark, tmp_path, tail_only):
    feed = generate_change_feed(spark, n_conversations=40, max_turns=6, max_edits=4)
    seqs = sorted(r[0] for r in feed.select("seq").collect())
    snapshot_seq = seqs[len(seqs) // 2]  # mid-log snapshot position

    mode = "tail" if tail_only else "full"
    p = CdcPipeline(
        spark, str(tmp_path / f"table_{mode}"), str(tmp_path / f"ckpt_{mode}"),
        n_buckets=8,
    )
    v0 = p.bootstrap(_snapshot_at(feed, snapshot_seq), snapshot_seq)
    assert v0 >= 1

    # replay either the full overlapping log or only the tail
    replay = feed if not tail_only else feed.filter(F.col("seq") > snapshot_seq)
    feed_dir = str(tmp_path / f"feed_{mode}")
    materialize_feed(replay, feed_dir, n_segments=3)
    q = p.start(feed_dir, max_files_per_trigger=1, available_now=True)
    q.awaitTermination()

    got = (
        p.table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
    )
    assert_final_state_equal(got, pandas_fold(feed.toPandas()))

    # provenance covers the initial load: lineage batch_id -1 with the
    # snapshot position range, then the stream's batches
    lin = read_lineage(spark, p.table_path).toPandas()
    boot = lin[lin["batch_id"] == -1]
    assert len(boot) == 1
    assert int(boot.iloc[0]["max_seq"]) == snapshot_seq
    assert (lin["batch_id"] >= 0).sum() >= 1


def test_bootstrap_refuses_existing_table(spark, tmp_path):
    feed = generate_change_feed(spark, n_conversations=5, max_turns=3, max_edits=2)
    p = CdcPipeline(spark, str(tmp_path / "t"), str(tmp_path / "c"), n_buckets=4)
    p.bootstrap(_snapshot_at(feed, 10**18), 10**18)
    with pytest.raises(ValueError, match="empty table"):
        p.bootstrap(_snapshot_at(feed, 10**18), 10**18)
