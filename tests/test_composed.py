"""Composition test: snapshot bootstrap + transaction-consistent apply +
in-stream DDL + arrival disorder + kill/resume, in ONE pipeline.

Each feature is tested in isolation elsewhere (test_bootstrap, test_txn,
test_ddl, test_pipeline); production incidents live in the interactions,
so this replays a feed exercising all of them and asserts the final
table equals the committed-transactions-only fold of the full log.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from nifi_spark.feedgen import (
    generate_change_feed,
    materialize_feed,
    with_ddl,
    with_transactions,
)
from nifi_spark.lineage import lineage_audit
from nifi_spark.operators.ordering import lww_fold
from nifi_spark.streaming.job import CdcPipeline

from .oracle import assert_final_state_equal, pandas_fold


def test_bootstrap_txn_ddl_disorder_resume(spark, tmp_path):
    SPAN, DANGLING_MOD = 400_000, 9
    feed = generate_change_feed(
        spark, n_conversations=40, max_turns=6, max_edits=4,
        hot_keys=5, hot_extra_edits=10, ts_jitter_s=2,
    )
    seqs = sorted(r[0] for r in feed.select("seq").collect())
    snapshot_seq = seqs[len(seqs) // 3]

    # snapshot image as of snapshot_seq (bootstrap is transaction-agnostic:
    # a DB snapshot only ever contains committed state)
    snap = lww_fold(
        feed.filter(F.col("seq") <= snapshot_seq),
        key_cols=["conv_id", "turn_idx"], seq_col="seq",
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")

    # tail: txn-delimited, one DDL event injected, bounded arrival disorder
    tail = feed.filter(F.col("seq") > snapshot_seq)
    tail = with_ddl(
        spark, tail,
        [(int(seqs[-1]) + 17, "ALTER TABLE conversations ADD COLUMN note string")],
    )
    tail = with_transactions(tail, txn_seq_span=SPAN, dangling_mod=DANGLING_MOD)
    seg_dir = str(tmp_path / "segs")
    materialize_feed(tail, seg_dir, n_segments=4, disorder_window=50)
    parts = sorted(
        f for f in os.listdir(seg_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    assert len(parts) == 4

    table_path, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)

    # phase 1: bootstrap, then drain the first two segments and "crash"
    p1 = CdcPipeline(
        spark, table_path, ckpt, n_buckets=8,
        txn_consistent=True, from_json_payload=True,
    )
    p1.bootstrap(snap, snapshot_seq)
    for f in parts[:2]:
        shutil.copy(os.path.join(seg_dir, f), feed_dir)
    q = p1.start(feed_dir, max_files_per_trigger=1, available_now=True)
    q.awaitTermination()

    # phase 2: fresh pipeline object, same checkpoint (resume), rest arrives
    for f in parts[2:]:
        shutil.copy(os.path.join(seg_dir, f), feed_dir)
    p2 = CdcPipeline(
        spark, table_path, ckpt, n_buckets=8,
        txn_consistent=True, from_json_payload=True,
    )
    q = p2.start(feed_dir, max_files_per_trigger=1, available_now=True)
    q.awaitTermination()

    # expected: snapshot state ∪ committed-txn tail events, LWW-folded.
    # A transaction is committed iff its txn_id survives dangling_mod.
    pdf = feed.toPandas()
    is_tail = pdf["seq"] > snapshot_seq
    committed_tail = is_tail & ((pdf["seq"] // SPAN) % DANGLING_MOD != 0)
    expected = pandas_fold(pdf[(~is_tail) | committed_tail])
    assert len(pdf[is_tail & ~committed_tail])  # dangling txns really exist

    got = (
        p2.table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
    )
    assert_final_state_equal(got, expected)

    # the DDL landed, the provenance chain is clean, replay is a no-op
    assert "note" in [f.name for f in p2.table.schema().fields]
    assert lineage_audit(spark, table_path, txn_mode=True).count() == 0
    v = p2.table.current_version()
    p3 = CdcPipeline(
        spark, table_path, ckpt, n_buckets=8,
        txn_consistent=True, from_json_payload=True,
    )
    q = p3.start(feed_dir, max_files_per_trigger=1, available_now=True)
    q.awaitTermination()
    assert p3.table.current_version() == v
