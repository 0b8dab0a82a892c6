"""Per-batch data-quality gate in CdcPipeline (operators/profile checks
evaluated over the admitted rows BEFORE the sink commit)."""

import json

import pytest
from pyspark.sql import functions as F

from nifi_spark.feedgen import generate_change_feed
from nifi_spark.streaming.job import CdcPipeline, QualityGateError

CHECKS = [
    {"check": "non_empty"},
    {"check": "complete", "column": "text", "min_fraction": 1.0},
    {"check": "in_range", "column": "turn_idx", "lo": 0, "hi": 100},
]


def _feed(spark, n=12):
    return generate_change_feed(spark, n_conversations=n, max_turns=4, max_edits=2)


def test_record_mode_persists_verdicts_and_commits(spark, tmp_path):
    p = CdcPipeline(
        spark, str(tmp_path / "t"), str(tmp_path / "ckpt"), n_buckets=4,
        sink_mode="append", quality_checks=CHECKS,
    )
    m = p.apply_batch(_feed(spark), batch_id=0)
    assert m["n_quality_failed"] == 0 and m["version"] is not None
    rec = json.loads((tmp_path / "ckpt" / "quality" / "batch_0.json").read_text())
    assert rec["batch_id"] == 0 and len(rec["checks"]) == len(CHECKS)
    assert all(c["passed"] for c in rec["checks"])
    assert p.table.read().count() > 0


def test_record_mode_flags_failure_but_still_commits(spark, tmp_path):
    # delete events carry NULL text by design — a 100%-complete text check
    # fails, record mode logs it and applies the batch anyway
    p = CdcPipeline(
        spark, str(tmp_path / "t"), str(tmp_path / "ckpt"), n_buckets=4,
        sink_mode="append", quality_checks=CHECKS,
    )
    feed = _feed(spark).withColumn(
        "text", F.when(F.col("seq") % 5 == 0, F.lit(None)).otherwise(F.col("text"))
    )
    m = p.apply_batch(feed, batch_id=0)
    assert m["n_quality_failed"] == 1 and m["version"] is not None
    rec = json.loads((tmp_path / "ckpt" / "quality" / "batch_0.json").read_text())
    bad = [c for c in rec["checks"] if not c["passed"]]
    assert bad == [c for c in rec["checks"] if c["column"] == "text"]
    assert 0 < bad[0]["metric"] < 1.0


def test_halt_mode_blocks_the_commit(spark, tmp_path):
    p = CdcPipeline(
        spark, str(tmp_path / "t"), str(tmp_path / "ckpt"), n_buckets=4,
        sink_mode="append", quality_checks=CHECKS, quality_action="halt",
    )
    feed = _feed(spark).withColumn(
        "text", F.when(F.col("seq") % 5 == 0, F.lit(None)).otherwise(F.col("text"))
    )
    with pytest.raises(QualityGateError, match="complete\\(text\\)"):
        p.apply_batch(feed, batch_id=0)
    # nothing committed: the table was never created
    assert not p.table.exists()
    # the verdict record still landed (the forensic trail survives a halt)
    assert (tmp_path / "ckpt" / "quality" / "batch_0.json").exists()
    # the fixed feed then applies cleanly under the same checkpoint
    m = p.apply_batch(_feed(spark), batch_id=0)
    assert m["version"] is not None and m["n_quality_failed"] == 0


def test_gate_composes_with_txn_mode(spark, tmp_path):
    """The gate sees post-admission rows: an open transaction's events are
    held by the txn gate, so they cannot fail a quality check."""
    from nifi_spark.feedgen import with_transactions

    p = CdcPipeline(
        spark, str(tmp_path / "t"), str(tmp_path / "ckpt"), n_buckets=4,
        sink_mode="append", txn_consistent=True,
        quality_checks=CHECKS, quality_action="halt",
    )
    # txn 0 dangles (no commit marker): poison ONLY its events — they stay
    # pending in the gate, so the quality check never sees them, the batch
    # passes, and the committed transactions apply
    feed = with_transactions(_feed(spark), txn_seq_span=50, dangling_mod=1000)
    poisoned = feed.withColumn(
        "text",
        F.when(
            (F.col("txn_id") == 0) & (F.col("op") != "C"), F.lit(None)
        ).otherwise(F.col("text")),
    )
    m = p.apply_batch(poisoned, batch_id=0)
    assert m["version"] is not None and m["n_quality_failed"] == 0


def test_invalid_action_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="quality_action"):
        CdcPipeline(
            spark, str(tmp_path / "t"), str(tmp_path / "ckpt"),
            quality_checks=CHECKS, quality_action="quarantine",
        )


def test_halt_message_is_per_check_kind(spark, tmp_path):
    """ADVICE r4: the unique check's halt message must not render the
    misleading 'metric=1.0 < 1.0' shape (its pass condition is distinct ==
    non-null count, and the rounded ratio can be 1.0 with dups present)."""
    p = CdcPipeline(
        spark, str(tmp_path / "t"), str(tmp_path / "ckpt"), n_buckets=4,
        sink_mode="append", quality_action="halt",
        quality_checks=[{"check": "unique", "column": "text"}],
    )
    feed = _feed(spark).withColumn("text", F.lit("same"))
    with pytest.raises(QualityGateError) as ei:
        p.apply_batch(feed, batch_id=0)
    msg = str(ei.value)
    assert "duplicate non-null values" in msg
    assert " < " not in msg
