"""LshIndex — incremental (at-ingest) near-dup detection.

The load-bearing invariant: the UNION of per-batch pair outputs over ANY
split of the corpus into ingest batches equals the one-shot
minhash_dedup_pairs over the whole corpus (same ids, same exact jaccard) —
so a pipeline that checks each micro-batch against the index loses nothing
vs a periodic full self-join, at O(batch) instead of O(corpus) per batch.
"""

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators.dedup_fuzzy import minhash_dedup_pairs
from nifi_spark.operators.dedup_incremental import LshIndex

SF = "/root/testdata/sf0.001"
PARAMS = dict(n_hashes=16, shingle_n=3, n_bands=4, threshold=0.5)


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").repartition(8)


def _one_shot(spark):
    return sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_dedup_pairs(_docs(spark), "doc_id", "text", **PARAMS).collect()
    )


def _drain(idx, docs, splits):
    got = []
    for b, pred in enumerate(splits):
        got += [
            (r.id_a, r.id_b, r.jaccard)
            for r in idx.add_batch(docs.filter(pred), b).collect()
        ]
    return got


@pytest.mark.parametrize(
    "splits",
    [
        ["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"],  # even thirds
        ["doc_id < 400", "doc_id >= 400"],  # uneven halves
    ],
    ids=["thirds", "halves"],
)
def test_union_over_batches_equals_one_shot(spark, tmp_path, splits):
    idx = LshIndex(spark, str(tmp_path / "lsh"), **PARAMS)
    got = _drain(idx, _docs(spark), splits)
    assert len(got) == len(set(got)), "a pair was emitted twice"
    assert sorted(got) == _one_shot(spark)


def test_replay_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    idx = LshIndex(spark, str(tmp_path / "lsh"), **PARAMS)
    first = {}
    for b in range(3):
        first[b] = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), b).collect()
        )
    assert idx.committed_batches() == [0, 1, 2]
    # replaying ANY committed batch re-derives its pairs (blind to later
    # batches) and does not duplicate index state
    for b in (2, 0):
        again = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), b).collect()
        )
        assert again == first[b]
    assert idx.committed_batches() == [0, 1, 2]


def test_uncommitted_low_batch_id_raises(spark, tmp_path):
    docs = _docs(spark)
    idx = LshIndex(spark, str(tmp_path / "lsh"), **PARAMS)
    idx.add_batch(docs.filter(F.col("doc_id") < 100), 5, return_pairs=False)
    with pytest.raises(ValueError, match="below committed cursor"):
        idx.add_batch(docs.filter(F.col("doc_id") >= 100), 3)


def test_internal_column_collision_raises(spark, tmp_path):
    docs = _docs(spark).withColumn("sig", F.lit(1))
    idx = LshIndex(spark, str(tmp_path / "lsh"), **PARAMS)
    with pytest.raises(ValueError, match="collide"):
        idx.add_batch(docs, 0)


def test_empty_batch_is_harmless(spark, tmp_path):
    docs = _docs(spark)
    idx = LshIndex(spark, str(tmp_path / "lsh"), **PARAMS)
    a = idx.add_batch(docs.filter(F.col("doc_id") % 2 == 0), 0).collect()
    mid = idx.add_batch(docs.filter(F.lit(False)), 1).collect()
    assert mid == []
    b = idx.add_batch(docs.filter(F.col("doc_id") % 2 == 1), 2).collect()
    got = sorted((r.id_a, r.id_b, r.jaccard) for r in [*a, *mid, *b])
    assert got == _one_shot(spark)


def test_max_bucket_guard_drops_all_pairs(spark, tmp_path):
    docs = _docs(spark)
    idx = LshIndex(spark, str(tmp_path / "lsh"), max_bucket=1, **PARAMS)
    assert idx.add_batch(docs, 0).collect() == []


def test_probe_broadcasts_the_batch_not_the_index(spark, tmp_path):
    """Plan shape: the per-batch probe must broadcast the NEW side; the
    index scan streams through hash joins (no sort-merge of the corpus,
    no cartesian)."""
    docs = _docs(spark)
    idx = LshIndex(spark, str(tmp_path / "lsh"), **PARAMS)
    idx.add_batch(docs.filter(F.col("doc_id") < 700), 0, return_pairs=False)
    pairs = idx.add_batch(docs.filter(F.col("doc_id") >= 700), 1)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
