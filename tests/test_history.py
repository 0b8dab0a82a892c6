"""SCD2 history and before/after change-image semantics (operators/history.py)."""

from pyspark.sql import functions as F

from nifi_spark.operators.history import change_images, scd2_history


def _feed(spark):
    # key k1: insert → update → delete; key k2: single insert
    rows = [
        (1, "U", "k1", "a"),
        (5, "U", "k1", "b"),
        (9, "D", "k1", None),
        (3, "U", "k2", "x"),
    ]
    return spark.createDataFrame(rows, "seq int, op string, k string, v string")


def test_scd2_versions_and_flags(spark):
    out = scd2_history(_feed(spark), key_cols=["k"], seq_col="seq").collect()
    by = {(r.k, r.seq): r for r in out}
    assert by[("k1", 1)].valid_from_seq == 1 and by[("k1", 1)].valid_to_seq == 5
    assert by[("k1", 5)].valid_to_seq == 9 and not by[("k1", 5)].is_current
    # delete closes the key: last version is not current, flagged deleted
    assert by[("k1", 9)].valid_to_seq is None
    assert by[("k1", 9)].is_deleted and not by[("k1", 9)].is_current
    # live single-version key
    assert by[("k2", 3)].is_current and by[("k2", 3)].valid_to_seq is None


def test_change_images_envelope(spark):
    out = change_images(
        _feed(spark), key_cols=["k"], value_cols=["v"], seq_col="seq"
    ).collect()
    by = {(r.k, r.seq): r for r in out}
    assert by[("k1", 1)].change_kind == "INSERT" and by[("k1", 1)].before_v is None
    assert by[("k1", 5)].change_kind == "UPDATE" and by[("k1", 5)].before_v == "a"
    # delete: before image is last value, after image nulled
    assert by[("k1", 9)].change_kind == "DELETE"
    assert by[("k1", 9)].before_v == "b" and by[("k1", 9)].v is None
    assert by[("k2", 3)].change_kind == "INSERT"


def test_cosine_neardup_recovers_planted_clones(spark):
    from nifi_spark.operators.similarity import cosine_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    clones = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (F.lit(1.0) + ((i % 7) - 3).cast("double") * F.lit(0.015625)),
        ).alias("embedding"),
    )
    pairs = cosine_neardup_pairs(
        emb.unionByName(clones), threshold=0.9, n_tables=8, planes_per_table=8
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # every planted clone pair is recovered, nothing spurious at 0.9
    assert {(i, i + 100000) for i in range(10)} <= found
    assert all(b - a == 100000 for a, b in found)
    assert all(r.cos_sim > 0.99 for r in pairs)
