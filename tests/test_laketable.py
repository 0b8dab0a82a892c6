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


# ----------------------------------------------------- metadata scaling


def test_delta_manifests_bounded_and_flatten(spark, tmp_path):
    """200 commits: every manifest lists only its touched buckets (O(touched),
    not O(table files)), the base chain is depth-bounded with periodic
    flattens, and head discovery uses the _latest hint instead of listing."""
    import json

    from nifi_spark.sinks.laketable import MAX_MANIFEST_DEPTH

    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=64)
    # one real merge to create the table with a real schema + real files
    t.merge(_batch(spark, [(1, "I", "c1", 0, "user", "v1", None, TS)]), KEYS, batch_id=1)
    head = t._manifest()
    # 199 metadata-only commits (the manifest path is pure driver code —
    # exercising it without 199 Spark jobs): each touches 2 of 64 buckets
    all_files = dict(t._resolve_files(t.current_version()))
    for i in range(2, 201):
        b1, b2 = str(i % 64), str((i * 7) % 64)
        fake = {b1: [f"mem://f{i}a.parquet"], b2: [f"mem://f{i}b.parquet"]}
        all_files.update(fake)

        def build(h, fake=fake):
            depth = int(h.get("depth", 0)) + 1
            if depth > MAX_MANIFEST_DEPTH:
                files = dict(t._resolve_files(h["version"]))
                files.update(fake)
                return {"schema": h["schema"], "n_buckets": 64, "files": files,
                        "base": None, "depth": 0, "summary": {"batch_id": None}}
            return {"schema": h["schema"], "n_buckets": 64, "files": fake,
                    "base": h["version"], "depth": depth, "summary": {"batch_id": None}}

        t._commit(build)
    assert t.current_version() == 200
    # manifest size is O(touched): delta manifests list exactly 2 buckets
    sizes = []
    for v in (50, 120, 200):
        m = json.loads(open(tmp_path / "t" / "_commits" / f"v{v:08d}.json").read())
        sizes.append(len(m["files"]))
        assert m.get("depth", 0) <= MAX_MANIFEST_DEPTH
    assert all(s <= 66 for s in sizes)  # never the whole table re-listed
    deltas = [s for s in sizes if s == 2]
    assert deltas, "expected delta manifests among sampled versions"
    # resolution equals the incrementally-tracked ground truth
    assert t._resolve_files(200) == all_files
    # cold read cost is bounded: a fresh instance resolves through at most
    # MAX_MANIFEST_DEPTH manifest reads (chain flatten guarantees it)
    t2 = LakeTable(spark, str(tmp_path / "t"), n_buckets=64)
    reads = []
    orig = t2._io.read_text
    t2._io.read_text = lambda p: (reads.append(p), orig(p))[1]
    t2._bucket_files()
    manifest_reads = [p for p in reads if p.endswith(".json")]
    assert len(manifest_reads) <= MAX_MANIFEST_DEPTH + 1
    # _latest hint: head discovery did not list the commit dir
    assert t2.current_version() == 200


def test_expire_snapshots_bounds_metadata(spark, tmp_path):
    """expire_snapshots keeps the newest keep_n (plus their base chains),
    deletes older manifests and unreferenced data files; the head and
    recent time travel stay intact."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    for i in range(1, 9):
        t.merge(
            _batch(spark, [(i, "I", f"c{i}", 0, "user", f"v{i}", None, TS)]),
            KEYS, batch_id=i,
        )
    assert t.current_version() == 8
    stats = t.expire_snapshots(keep_n=3)
    assert stats["manifests_deleted"] >= 1
    assert stats["data_files_deleted"] >= 1
    # head still reads all 8 rows
    assert len(_rows(t)) == 8
    # recent snapshots still time-travel (fresh instance, no caches)
    t2 = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    assert len(t2.read(version=7).collect()) == 7
    assert len(_rows(t2)) == 8
    # expired snapshot's manifest is gone
    versions_left = t2._versions()
    assert 8 in versions_left and len(versions_left) < 8
    # a new merge after expiry still works
    t2.merge(_batch(spark, [(99, "I", "c99", 0, "user", "v99", None, TS)]), KEYS, batch_id=99)
    assert len(_rows(t2)) == 9


def test_type_widening_cow_and_mor(spark, tmp_path):
    """Iceberg-style widening: int payload evolves to long / float to
    double mid-stream; old (narrow) data files are read through the
    widened schema without rewriting."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    b1 = spark.createDataFrame(
        [(1, "I", "c1", 10, 1.5)], "seq long, op string, k string, n int, x float"
    )
    t.merge(b1, ["k"], batch_id=1)
    assert dict(t.read().dtypes)["n"] == "int"

    # COW merge with widened types
    b2 = spark.createDataFrame(
        [(2, "I", "c2", 5_000_000_000, 2.5)],
        "seq long, op string, k string, n long, x double",
    )
    t.merge(b2, ["k"], batch_id=2)
    got = {r.k: (r.n, r.x) for r in t.read().collect()}
    assert dict(t.read().dtypes) == {"k": "string", "n": "bigint", "x": "double"}
    assert got["c1"] == (10, 1.5) and got["c2"] == (5_000_000_000, 2.5)

    # MOR append with a narrower batch: files stay narrow, reader widens
    b3 = spark.createDataFrame(
        [(3, "I", "c3", 7, 3.5)], "seq long, op string, k string, n int, x float"
    )
    t.append_events(b3, ["k"], batch_id=3)
    got = {r.k: (r.n, r.x) for r in t.read().collect()}
    assert got["c3"] == (7, 3.5) and got["c2"] == (5_000_000_000, 2.5)
    assert dict(t.read().dtypes)["n"] == "bigint"

    # MOR append that widens further is also legal schema-wise
    b4 = spark.createDataFrame(
        [(4, "U", "c1", 11, 9.25)], "seq long, op string, k string, n long, x double"
    )
    t.append_events(b4, ["k"], batch_id=4)
    assert {r.k: r.n for r in t.read().collect()}["c1"] == 11

    # compaction folds all generations under the widened schema
    t.compact()
    assert dict(t.read().dtypes)["n"] == "bigint"
    assert {r.k: (r.n, r.x) for r in t.read().collect()}["c2"] == (5_000_000_000, 2.5)


def test_illegal_type_evolution_raises(spark, tmp_path):
    from nifi_spark.sinks.laketable import SchemaEvolutionError

    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(
        spark.createDataFrame([(1, "I", "c1", 1.0)], "seq long, op string, k string, x double"),
        ["k"], batch_id=1,
    )
    # double -> long is a narrowing: refused
    with pytest.raises(SchemaEvolutionError):
        t.merge(
            spark.createDataFrame([(2, "U", "c1", 2)], "seq long, op string, k string, x long"),
            ["k"], batch_id=2,
        )
    # string -> int on a payload col: refused
    t2 = LakeTable(spark, str(tmp_path / "t2"), n_buckets=2)
    t2.merge(
        spark.createDataFrame([(1, "I", "c1", "s")], "seq long, op string, k string, x string"),
        ["k"], batch_id=1,
    )
    with pytest.raises(SchemaEvolutionError):
        t2.merge(
            spark.createDataFrame([(2, "U", "c1", 3)], "seq long, op string, k string, x int"),
            ["k"], batch_id=2,
        )


def test_reopen_adopts_manifest_bucket_count(spark, tmp_path):
    """Re-opening an existing table with a different n_buckets must adopt
    the manifest's layout — otherwise keys hash to different buckets and
    the merge join silently duplicates them."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    t8 = LakeTable(spark, path, n_buckets=8)
    df = spark.createDataFrame(
        [(f"k{i}", 0, f"v{i}", 1) for i in range(50)],
        "conv_id string, turn_idx int, text string, seq long",
    )
    t8.merge_events(df.withColumn("op", F.lit("I")), ["conv_id", "turn_idx"], batch_id=0)

    # reopen with a mismatched constructor value
    t64 = LakeTable(spark, path, n_buckets=64)
    assert t64.n_buckets == 8
    upd = spark.createDataFrame(
        [(f"k{i}", 0, f"v{i}b", 2) for i in range(50)],
        "conv_id string, turn_idx int, text string, seq long",
    )
    t64.merge_events(upd.withColumn("op", F.lit("U")), ["conv_id", "turn_idx"], batch_id=1)

    out = t64.read().select("conv_id", "text").collect()
    assert len(out) == 50  # no duplicated keys across buckets
    assert all(r["text"].endswith("b") for r in out)


def test_rebucket_layout_evolution(spark, tmp_path):
    """rebucket() rewrites the table under a new bucket count: state
    identical, tombstone guard intact, MOR debt folded away, merges keep
    working under the new layout."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    t = LakeTable(spark, path, n_buckets=4)
    mk = lambda rows: spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, seq long"
    )
    ins = mk([(f"k{i}", 0, f"v{i}", 1) for i in range(40)])
    t.merge_events(ins.withColumn("op", F.lit("I")), ["conv_id", "turn_idx"], batch_id=0)
    # a delete whose tombstone must survive the rewrite
    t.merge_events(
        mk([("k0", 0, None, 5)]).withColumn("op", F.lit("D")),
        ["conv_id", "turn_idx"], batch_id=1,
    )
    # merge-on-read debt that must fold away
    t.append_events(
        mk([("k1", 0, "v1-mor", 6)]).withColumn("op", F.lit("U")),
        ["conv_id", "turn_idx"], batch_id=2,
    )
    before = {(r.conv_id, r.text) for r in t.read().select("conv_id", "text").collect()}

    v = t.rebucket(16)
    assert t.n_buckets == 16
    m = t._manifest(v)
    assert m["n_buckets"] == 16 and m["mor_buckets"] == [] and m["base"] is None
    after = {(r.conv_id, r.text) for r in t.read().select("conv_id", "text").collect()}
    assert after == before and ("k1", "v1-mor") in after

    # stale update for the deleted key must still lose to the tombstone
    t2 = LakeTable(spark, path)  # fresh open adopts 16
    assert t2.n_buckets == 16
    t2.merge_events(
        mk([("k0", 0, "stale", 3)]).withColumn("op", F.lit("U")),
        ["conv_id", "turn_idx"], batch_id=3,
    )
    assert t2.read().filter(F.col("conv_id") == "k0").count() == 0
    # and a genuinely newer write works under the new layout
    t2.merge_events(
        mk([("k2", 0, "v2-new", 9)]).withColumn("op", F.lit("U")),
        ["conv_id", "turn_idx"], batch_id=4,
    )
    got = t2.read().filter(F.col("conv_id") == "k2").collect()
    assert [r.text for r in got] == ["v2-new"]
