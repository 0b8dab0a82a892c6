"""File-level min/max stats skipping (LakeTable file_stats — the Iceberg
lower_bounds/upper_bounds analog).

Correctness contract under test: a stats-pruned read + exact residual
filter equals the unpruned read + the same filter, in every layout (COW,
MOR deltas, post-compaction, post-flatten, file:// scheme), while
skip_report proves files were actually skipped when the layout allows it.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nifi_spark.sinks.laketable import LakeTable, MAX_MANIFEST_DEPTH


def _feed(spark, lo, hi, seq0=0):
    """Keys k0..k39, ts correlated with the [lo,hi) range."""
    n = 40
    rows = [
        (seq0 + i, "U", f"k{i % n}", lo + (hi - lo) * i // (2 * n), float(i))
        for i in range(2 * n)
    ]
    return spark.createDataFrame(
        rows, "seq long, op string, k string, ts long, v double"
    )


def _assert_equiv(table, lo, hi):
    """Pruned read + residual == unpruned read + residual."""
    pred = (F.col("ts") >= lo) & (F.col("ts") <= hi)
    want = sorted(
        (r["k"], r["ts"], r["v"]) for r in table.read().filter(pred).collect()
    )
    got = sorted(
        (r["k"], r["ts"], r["v"])
        for r in table.read(stats_filter={"ts": (lo, hi)}).filter(pred).collect()
    )
    assert got == want


def test_cow_skipping_and_equivalence(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4, stats_cols=["ts"])
    # three COW merges with disjoint ts epochs → per-commit files have
    # disjoint ranges only until a bucket is rewritten; disjointness comes
    # from DIFFERENT KEY SETS per epoch (distinct buckets stay untouched)
    t.merge_events(_feed(spark, 0, 100, seq0=0), ["k"], batch_id=0)
    m = t._manifest()
    assert m["stats_cols"] == ["ts"]
    assert m["file_stats"]  # initial commit recorded bounds
    for st in m["file_stats"].values():
        lo_, hi_ = st["ts"]
        assert 0 <= lo_ <= hi_ < 100
    _assert_equiv(t, 10, 20)
    _assert_equiv(t, 500, 600)  # empty range
    rep = t.skip_report({"ts": (1000, 2000)})
    assert rep["skipped"] == rep["total"] > 0  # nothing can match


def test_mor_fold_not_broken_by_skipping(spark, tmp_path):
    """A newer delta generation outside the filter range must still mask
    the older row inside it — MOR buckets scan unpruned by design."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2, stats_cols=["ts"])
    t.append_events(
        spark.createDataFrame(
            [(1, "U", "a", 10, 1.0)], "seq long, op string, k string, ts long, v double"
        ),
        ["k"], batch_id=0,
    )
    # newer version of key 'a' with ts OUTSIDE [0,50]
    t.append_events(
        spark.createDataFrame(
            [(2, "U", "a", 999, 2.0)], "seq long, op string, k string, ts long, v double"
        ),
        ["k"], batch_id=1,
    )
    got = (
        t.read(stats_filter={"ts": (0, 50)})
        .filter((F.col("ts") >= 0) & (F.col("ts") <= 50))
        .collect()
    )
    # the live image of 'a' has ts=999 → the residual excludes it; the
    # stale ts=10 row must NOT resurrect
    assert got == []


def test_append_delta_stats_and_compaction(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=4, stats_cols=["ts"])
    t.append_events(_feed(spark, 0, 100, seq0=0), ["k"], batch_id=0)
    t.append_events(_feed(spark, 1000, 1100, seq0=1000), ["k"], batch_id=1)
    m = t._manifest()
    assert m["delta_files"]  # second batch appended as flat delta
    assert all(f in t._resolve_stats(t.current_version()) for f in m["delta_files"])
    _assert_equiv(t, 0, 50)
    _assert_equiv(t, 1000, 1050)
    # compaction rewrites per-bucket files — stats re-collected, still prune
    t.compact()
    _assert_equiv(t, 0, 50)
    rep = t.skip_report({"ts": (10**9, 2 * 10**9)})
    assert rep["skipped"] == rep["total"] > 0


def test_raw_read_prunes_delta_files(spark, tmp_path):
    """read_raw (no fold) may prune delta files; verify it actually does."""
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2, stats_cols=["ts"])
    t.append_events(_feed(spark, 0, 100, seq0=0), ["k"], batch_id=0)
    t.append_events(_feed(spark, 1000, 1100, seq0=1000), ["k"], batch_id=1)
    t.append_events(_feed(spark, 2000, 2100, seq0=2000), ["k"], batch_id=2)
    all_rows = t.read_raw().count()
    pruned = t.read_raw(stats_filter={"ts": (1000, 1099)})
    assert 0 < pruned.count() < all_rows


def test_stats_survive_manifest_flatten(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2, stats_cols=["ts"])
    for b in range(MAX_MANIFEST_DEPTH + 3):  # force a chain flatten
        t.append_events(
            _feed(spark, b * 100, b * 100 + 100, seq0=b * 1000), ["k"], batch_id=b
        )
    assert any(
        (t._manifest(v) or {}).get("base") is None
        for v in t._versions()
        if v > 1
    )  # a flatten happened
    stats = t._resolve_stats(t.current_version())
    live = [f for fl in t._bucket_files().values() for f in fl]
    live += t._manifest().get("delta_files", [])
    assert live and all(f in stats for f in live)  # no orphaned bounds
    _assert_equiv(t, 150, 250)


def test_file_scheme_uses_scan_collection(spark, tmp_path):
    """file:// path takes the Spark-scan collection branch (the one a real
    hdfs:// / s3a:// table runs) — same bounds, same pruning."""
    t = LakeTable(
        spark, "file://" + str(tmp_path / "t"), n_buckets=2, stats_cols=["ts"]
    )
    t.merge_events(_feed(spark, 0, 100, seq0=0), ["k"], batch_id=0)
    m = t._manifest()
    assert m["file_stats"]
    for st in m["file_stats"].values():
        lo_, hi_ = st["ts"]
        assert 0 <= lo_ <= hi_ < 100
    _assert_equiv(t, 10, 40)
    rep = t.skip_report({"ts": (10**9, None)})
    assert rep["skipped"] == rep["total"] > 0


def test_timestamp_bounds_normalize(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, "U", f"k{i}", base + dt.timedelta(hours=i), float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "seq long, op string, k string, ts timestamp, v double"
    )
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2, stats_cols=["ts"])
    t.merge_events(df, ["k"], batch_id=0)
    rep = t.skip_report({"ts": (base + dt.timedelta(days=30), None)})
    assert rep["skipped"] == rep["total"] > 0
    kept = t.skip_report({"ts": (base, base + dt.timedelta(hours=5))})
    assert kept["kept"] > 0


def test_no_stats_cols_is_zero_cost_and_unpruned(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge_events(_feed(spark, 0, 100, seq0=0), ["k"], batch_id=0)
    assert t._manifest().get("file_stats", {}) == {}
    # filter on an untracked column: every file kept, read still exact
    rep = t.skip_report({"ts": (10**9, None)})
    assert rep["skipped"] == 0
    _assert_equiv(t, 10, 20)


def test_old_table_upgrades_on_reopen(spark, tmp_path):
    path = str(tmp_path / "t")
    t0 = LakeTable(spark, path, n_buckets=2)
    t0.merge_events(_feed(spark, 0, 100, seq0=0), ["k"], batch_id=0)
    # reopen WITH stats_cols: next commit starts recording; old files
    # simply have no bounds and are never skipped
    t1 = LakeTable(spark, path, stats_cols=["ts"])
    t1.merge_events(_feed(spark, 1000, 1100, seq0=1000), ["k"], batch_id=1)
    assert t1._manifest()["stats_cols"] == ["ts"]
    _assert_equiv(t1, 1000, 1050)


def test_pipeline_records_stats_end_to_end(spark, tmp_path):
    """CdcPipeline(stats_cols=["ts"]): every streamed commit records ts
    bounds; a time-range skip_report prunes, and a pruned+residual read
    matches the unpruned one."""
    from nifi_spark.feedgen import generate_change_feed, materialize_feed
    from nifi_spark.streaming.job import CdcPipeline

    feed = generate_change_feed(spark, n_conversations=30, max_turns=5, max_edits=3)
    feed_dir = str(tmp_path / "feed")
    materialize_feed(feed, feed_dir, n_segments=3)
    p = CdcPipeline(
        spark,
        str(tmp_path / "t"),
        str(tmp_path / "c"),
        n_buckets=4,
        sink_mode="append",
        stats_cols=["ts"],
    )
    q = p.start(feed_dir, max_files_per_trigger=1, available_now=True)
    q.awaitTermination()
    t = p.table
    stats = t._resolve_stats(t.current_version())
    assert stats  # commits recorded bounds
    far = dt.datetime(2099, 1, 1)
    rep = t.skip_report({"ts": (far, None)})
    assert rep["skipped"] == rep["total"] > 0
    lo = dt.datetime(1970, 1, 1)
    hi = dt.datetime(2099, 1, 1)
    pred = (F.col("ts") >= lo) & (F.col("ts") <= hi)
    want = t.read().filter(pred).count()
    got = t.read(stats_filter={"ts": (lo, hi)}).filter(pred).count()
    assert got == want > 0


def test_sorted_compaction_enables_intra_bucket_skipping(spark, tmp_path):
    """compact(sort_by=..., max_records_per_file=...) splits each bucket
    into files with disjoint sort-column ranges — a narrow range filter
    then skips files even INSIDE a bucket, which unsorted compaction
    cannot (every file spans the whole range)."""
    def mk(prefix, s0):
        # unique key per row (nothing LWW-folds away), ts spread 0..999
        rows = [
            (s0 + i, "U", f"{prefix}{i}", (i * 1000) // 80, float(i))
            for i in range(80)
        ]
        return spark.createDataFrame(
            rows, "seq long, op string, k string, ts long, v double"
        )

    def build(path, **compact_kw):
        t = LakeTable(spark, path, n_buckets=2, stats_cols=["ts"])
        # two epochs interleaved across appends → unsorted bucket files
        # span the full ts range
        t.append_events(mk("a", 0), ["k"], batch_id=0)
        t.append_events(mk("b", 5000), ["k"], batch_id=1)
        t.compact(**compact_kw)
        return t

    t_plain = build(str(tmp_path / "plain"))
    t_sorted = build(
        str(tmp_path / "sorted"), sort_by=["ts"], max_records_per_file=10
    )
    # identical live data either way
    key = lambda t: sorted(  # noqa: E731
        (r["k"], r["ts"], r["v"]) for r in t.read().collect()
    )
    assert key(t_plain) == key(t_sorted)
    narrow = {"ts": (0, 99)}

    def empties(t):  # zero-row part files always skip, sorted or not
        return sum(
            1
            for s in t._resolve_stats(t.current_version()).values()
            if s.get("_nrows") == 0
        )

    rep_sorted = t_sorted.skip_report(narrow)
    rep_plain = t_plain.skip_report(narrow)
    assert rep_sorted["total"] > 2  # maxRecordsPerFile split the buckets
    # unsorted: every non-empty file spans the whole ts range → only the
    # empty part files skip; sorted: disjoint ranges prune real files too
    assert rep_plain["skipped"] == empties(t_plain)
    assert rep_sorted["skipped"] > empties(t_sorted)
    _assert_equiv(t_sorted, 0, 99)
