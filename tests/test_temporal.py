"""asof_join / range_join vs brute-force references, plus plan shape.

The brute-force oracle is a driver-side cross-product filter — O(n·m) but
exact; the operators must reproduce it bit-for-bit on deterministic
synthetic frames covering ties, NULL payloads, tolerance, direction, and
bin-boundary cases.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators.temporal import asof_join, range_join


def _mk_sides(spark):
    base = dt.datetime(2024, 1, 1)
    t = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    left = spark.createDataFrame(
        [
            ("a", t(10), 1),
            ("a", t(20), 2),
            ("a", t(5), 3),   # before any right row -> NULL match
            ("b", t(15), 4),
            ("b", t(30), 5),
            ("c", t(50), 6),  # key with no right rows at all
        ],
        "k string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            ("a", t(10), 100, 1.0),   # exact tie with left lid=1 (inclusive)
            ("a", t(18), 101, None),  # NULL payload must not bleed older value
            ("a", t(18), 102, 3.0),   # same-ts duplicate: max rid wins backward
            ("b", t(1), 103, 4.0),
            ("b", t(29), 104, 5.0),
        ],
        "k string, ts timestamp, rid int, px double",
    )
    return left, right


def _brute_asof(left_rows, right_rows, direction="backward", tol_min=None):
    out = {}
    for k, lts, lid in left_rows:
        cands = [
            r
            for r in right_rows
            if r[0] == k and (r[1] <= lts if direction == "backward" else r[1] >= lts)
        ]
        if tol_min is not None:
            lim = dt.timedelta(minutes=tol_min)
            cands = [r for r in cands if abs(r[1] - lts) <= lim]
        if not cands:
            out[lid] = (None, None, None)
            continue
        pick = (
            max(cands, key=lambda r: (r[1], r[2]))
            if direction == "backward"
            else min(cands, key=lambda r: (r[1], r[2]))
        )
        out[lid] = (pick[1], pick[2], pick[3])
    return out


LEFT_ROWS = [
    ("a", dt.datetime(2024, 1, 1, 0, 10), 1),
    ("a", dt.datetime(2024, 1, 1, 0, 20), 2),
    ("a", dt.datetime(2024, 1, 1, 0, 5), 3),
    ("b", dt.datetime(2024, 1, 1, 0, 15), 4),
    ("b", dt.datetime(2024, 1, 1, 0, 30), 5),
    ("c", dt.datetime(2024, 1, 1, 0, 50), 6),
]
RIGHT_ROWS = [
    ("a", dt.datetime(2024, 1, 1, 0, 10), 100, 1.0),
    ("a", dt.datetime(2024, 1, 1, 0, 18), 101, None),
    ("a", dt.datetime(2024, 1, 1, 0, 18), 102, 3.0),
    ("b", dt.datetime(2024, 1, 1, 0, 1), 103, 4.0),
    ("b", dt.datetime(2024, 1, 1, 0, 29), 104, 5.0),
]


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_brute_force(spark, direction):
    left, right = _mk_sides(spark)
    got = asof_join(
        left,
        right,
        ["k"],
        right_cols={"rid": "rid", "px": "px"},
        tiebreak_col="rid",
        direction=direction,
    )
    rows = {r["lid"]: (r["matched_ts"], r["rid"], r["px"]) for r in got.collect()}
    assert rows == _brute_asof(LEFT_ROWS, RIGHT_ROWS, direction)
    assert got.count() == len(LEFT_ROWS)  # left-outer: every left row survives


def test_asof_null_payload_does_not_bleed(spark):
    """A matched right row with a NULL payload field must yield NULL px,
    not the previous right row's px (the struct-pack guarantee)."""
    left, right = _mk_sides(spark)
    right = right.filter(F.col("rid") != 102)  # leave only the NULL-px row at t18
    got = asof_join(
        left, right, ["k"], right_cols={"rid": "rid", "px": "px"}, tiebreak_col="rid"
    )
    r2 = {r["lid"]: (r["rid"], r["px"]) for r in got.collect()}
    assert r2[2] == (101, None)  # matched rid=101, px NULL — not 1.0 from rid=100


def test_asof_tolerance(spark):
    left, right = _mk_sides(spark)
    got = asof_join(
        left,
        right,
        ["k"],
        right_cols={"rid": "rid", "px": "px"},
        tiebreak_col="rid",
        tolerance=F.expr("INTERVAL 5 MINUTES"),
    )
    rows = {r["lid"]: (r["matched_ts"], r["rid"], r["px"]) for r in got.collect()}
    assert rows == _brute_asof(LEFT_ROWS, RIGHT_ROWS, tol_min=5)


def test_asof_plan_single_shuffle_no_join(spark):
    """The whole as-of is one keyed window — no join operator, exactly one
    exchange beyond the source scans."""
    left, right = _mk_sides(spark)
    plan = asof_join(
        left, right, ["k"], right_cols={"rid": "rid"}, tiebreak_col="rid"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1


def _brute_range(points, ivals, closed="left"):
    lo = {"left": "ge", "both": "ge", "right": "gt", "neither": "gt"}[closed]
    hi = {"left": "lt", "neither": "lt", "both": "le", "right": "le"}[closed]
    ok_lo = (lambda p, s: p >= s) if lo == "ge" else (lambda p, s: p > s)
    ok_hi = (lambda p, e: p < e) if hi == "lt" else (lambda p, e: p <= e)
    return sorted(
        (pid, iid)
        for pid, x in points
        for iid, s, e in ivals
        if ok_lo(x, s) and ok_hi(x, e)
    )


@pytest.mark.parametrize("closed", ["left", "both", "right", "neither"])
@pytest.mark.parametrize("bin_width", [1, 3, 10, 1000])
def test_range_join_matches_brute_force(spark, closed, bin_width):
    points = [(i, float(i)) for i in range(25)]
    # intervals of assorted lengths incl. zero-length, bin-straddling, and
    # boundary-aligned ones
    ivals = [
        (0, 0.0, 5.0),
        (1, 5.0, 5.0),
        (2, 2.5, 3.5),
        (3, 9.0, 21.0),
        (4, 24.0, 30.0),
        (5, 7.0, 8.0),
    ]
    p = spark.createDataFrame(points, "pid int, x double")
    i = spark.createDataFrame(ivals, "iid int, s double, e double")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(p, i, "x", "s", "e", bin_width, closed=closed)
        .select("pid", "iid")
        .collect()
    )
    assert got == _brute_range(points, ivals, closed)


def test_range_join_timestamps_and_keys(spark):
    base = dt.datetime(2024, 1, 1)
    t = lambda h: base + dt.timedelta(hours=h)  # noqa: E731
    p = spark.createDataFrame(
        [("u1", t(1), 10), ("u1", t(5), 11), ("u2", t(1), 12)],
        "uid string, ts timestamp, pid int",
    )
    i = spark.createDataFrame(
        [("u1", t(0), t(2), 20), ("u2", t(0), t(2), 21), ("u1", t(4), t(6), 22)],
        "uid string, s timestamp, e timestamp, iid int",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(p, i, "ts", "s", "e", 3600, on=["uid"])
        .select("pid", "iid")
        .collect()
    )
    assert got == [(10, 20), (11, 22), (12, 21)]


def test_range_join_plan_no_nested_loop(spark):
    p = spark.createDataFrame([(1, 1.0)], "pid int, x double")
    i = spark.createDataFrame([(1, 0.0, 2.0)], "iid int, s double, e double")
    plan = (
        range_join(p, i, "x", "s", "e", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_reserved_column_guards(spark):
    p = spark.createDataFrame([(1, 1.0, 0)], "pid int, x double, _rj_bin int")
    i = spark.createDataFrame([(1, 0.0, 2.0)], "iid int, s double, e double")
    with pytest.raises(ValueError, match="_rj_bin"):
        range_join(p, i, "x", "s", "e", 10)
    l = spark.createDataFrame([("a", 1, 2)], "k string, ts long, _asof_pack int")
    r = spark.createDataFrame([("a", 1, 3)], "k string, ts long, rid int")
    with pytest.raises(ValueError, match="_asof_pack"):
        asof_join(l, r, ["k"], right_cols={"rid": "rid"})


# --------------------------------------------------------------------------
# salted as-of (VERDICT r4 #9 — hot-key worst-task bound, exact parity)
# --------------------------------------------------------------------------

def _hot_key_sides(spark):
    """One key ('hot') holds 50% of all left rows; brute-force oracle
    rows are returned alongside."""
    base = dt.datetime(2024, 1, 1)
    t = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    left_rows = [("hot", t(m), m) for m in range(0, 400, 2)] + [
        (f"k{m % 7}", t(m), 1000 + m) for m in range(0, 400, 2)
    ]
    right_rows = [
        (k, t(m), m * 10 + i, float(m))
        for i, k in enumerate(["hot", "k0", "k1", "k2", "k3", "k4", "k5", "k6"])
        for m in range(1, 400, 13)
    ]
    left = spark.createDataFrame(left_rows, "k string, ts timestamp, lid int")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, rid int, px double")
    return left, right, left_rows, right_rows


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_salted_matches_brute_force_and_unsalted(spark, direction):
    left, right, lrows, rrows = _hot_key_sides(spark)
    kw = dict(right_cols={"rid": "rid", "px": "px"}, tiebreak_col="rid",
              direction=direction)
    salted = asof_join(left, right, ["k"], salt_buckets=8, **kw)
    got = {r["lid"]: (r["matched_ts"], r["rid"], r["px"]) for r in salted.collect()}
    assert got == _brute_asof(lrows, rrows, direction)
    plain = asof_join(left, right, ["k"], **kw)
    want = {r["lid"]: (r["matched_ts"], r["rid"], r["px"]) for r in plain.collect()}
    assert got == want  # bit-identical to the unsalted plan
    assert salted.count() == len(lrows)


def test_asof_salted_plan_no_nested_loop(spark):
    left, right, *_ = _hot_key_sides(spark)
    plan = asof_join(
        left, right, ["k"], right_cols={"rid": "rid"}, tiebreak_col="rid",
        salt_buckets=8,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the main window partitions on (key, slice) — the hot key's rows
    # spread across salt partitions
    assert "_asof_salt" in plan


def test_asof_salted_tolerance_and_degenerate(spark):
    left, right, lrows, rrows = _hot_key_sides(spark)
    got = asof_join(
        left, right, ["k"], right_cols={"rid": "rid", "px": "px"},
        tiebreak_col="rid", tolerance=F.expr("INTERVAL 5 MINUTES"),
        salt_buckets=8,
    )
    rows = {r["lid"]: (r["matched_ts"], r["rid"], r["px"]) for r in got.collect()}
    assert rows == _brute_asof(lrows, rrows, tol_min=5)
    # degenerate: every timestamp identical -> single slice, still exact
    one = dt.datetime(2024, 1, 1)
    l1 = spark.createDataFrame([("a", one, 1)], "k string, ts timestamp, lid int")
    r1 = spark.createDataFrame([("a", one, 9, 2.0)], "k string, ts timestamp, rid int, px double")
    out = asof_join(l1, r1, ["k"], right_cols={"rid": "rid", "px": "px"},
                    tiebreak_col="rid", salt_buckets=8).collect()
    assert [(r.lid, r.rid) for r in out] == [(1, 9)]
