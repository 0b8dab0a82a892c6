"""Temporal joins: as-of (point-in-time) join and binned range join.

The reference enriches a record stream against time-versioned state with
LookupRecord / JoinEnrichment (nifi-standard-bundle .../LookupRecord.java,
JoinEnrichment.java) — but its lookup is "current value wins"; flows that
need *the value as of the event's own timestamp* have no native operator
and fall back to scripted processors. At training-data scale these two
shapes are everywhere (price as of trade time, config as of event time,
point-in-interval sessionization), so they are first-class here.

Physical strategy — both avoid the naive O(n·m) theta-join Spark would
otherwise plan (BroadcastNestedLoopJoin / cartesian):

- :func:`asof_join` is the union + carry-forward formulation: tag the two
  sides, union, ONE shuffle on the key, and a running ``last(non-null)``
  window carries each right row's payload (packed in a single struct, so
  legitimately-NULL payload fields can't bleed in older rows) forward to
  the left rows that follow it in time. Cost = one keyed window sort over
  n+m rows — the same class as any keyed window, no join blow-up. Skew:
  a hot key serializes its own history onto one reducer; pre-bucket the
  table by key or bound history with a low-watermark filter upstream.
- :func:`range_join` is the classic binned (bucketed) range join: points
  hash to ``floor(x / bin_width)``; intervals replicate to every bin they
  overlap (replication factor = interval_len / bin_width + 1, chosen by
  the caller to match the typical interval); the equi-join on the bin
  (plus any equality keys) feeds an exact residual filter. Each point
  owns exactly one bin, so no post-join dedup is needed. This is the
  same strategy as Databricks' RANGE_JOIN hint; AQE handles bin skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _ordinal(col: Column, kind: str) -> Column:
    """A sortable numeric image of a timestamp/numeric column."""
    if kind.startswith("timestamp"):  # timestamp and timestamp_ntz alike
        # microsecond-exact; unix_micros keeps sub-second order that a
        # cast-to-double would round at 2^53
        return F.unix_micros(col.cast("timestamp"))
    return col


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: dict[str, str] | None = None,
    tiebreak_col: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    matched_ts_name: str = "matched_ts",
    salt_buckets: int = 0,
) -> DataFrame:
    """Left as-of join: for every left row, the single right row with the
    greatest ``right_ts <= left_ts`` (direction='backward', inclusive) or
    the least ``right_ts >= left_ts`` ('forward'), per key. Always
    left-outer: unmatched left rows keep NULL right payload.

    ``right_cols`` maps right payload column → output name (required —
    an as-of join that carries nothing is a filter). ``tiebreak_col``
    breaks exact right-ts ties deterministically (max wins backward, min
    wins forward); defaults to the first payload column. ``tolerance``
    (a Column literal, e.g. ``F.expr("INTERVAL 1 HOUR")`` or a numeric)
    voids matches farther than that from the left timestamp — the row
    survives with NULLs, mirroring pandas.merge_asof.

    ``salt_buckets=N`` bounds the hot-key worst task: each key's timeline
    is sliced into N contiguous time ranges; left AND right rows route to
    their own slice, and each slice additionally receives ONE boundary
    row per key — the right row the carry-forward would enter the slice
    holding (the latest earlier right row backward, the earliest later
    one forward). The window then partitions on (key, slice), so a key
    holding half the data serializes 1/N of it per task instead of all
    of it, right rows are NOT replicated N× (only the per-slice boundary
    rows are), and the result is bit-identical to the unsalted plan.
    Cost: one min/max aggregate over the union (two scalars to the
    driver) + one bounded window over the right side to pick per-slice
    boundary rows. 0/1 = off (default).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if not right_cols:
        raise ValueError("right_cols: at least one right payload column required")
    reserved = {
        "_asof_side", "_asof_pack", "_asof_ord", "_asof_salt",
        "_asof_tie", "_asof_rn", "_asof_tgt",
    }
    bad = reserved & set(left.columns)
    if bad:
        raise ValueError(f"left side carries reserved internal columns: {sorted(bad)}")
    tie = tiebreak_col or next(iter(right_cols))

    ts_kind = dict(right.dtypes)[right_ts]
    pack = F.struct(
        F.col(right_ts).alias(matched_ts_name),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )
    r = right.select(
        *[F.col(k) for k in key_cols],
        _ordinal(F.col(right_ts), ts_kind).alias("_asof_ord"),
        _ordinal(F.col(tie), dict(right.dtypes)[tie]).cast("long").alias("_asof_tie"),
        pack.alias("_asof_pack"),
        F.lit(0).alias("_asof_side"),  # right sorts before left at equal ts
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in key_cols],
    ).select(  # fixed column order for the union
        *key_cols, "_asof_ord", "_asof_tie", "_asof_pack", "_asof_side",
        *[c for c in left.columns if c not in key_cols],
    )
    l = left.select(
        *key_cols,
        _ordinal(F.col(left_ts), dict(left.dtypes)[left_ts]).alias("_asof_ord"),
        F.lit(None).cast("long").alias("_asof_tie"),
        F.lit(None).cast(r.schema["_asof_pack"].dataType.simpleString()).alias(
            "_asof_pack"
        ),
        F.lit(1).alias("_asof_side"),
        *[c for c in left.columns if c not in key_cols],
    )
    u = r.unionByName(l)

    # backward: right rows sort before left at equal ts (inclusive match),
    # larger tiebreak later → last() picks max; forward is the mirror.
    asc = direction == "backward"
    order = [
        F.col("_asof_ord").asc() if asc else F.col("_asof_ord").desc(),
        F.col("_asof_side").asc(),
        F.col("_asof_tie").asc() if asc else F.col("_asof_tie").desc(),
    ]
    part_cols = list(key_cols)
    if salt_buckets and salt_buckets > 1:
        u = _salt_asof_union(u, key_cols, int(salt_buckets), asc)
        part_cols = [*key_cols, "_asof_salt"]
    w = (
        W.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("_asof_pack", ignorenulls=True).over(w)
    matched = u.withColumn("_asof_pack", carried).filter(F.col("_asof_side") == 1)

    if tolerance is not None:
        gap = (
            F.col(left_ts) - F.col(f"_asof_pack.{matched_ts_name}")
            if asc
            else F.col(f"_asof_pack.{matched_ts_name}") - F.col(left_ts)
        )
        matched = matched.withColumn(
            "_asof_pack",
            F.when(gap <= tolerance, F.col("_asof_pack")),
        )

    out_cols = (
        [F.col(k) for k in key_cols]
        + [F.col(c) for c in left.columns if c not in key_cols]
        + [F.col(f"_asof_pack.{matched_ts_name}").alias(matched_ts_name)]
        + [F.col(f"_asof_pack.{dst}").alias(dst) for dst in right_cols.values()]
    )
    return matched.select(*out_cols)


def _salt_asof_union(
    u: DataFrame, key_cols: list[str], n: int, asc: bool
) -> DataFrame:
    """Slice the asof union frame's timeline into ``n`` contiguous ranges
    and add, per (key, slice), the single right-side boundary row the
    carry-forward needs to enter that slice correctly: the LATEST right
    row from earlier slices (backward) / the EARLIEST from later slices
    (forward), chosen by exactly the ordering the main window uses, so
    the salted result is bit-identical to the unsalted one.

    Slice membership is a pure function of ``_asof_ord`` (global
    [lo, hi] from one aggregate), so both sides compute it consistently;
    boundary rows replicate at most n per (key, source-slice) and are
    reduced to one per (key, target-slice) before the union.
    """
    b = u.agg(
        F.min("_asof_ord").alias("lo"), F.max("_asof_ord").alias("hi")
    ).collect()[0]
    if b.lo is None or b.hi is None or b.hi <= b.lo:
        return u.withColumn("_asof_salt", F.lit(0))
    lo, span = b.lo, float(b.hi - b.lo)
    slice_col = F.least(
        F.floor(
            (F.col("_asof_ord") - F.lit(lo)).cast("double") / F.lit(span) * n
        ),
        F.lit(n - 1),
    ).cast("int")
    su = u.withColumn("_asof_salt", slice_col)
    rights = su.filter(F.col("_asof_side") == 0)
    # the window's carry picks the LAST row under `order`; its reverse
    # ranks that row first (asc: max(ord, tie) with nulls-last via desc)
    rev = [
        F.col("_asof_ord").desc() if asc else F.col("_asof_ord").asc(),
        F.col("_asof_tie").desc() if asc else F.col("_asof_tie").asc(),
    ]
    wlast = W.partitionBy(*key_cols, "_asof_salt").orderBy(*rev)
    last_rows = (
        rights.withColumn("_asof_rn", F.row_number().over(wlast))
        .filter(F.col("_asof_rn") == 1)
        .drop("_asof_rn")
    )
    if asc:  # backward: carry flows into LATER slices
        last_rows = last_rows.filter(F.col("_asof_salt") < n - 1)
        targets = F.sequence(F.col("_asof_salt") + 1, F.lit(n - 1))
    else:  # forward: the window scans ord desc — carry flows into EARLIER
        last_rows = last_rows.filter(F.col("_asof_salt") > 0)
        targets = F.sequence(F.lit(0), F.col("_asof_salt") - 1)
    bounds = (
        last_rows.withColumn("_asof_tgt", F.explode(targets))
        .drop("_asof_salt")
        .withColumnRenamed("_asof_tgt", "_asof_salt")
    )
    wb = W.partitionBy(*key_cols, "_asof_salt").orderBy(*rev)
    bounds = (
        bounds.withColumn("_asof_rn", F.row_number().over(wb))
        .filter(F.col("_asof_rn") == 1)
        .drop("_asof_rn")
    )
    return su.unionByName(bounds.select(*su.columns))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    on: list[str] | None = None,
    closed: str = "left",
) -> DataFrame:
    """Inner join of point rows to every interval row containing them,
    without a nested-loop plan: equi-join on ``floor(value / bin_width)``
    (intervals exploded to each bin they overlap) plus the exact residual
    predicate. ``closed`` ∈ left ([start,end)), both, right, neither.

    ``bin_width`` is in the column's native unit — seconds for
    timestamps, the raw unit for numerics. Pick it near the typical
    interval length: replication per interval is len/bin_width + 1.
    Output carries all point columns then all interval columns (shared
    ``on`` keys once).
    """
    if closed not in ("left", "both", "right", "neither"):
        raise ValueError(f"closed must be left|both|right|neither, got {closed!r}")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    on = on or []
    clash = {"_rj_bin"} & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(f"inputs carry reserved internal column: {sorted(clash)}")

    p_kind = dict(points.dtypes)[point_col]

    def to_num(c: Column, kind: str) -> Column:
        # any timestamp flavor → epoch seconds; ntz maps through the
        # session zone, a uniform shift that preserves bin containment
        # (the residual filter below compares the original columns)
        if kind.startswith("timestamp"):
            return F.unix_timestamp(c.cast("timestamp"))
        return c

    p_bin = F.floor(to_num(F.col(point_col), p_kind) / F.lit(bin_width))
    s_num = to_num(F.col(start_col), dict(intervals.dtypes)[start_col])
    e_num = to_num(F.col(end_col), dict(intervals.dtypes)[end_col])
    i_bins = F.sequence(
        F.floor(s_num / F.lit(bin_width)), F.floor(e_num / F.lit(bin_width))
    )

    p = points.withColumn("_rj_bin", p_bin)
    i = intervals.withColumn("_rj_bin", F.explode(i_bins))
    # Pin the join's partitioning explicitly: both pre-join shuffles are
    # tiny relative to the join's OUTPUT (each bin multiplies points ×
    # intervals), so AQE — which coalesces on pre-join shuffle bytes —
    # would funnel the explosion into a handful of tasks. A user
    # repartition on the join key is exempt from AQE coalescing and
    # spreads the per-bin products across the full parallelism.
    n_part = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    p = p.repartition(n_part, *on, "_rj_bin")
    i = i.repartition(n_part, *on, "_rj_bin")

    lo_ok = (
        F.col(point_col) >= F.col(start_col)
        if closed in ("left", "both")
        else F.col(point_col) > F.col(start_col)
    )
    hi_ok = (
        F.col(point_col) <= F.col(end_col)
        if closed in ("both", "right")
        else F.col(point_col) < F.col(end_col)
    )
    joined = p.join(i, on=[*on, "_rj_bin"], how="inner").filter(lo_ok & hi_ok)
    keep = (
        on
        + [c for c in points.columns if c not in on]
        + [c for c in intervals.columns if c not in on]
    )
    return joined.select(*keep)
