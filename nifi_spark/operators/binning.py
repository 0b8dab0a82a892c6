"""Record binning and per-group rate control — MergeRecord / ControlRate.

Reference semantics (SURVEY.md §2.6):

* MergeRecord bins incoming records by a correlation attribute and flushes
  a bin when it reaches *Maximum Number of Records* or exceeds *Max Bin
  Age* (reference
  nifi-standard-processors/.../standard/MergeRecord.java:241-271 property
  set, .../standard/merge/RecordBinManager.java bin lifecycle). Bins
  below *Minimum Number of Records* wait (in batch replay: they flush at
  end-of-input, flagged ``underfilled``).
* ControlRate admits at most N records (or an aggregate byte budget) per
  *Time Duration* per value of the *Grouping Attribute* (reference
  .../standard/ControlRate.java:140-193 throttle bookkeeping); excess
  records route to the throttled side (NiFi re-queues them — in a batch
  replay the deterministic equivalent is routing them to the next window
  or out).

Spark-first design: both are pure window/aggregation plans — one shuffle
on the correlation/group key, no UDFs, no driver loops — so they scale to
arbitrarily many groups. The deterministic batch semantics replay NiFi's
time-driven behavior by deriving bin/window boundaries from the record's
own timestamp column instead of wall-clock arrival:

* bin age bucket  = floor((ts - first_ts_of_group) / max_bin_age)
* bin count index = floor(rank_within_age_bucket / max_records)

This makes bin assignment a pure function of the input (replayable,
oracle-checkable) while preserving the flush triggers: a bin never holds
more than ``max_records`` rows nor spans more than ``max_bin_age``.

The streaming variant (:func:`bin_flush_stream`) keeps open bins as
per-key state via ``applyInPandasWithState`` and flushes on count or
processing-time age, mirroring RecordBinManager's timer thread.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_oversized_groups(
    df: DataFrame,
    group_col: str,
    size_col: str,
    max_group_rows: int | None = None,
    max_group_bytes: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Route groups exceeding a row/byte bound out BEFORE they are
    collected (≙ MergeContent's max-entries / max-group-size thresholds,
    reference MergeContent.java:115-127 MAX_ENTRIES/MAX_SIZE properties).

    The collect_list-shaped operators (assemble_transcripts, txn_group,
    defragment) materialize each group as ONE array in ONE task — a
    pathological group (a conversation with 10^8 turns, a transaction
    that never committed upstream) OOMs that task and kills the whole
    job. This guard aggregates per-group row and byte counts first (one
    map-side-combined shuffle of counters, never payloads), then
    anti-joins the oversized ids out of the data — the bad group is never
    collected. The anti-join side is left to AQE: usually a handful of
    pathological ids (broadcast), but a tight threshold can flag a
    constant fraction of all groups, where a forced broadcast would be
    its own scale bomb.

    Returns ``(ok_rows, overflow)`` where ``overflow`` has one row per
    oversized group: ``(group_col, n_rows, n_bytes, reason)`` with reason
    ``group-overflow`` — the DLQ shape the streaming pipeline uses.
    """
    cond = F.lit(False)
    if max_group_rows is not None:
        cond = cond | (F.col("n_rows") > max_group_rows)
    if max_group_bytes is not None:
        cond = cond | (F.col("n_bytes") > max_group_bytes)
    sizes = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.octet_length(F.col(size_col).cast("string"))), F.lit(0)
        ).alias("n_bytes"),
    )
    over = sizes.filter(cond).withColumn("reason", F.lit("group-overflow"))
    # no forced broadcast: with a tight threshold the overflow set can be
    # a constant FRACTION of all groups (e.g. max_group_rows=5 over
    # lineitem flags ~20% of orders), and F.broadcast() of an O(corpus)
    # id set is itself the scale bomb this guard exists to prevent. AQE
    # broadcasts the anti-join side when it measures small and falls back
    # to a shuffled join when it is not.
    ok = df.join(over.select(group_col), group_col, "left_anti")
    return ok, over


def _expr_duration_seconds(duration: str) -> float:
    """Parse '10 minutes' / '1 hour' / '30 seconds' to seconds."""
    n, _, unit = duration.strip().partition(" ")
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit.strip().lower()]
    return float(n) * mult


def assign_bins(
    df: DataFrame,
    correlation_cols: list[str],
    order_col: str,
    max_records: int,
    max_bin_age: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """MergeRecord bin assignment: adds ``bin_id`` (0-based per correlation
    group) as a deterministic function of (correlation, order, ts).

    One shuffle on the correlation key; the two window functions reuse the
    same partitioning (single Exchange in the physical plan). ``bin_id``
    enumerates bins in (age_bucket, count_index) order.
    """
    if max_records < 1:
        raise ValueError("max_records must be >= 1")
    part = Window.partitionBy(*correlation_cols)
    if max_bin_age is not None:
        if ts_col is None:
            raise ValueError("ts_col is required when max_bin_age is set")
        age_s = _expr_duration_seconds(max_bin_age)
        # unix_micros, not cast-to-double: parquet timestamps may be NTZ
        # (not castable to double); the LTZ hop cancels out in the diff
        us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
        age_bucket = F.floor(
            (us - F.min(us).over(part)) / F.lit(age_s * 1_000_000.0)
        ).cast("int")
    else:
        age_bucket = F.lit(0)
    df = df.withColumn("_age_bucket", age_bucket)
    w = Window.partitionBy(*correlation_cols, "_age_bucket").orderBy(
        F.asc(order_col)
    )
    count_idx = F.floor((F.row_number().over(w) - 1) / F.lit(max_records))
    df = df.withColumn("_count_idx", count_idx.cast("int"))
    # enumerate (age_bucket, count_idx) pairs densely per correlation group
    wb = Window.partitionBy(*correlation_cols).orderBy("_age_bucket", "_count_idx")
    return df.withColumn(
        "bin_id", (F.dense_rank().over(wb) - 1).cast("int")
    ).drop("_age_bucket", "_count_idx")


def assemble_bins(
    df: DataFrame,
    correlation_cols: list[str],
    order_col: str,
    content_col: str,
    max_records: int,
    min_records: int = 1,
    max_bin_age: str | None = None,
    ts_col: str | None = None,
    sep: str = ",",
) -> DataFrame:
    """MergeRecord end-to-end: bin, then merge each bin to one output row
    (record count, order span, packed content, underfilled flag — NiFi's
    ``merged`` relationship plus the min-records wait made explicit).

    The content pack is an in-group ``array_sort(collect_list(struct))`` —
    map-side partial aggregation applies and the struct sort key is the
    order column, so content ordering is deterministic without a sort
    exchange (same idiom as enrich.defragment).
    """
    binned = assign_bins(
        df, correlation_cols, order_col, max_records,
        max_bin_age=max_bin_age, ts_col=ts_col,
    )
    packed = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("o"),
                                        F.col(content_col).cast("string").alias("c")))
            ),
            lambda s: s["c"],
        ),
        sep,
    )
    return (
        binned.groupBy(*correlation_cols, "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min(order_col).alias("first_order"),
            F.max(order_col).alias("last_order"),
            packed.alias("merged"),
        )
        .withColumn("underfilled", F.col("n_records") < F.lit(min_records))
    )


def control_rate(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    max_per_window: int,
    window_duration: str,
    order_cols: list[str] | None = None,
    size_col: str | None = None,
    max_size_per_window: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """ControlRate per-group admission: at most ``max_per_window`` records
    (and optionally ``max_size_per_window`` total ``size_col``) per
    grouping value per tumbling ``window_duration``.

    Returns ``(admitted, throttled)``. Deterministic batch replay of the
    reference's throttle (ControlRate.java:140-193): window = the record's
    own time bucket, admission order = (ts, *order_cols). One shuffle on
    (group, window); both outputs reuse the same windowed plan.
    """
    win = F.window(F.col(ts_col), window_duration).start.alias("window_start")
    df = df.withColumn("window_start", win)
    order = [F.asc(ts_col)] + [F.asc(c) for c in (order_cols or [])]
    w = Window.partitionBy(*group_cols, "window_start").orderBy(*order)
    cond: Column = F.row_number().over(w) <= F.lit(max_per_window)
    if size_col is not None and max_size_per_window is not None:
        running = F.sum(size_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cond = cond & (running <= F.lit(max_size_per_window))
    flagged = df.withColumn("_admit", cond)
    admitted = flagged.filter(F.col("_admit")).drop("_admit")
    throttled = flagged.filter(~F.col("_admit")).drop("_admit")
    return admitted, throttled


def duplicate_records(df: DataFrame, n_copies: int, idx_col: str = "copy_idx") -> DataFrame:
    """DuplicateFlowFile (reference .../standard/DuplicateFlowFile.java):
    emit the original plus ``n_copies`` copies, each stamped with a copy
    index (0 = original). A generator explode — no shuffle, no driver loop.
    """
    if n_copies < 0:
        raise ValueError("n_copies must be >= 0")
    return df.withColumn(
        idx_col, F.explode(F.sequence(F.lit(0), F.lit(n_copies)))
    )
