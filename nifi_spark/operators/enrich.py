"""Joins / enrichment — NiFi's lookup & two-branch correlation, Spark-first.

NiFi has no shuffle; its joins are per-record lookups (LookupRecord against
a LookupService, reference .../standard/LookupRecord.java:97-111) or
buffered two-FlowFile joins (ForkEnrichment/JoinEnrichment,
JoinEnrichment.java:100-143). Spark replaces both with real distributed
joins; the mapping decisions:

- **LookupRecord ≙ broadcast hash join.** The lookup table is a dimension —
  ship it to every executor (`F.broadcast`), so enrichment is a map-side
  operation with zero shuffle of the fact stream. At 100 TB of facts this
  is the only acceptable plan; a shuffle join on the fact side is the
  classic scale bug.
- **matched/unmatched routing ≙ join type.** NiFi routes records whose
  lookup missed to `unmatched` (LookupRecord.java:100); Spark: `left` join
  + null check, or `left_semi`/`left_anti` when only the routing matters
  (semi/anti never widen the row — cheaper).
- **JoinEnrichment strategies** (JoinEnrichment.java:104-109): Wrapper →
  nest both sides as structs; Insert Enrichment Fields → index-correlated
  zip (row_number join); SQL → arbitrary `spark.sql` over both views
  (Calcite ≙ Catalyst).
- **Defragment ≙ groupBy + ordered collect.** MergeContent's Defragment
  mode (MergeContent.java:115-127) reassembles fragments by
  fragment.identifier/index/count — in Spark a hash aggregation with
  `sort_array(collect_list(struct(idx, payload)))`; map-side partial
  aggregation keeps shuffle volume at one packed row per fragment id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup(
    df: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich each row from a dimension table (≙ LookupRecord).

    ``broadcast_dim=True`` is the default because NiFi lookup services are
    by construction small/cached side inputs; set False only when the
    dimension is too large to broadcast — Catalyst/AQE then picks SMJ.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return df.join(d, on=on, how=how)


def lookup_routed(
    df: DataFrame, dim: DataFrame, on: list[str], broadcast_dim: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(matched, unmatched) routing (≙ LookupRecord.java:100 relationships).

    Uses semi/anti joins — no payload widening, no duplicate inflation when
    the dim has repeated keys.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return (
        df.join(d, on=on, how="left_semi"),
        df.join(d, on=on, how="left_anti"),
    )


def join_enrichment_wrapper(
    original: DataFrame, enrichment: DataFrame, on: list[str]
) -> DataFrame:
    """Wrapper strategy: nest both sides (JoinEnrichment.java:104 "Wrapper")."""
    o = original.select(*on, F.struct(*[c for c in original.columns if c not in on]).alias("original"))
    e = enrichment.select(*on, F.struct(*[c for c in enrichment.columns if c not in on]).alias("enrichment"))
    return o.join(e, on=on, how="left")


def _global_index(df: DataFrame, order_col: str) -> DataFrame:
    """Deterministic 1-based global index by ``order_col`` WITHOUT a
    single-partition window: range-partition by the order column (so
    partition p holds a contiguous, sorted slice), count rows per
    partition (tiny aggregate, one row per partition), broadcast the
    cumulative offsets back, and add the within-partition rank. This is
    the DataFrame restatement of ``zipWithIndex`` — every stage is
    parallel; the only driver-side data is the per-partition counts.
    """
    from pyspark.sql import Window as W

    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = df.repartitionByRange(n_parts, F.col(order_col))
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    counts = (
        ranged.groupBy("_pid").count().collect()
    )  # bounded: one row per partition
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = W.partitionBy("_pid").orderBy(F.col(order_col))
    return ranged.withColumn(
        "_ix", (off_map[F.col("_pid")] + F.row_number().over(w)).cast("long")
    ).drop("_pid")


def join_enrichment_indexed(
    original: DataFrame, enrichment: DataFrame, order_col: str
) -> DataFrame:
    """Insert-Enrichment-Fields strategy: zip row i with row i.

    ≙ IndexCorrelatedJoinStrategy (reference
    .../standard/enrichment/IndexCorrelatedJoinStrategy.java): NiFi
    correlates the i-th record of the original FlowFile with the i-th of
    the enrichment, ordered by a deterministic ``order_col`` on both
    sides. The index is computed per-partition with broadcast offsets
    (:func:`_global_index`) — no single-partition global sort.
    """
    o = _global_index(original, order_col)
    e = _global_index(enrichment, order_col)
    dup = [c for c in e.columns if c in o.columns and c != "_ix"]
    return o.join(e.drop(*dup), on="_ix", how="left").drop("_ix")


def join_enrichment_sql(
    original: DataFrame, enrichment: DataFrame, sql: str
) -> DataFrame:
    """SQL strategy: arbitrary join SQL over views `original`/`enrichment`.

    ≙ SqlJoinStrategy (reference .../standard/enrichment/SqlJoinStrategy.java:34,
    Calcite `SELECT … FROM original JOIN enrichment ON …`); here Catalyst
    plans it (broadcast vs sort-merge chosen by stats + AQE).
    """
    original.createOrReplaceTempView("original")
    enrichment.createOrReplaceTempView("enrichment")
    return original.sparkSession.sql(sql)


def defragment(
    df: DataFrame,
    frag_id: str,
    frag_index: str,
    payload_col: str,
    sep: str = "",
    count_col: str | None = None,
    max_group_rows: int | None = None,
    max_group_bytes: int | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Reassemble fragments into one row per fragment id, index order.

    ≙ MergeContent Defragment mode (reference MergeContent.java:115-127,
    fragment.identifier/fragment.index/fragment.count attributes). Output:
    (frag_id, n_fragments, merged). When ``count_col`` is given, rows whose
    group is incomplete (n != declared count) route out separately in NiFi;
    here they are flagged with ``complete=false``.

    With ``max_group_rows`` / ``max_group_bytes`` set, oversized fragment
    groups route out BEFORE collection (≙ MergeContent max-entries/size)
    and the return becomes ``(merged, overflow)`` —
    binning.split_oversized_groups shape.
    """
    overflow = None
    if max_group_rows is not None or max_group_bytes is not None:
        from .binning import split_oversized_groups

        df, overflow = split_oversized_groups(
            df, frag_id, payload_col, max_group_rows, max_group_bytes
        )
    agg = (
        df.groupBy(frag_id)
        .agg(
            F.count("*").alias("n_fragments"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(frag_index).alias("i"), F.col(payload_col).alias("p")))
                    ),
                    lambda s: s["p"].cast("string"),
                ),
                sep,
            ).alias("merged"),
            *([F.max(count_col).alias("_declared")] if count_col else []),
        )
    )
    if count_col:
        agg = agg.withColumn("complete", F.col("n_fragments") == F.col("_declared")).drop("_declared")
    return agg if overflow is None else (agg, overflow)


def detect_duplicate(
    df: DataFrame, key: Column, keep: str = "first", order_col: str = None
) -> DataFrame:
    """Flag cross-row duplicates of a computed key (≙ DetectDuplicate).

    Reference DetectDuplicate.java keys a DistributedMapCache on an
    EL-computed value; here a window over the key marks every row beyond
    the first occurrence (ordered by ``order_col``) as duplicate.

    ``order_col`` is REQUIRED: "first" must be defined by a data column,
    never by physical row position (monotonically_increasing_id is
    partition-layout-dependent — the same input repartitioned differently
    would flag different survivors, breaking replay determinism).
    """
    from pyspark.sql import Window as W

    if order_col is None:
        raise ValueError(
            "detect_duplicate requires order_col — 'first occurrence' must be "
            "defined by the data (e.g. a sequence/id column), not by "
            "partition layout"
        )
    w = W.partitionBy(key).orderBy(F.col(order_col))
    return df.withColumn("is_duplicate", F.row_number().over(w) > 1)


def wait_notify(
    waiting: DataFrame,
    signals: DataFrame,
    on: list[str],
    wait_ts: str = "ts",
    signal_ts: str = "ts",
) -> tuple[DataFrame, DataFrame]:
    """(released, still_waiting) — the Wait/Notify barrier as a join.

    Reference Wait.java/Notify.java hold FlowFiles in the `wait` relationship
    until a matching release signal appears in the distributed cache. In a
    set-oriented engine the barrier is a semi-join against the signal table:
    a row is released iff a signal with the same key exists at-or-before its
    event time. In streaming this becomes a stream-stream join with
    watermarks; in batch it is exactly this.
    """
    sig = signals.select(
        *[F.col(c) for c in on], F.col(signal_ts).alias("_sig_ts")
    )
    cond = [waiting[c] == sig[c] for c in on] + [sig["_sig_ts"] <= waiting[wait_ts]]
    released = waiting.join(sig, on=cond, how="left_semi")
    still_waiting = waiting.join(sig, on=cond, how="left_anti")
    return released, still_waiting


def wait_notify_counters(
    waiting: DataFrame,
    signals: DataFrame,
    on: list[str],
    target_count: int,
    wait_ts: str = "ts",
    signal_ts: str = "ts",
) -> tuple[DataFrame, DataFrame]:
    """N-of-M Wait/Notify: release a waiting row only once ≥ ``target_count``
    signals for its key exist at-or-before its event time.

    Reference WaitNotifyProtocol.java keeps per-key release *counters* (each
    Notify increments; Wait's Target Signal Count gates release) — the
    signal-exists barrier (:func:`wait_notify`) is the N=1 special case.
    Set-oriented replay: aggregate the signal table to per-key ordered
    counts once (one shuffle on the key), then release iff the count of
    signals ≤ wait_ts reaches the target. The aggregated signal side is
    one row per (key, signal), so the join input is bounded by signal
    cardinality, not waiting-row cardinality.
    """
    # per-key signal number in signal-time order (deterministic: ties break
    # on the timestamp itself; callers needing a total order pass a
    # pre-disambiguated signal_ts)
    from pyspark.sql import Window as W

    w = W.partitionBy(*on).orderBy(F.col("_sig_ts"))
    nth = (
        signals.select(*on, F.col(signal_ts).alias("_sig_ts"))
        .withColumn("_n", F.row_number().over(w))
        .filter(F.col("_n") == target_count)  # the release-threshold signal
        .select(*on, "_sig_ts")
    )
    cond = [waiting[c] == nth[c] for c in on] + [nth["_sig_ts"] <= waiting[wait_ts]]
    released = waiting.join(nth, on=cond, how="left_semi")
    still_waiting = waiting.join(nth, on=cond, how="left_anti")
    return released, still_waiting
