"""CDC history shapes: SCD type-2 versioning and before/after images.

Both are the standard downstream consumers of a binlog/WAL change feed
that the reference serves via its CDC processors (CaptureChangeMySQL
emits per-event records the user then lands with PutDatabaseRecord;
reference nifi-cdc/nifi-cdc-mysql-processors/.../CaptureChangeMySQL.java
keeps the event envelope, while Debezium-style pipelines reconstruct
history downstream). Here they are first-class batch operators:

- :func:`scd2_history` — fold the event stream into type-2 dimension
  rows: one row per (key, version) with ``valid_from_seq`` /
  ``valid_to_seq`` half-open validity and an ``is_current`` flag.
- :func:`change_images` — the Debezium envelope: per event, the previous
  payload (``before_*``) via per-key lag, classified as
  INSERT / UPDATE / DELETE.

Physical strategy: both are ONE window shuffle on the key, ordered by
the sequence column. Unlike :mod:`ordering`'s lww_fold there is no
partial-aggregation formulation — history needs every version, so the
shuffle is O(events) by definition and the window sort is the minimal
plan. Skew note: a Zipf-hot conversation key lands on one reducer with
its full history; at 10^10 events cap per-key history (e.g. pre-filter
seq > low-watermark) or bucket the table by key so the sort is local —
the operator itself is agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Type-2 slowly-changing history from a change feed.

    Each event opens a version valid over the half-open seq interval
    ``[valid_from_seq, valid_to_seq)``; the latest version per key has
    ``valid_to_seq`` NULL and ``is_current`` true unless it is a delete
    (``is_deleted`` true → the key is absent from the current state).
    All payload columns ride along unchanged.
    """
    w = W.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    nxt = F.lead(F.col(seq_col)).over(w)
    is_del = F.col(op_col) == delete_op
    return (
        df.withColumn("valid_from_seq", F.col(seq_col))
        .withColumn("valid_to_seq", nxt)
        .withColumn("is_current", nxt.isNull() & ~is_del)
        .withColumn("is_deleted", is_del)
    )


def change_images(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Debezium-style change envelope: before/after images per event.

    Adds ``before_{col}`` (the previous event's value, NULL for the
    key's first event) for each value column and ``change_kind``:
    INSERT (no prior image), DELETE (op is the delete op), else UPDATE.
    After images for deletes are NULLed — the row ceases to exist.
    """
    w = W.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    first = F.lag(F.col(seq_col)).over(w).isNull()
    is_del = F.col(op_col) == delete_op
    out = df
    for c in value_cols:
        out = out.withColumn(f"before_{c}", F.lag(F.col(c)).over(w))
    kind = (
        F.when(is_del, F.lit("DELETE"))
        .when(first, F.lit("INSERT"))
        .otherwise(F.lit("UPDATE"))
    )
    out = out.withColumn("change_kind", kind)
    for c in value_cols:
        out = out.withColumn(c, F.when(is_del, F.lit(None)).otherwise(F.col(c)))
    return out
