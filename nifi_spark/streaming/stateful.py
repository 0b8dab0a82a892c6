"""Custom stateful streaming operators (applyInPandasWithState).

The north star calls for NiFi's stateful semantics on real streams; this
module carries the two that need keyed state across micro-batches:

- :func:`stateful_stale_filter` — streaming EnforceOrder (reference
  .../standard/EnforceOrder.java:73-86): per-key max-seq state; events at
  or below the key's high-water mark are dropped (NiFi's ``skipped``
  relationship for overtaken/late arrivals, :205). Unlike the sink-side
  merge guard (`source.seq > target._seq`), this filters *before* the
  shuffle-heavy fold/merge stages, so replayed or duplicated source data
  never re-enters the pipeline.
- :func:`stateful_detect_duplicate` — streaming DetectDuplicate
  (reference .../standard/DetectDuplicate.java): per-key first-seen state;
  only the first occurrence passes (an age-off TTL would map to
  ``GroupStateTimeout.ProcessingTimeTimeout`` — omitted here since the
  CDC path needs no expiry).

Both use Arrow-batched pandas per group — the state values are tiny
(one long per key); the grouped rows stream through pandas iterators
without materializing a key's full history.

Scale note: applyInPandasWithState shuffles raw rows by key and holds
one state entry per key in the state store. At 10^10 events the state
store (RocksDB on a real cluster) holds one long per (conv_id, turn_idx)
— bounded by key cardinality, not event count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_stale_filter(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
) -> DataFrame:
    """Drop events at/below the per-key max-seq high-water mark (streaming).

    Emits only rows with ``seq`` strictly greater than every previously
    seen seq for the key, updating the mark to the batch max. Within one
    batch, all rows above the stored mark pass (the downstream LWW fold
    collapses them); the mark advances once per batch.
    """
    out_schema = df.schema
    state_schema = "max_seq long"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (max_seq,) = state.get if state.exists else (None,)
        new_max = max_seq
        for pdf in pdfs:
            fresh = pdf[pdf[seq_col] > max_seq] if max_seq is not None else pdf
            if len(fresh):
                m = int(fresh[seq_col].max())
                new_max = m if new_max is None else max(new_max, m)
                yield fresh
        if new_max is not None:
            state.update((new_max,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_detect_duplicate(
    df: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Pass only the first-ever occurrence per key across all batches."""
    out_schema = df.schema
    state_schema = "seen boolean"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:
                pass
            return
        emitted = False
        for pdf in pdfs:
            if not emitted and len(pdf):
                yield pdf.head(1)
                emitted = True
        if emitted:
            state.update((True,))

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
