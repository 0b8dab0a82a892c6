"""Authoritative StructTypes for the CDC engine.

Shapes follow BASELINE.json ``input_hint`` and FIXTURES.md:

- ``CONVERSATIONS``: the target lake table of multi-turn transcripts,
  primary key ``(conv_id, turn_idx)``; the engine persists bookkeeping
  columns ``_seq`` (last applied sequence, cross-batch LWW guard) and
  ``_bucket`` (hash bucket of conv_id, the table's partition column).
- ``CHANGE_EVENTS``: flattened binlog-style change feed. Mirrors the
  reference's CDC event envelope — NiFi CaptureChangeMySQL emits JSON with
  type/timestamp (reference nifi-cdc/nifi-cdc-api .../io/AbstractEventWriter.java:35-52),
  a strictly increasing sequence id attribute ``cdc.sequence.id``
  (.../io/EventWriter.java:29) and binlog file/position coordinates
  (AbstractBinlogEventWriter.java:42-51) — re-expressed as typed columns.
- ``CHANGE_EVENTS_V2``: adds ``tool_meta`` for the additive schema-evolution
  scenario (reference UpdateDatabaseTable.java:506-541 ALTER TABLE ADD COLUMN
  semantics).
- ``LINEAGE``: per-partition provenance records (reference provenance event
  model, nifi-api .../provenance/ProvenanceEventRecord.java:41-161) reduced
  to the queryable subset the north star needs: source offset ranges,
  snapshot id, row counts per (batch, source_file).
"""

from __future__ import annotations

from pyspark.sql import types as T

KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["role", "text", "tool"]

CONVERSATIONS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_EVENTS = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("source_file", T.StringType(), True),
        T.StructField("source_pos", T.LongType(), True),
        T.StructField("payload_json", T.StringType(), True),
    ]
)

CHANGE_EVENTS_V2 = T.StructType(
    CHANGE_EVENTS.fields + [T.StructField("tool_meta", T.StringType(), True)]
)

# Transactional feed: every event carries its transaction id and the log
# additionally contains commit-marker rows (op='C', key columns NULL) —
# the BEGIN→COMMIT delimiting CaptureChangeMySQL reads from the binlog
# (reference CaptureChangeMySQL.java:947-1024; INCLUDE_BEGIN_COMMIT :342).
# Key/op columns relax to nullable because marker rows have no key.
CHANGE_EVENTS_TXN = T.StructType(
    [
        T.StructField(f.name, f.dataType, True)
        for f in CHANGE_EVENTS.fields
    ]
    + [T.StructField("txn_id", T.LongType(), True)]
)

LINEAGE = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("source_file", T.StringType(), True),
        T.StructField("min_pos", T.LongType(), True),
        T.StructField("max_pos", T.LongType(), True),
        T.StructField("min_seq", T.LongType(), True),
        T.StructField("max_seq", T.LongType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_late", T.LongType(), False),
        T.StructField("committed_at", T.StringType(), False),
    ]
)
