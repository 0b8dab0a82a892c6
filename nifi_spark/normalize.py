"""Payload normalization: raw JSON change events → typed columns.

The reference parses binlog events into JSON FlowFiles row-at-a-time
(CaptureChangeMySQL writers, reference nifi-cdc .../io/InsertRowsWriter.java:76-98)
and NiFi's Python extension point marshals single records over Py4J
(nifi-py4j-bundle .../nifiapi/recordtransform.py:21-96). Both are per-row;
here normalization is columnar:

- :func:`normalize_json` — the default hot path. ``from_json`` with an
  explicit schema: JVM-side, whole-stage-codegen'd, zero Python.
- :func:`normalize_json_arrow` — the escape hatch for payloads built-ins
  can't express (ragged unions, NiFi CHOICE types): an Arrow-vectorized
  pandas UDF (batch-at-a-time, never per-row Python), as the north star
  mandates. Semantics identical to :func:`normalize_json` for well-formed
  input; tests assert equality of both paths (FIXTURES.md §5.10).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EVENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("tool_meta", T.StringType()),
    ]
)


def normalize_json(
    df: DataFrame, json_col: str = "payload_json", keep_cols: list[str] | None = None
) -> DataFrame:
    """JVM path: parse the raw event JSON into the typed change-event shape.

    ``keep_cols`` (e.g. lineage coords source_file/source_pos) pass through
    untouched alongside the parsed payload.
    """
    keep = [c for c in (keep_cols or []) if c in df.columns]
    parsed = df.select(F.from_json(F.col(json_col), _EVENT_JSON_SCHEMA).alias("e"), *keep)
    return parsed.select(
        F.col("e.seq").alias("seq"),
        F.col("e.type").alias("op"),
        F.col("e.timestamp").alias("ts"),
        F.col("e.conv_id").alias("conv_id"),
        F.col("e.turn_idx").alias("turn_idx"),
        F.col("e.role").alias("role"),
        F.col("e.text").alias("text"),
        F.col("e.tool").alias("tool"),
        F.col("e.tool_meta").alias("tool_meta"),
        *keep,
    )


def normalize_json_arrow(df: DataFrame, json_col: str = "payload_json") -> DataFrame:
    """Arrow path: same parse via a vectorized pandas UDF (batch-at-a-time).

    Uses ``pandas.json_normalize`` over whole Arrow batches inside
    ``mapInPandas`` — the Spark-idiomatic replacement for NiFi's per-record
    Py4J RecordTransform round-trip.
    """
    import json as _json

    out_schema = (
        "seq long, op string, ts timestamp, conv_id string, turn_idx int, "
        "role string, text string, tool string, tool_meta string"
    )

    def parse(batches):
        for pdf in batches:
            recs = pd.json_normalize(pdf[json_col].map(_json.loads))

            def col(name):
                if name in recs.columns:
                    return recs[name]
                return pd.Series([None] * len(recs), index=recs.index)

            ts = pd.to_datetime(col("timestamp"), utc=True, errors="coerce")
            out = pd.DataFrame(
                {
                    "seq": col("seq"),
                    "op": col("type"),
                    "ts": ts.dt.tz_localize(None),
                    "conv_id": col("conv_id"),
                    "turn_idx": col("turn_idx"),
                    "role": col("role"),
                    "text": col("text"),
                    "tool": col("tool"),
                    "tool_meta": col("tool_meta"),
                }
            )
            yield out

    return df.select(json_col).mapInPandas(parse, schema=out_schema)


def normalize_choice(
    df: DataFrame,
    json_col: str,
    branches: list[tuple[T.StructType, list[str]]],
) -> DataFrame:
    """Permissive multi-branch parse for ragged payloads (NiFi CHOICE
    types — SURVEY.md §1.3 porting hazard; reference record CHOICE
    handling in FieldTypeInference.java widens conflicting shapes).

    ``branches`` = ordered [(schema, required_fields)]: each row is parsed
    against every branch schema (all JVM-side ``from_json``, evaluated
    lazily in one projection — no Python), and takes the FIRST branch
    whose required fields all parse non-null. Adds:

    - ``branch`` — 0-based winning branch index, -1 if none matched
      (route those to the DLQ).
    - ``parsed_<i>`` — the winning branch's struct (others NULLed out so
      downstream selects are unambiguous).

    Scale: k branches cost k from_json calls per row inside one
    whole-stage-codegen'd projection — no shuffle, no second pass.
    """
    out = df
    match_exprs = []
    for i, (schema, required) in enumerate(branches):
        p = F.from_json(F.col(json_col), schema)
        ok = F.lit(True)
        for r in required:
            ok = ok & p.getField(r).isNotNull()
        out = out.withColumn(f"_p{i}", p).withColumn(f"_ok{i}", ok)
        match_exprs.append((i, F.col(f"_ok{i}")))
    branch = F.lit(-1)
    for i, ok in reversed(match_exprs):
        branch = F.when(ok, F.lit(i)).otherwise(branch)
    out = out.withColumn("branch", branch.cast("int"))
    for i, _ in enumerate(branches):
        out = out.withColumn(
            f"parsed_{i}",
            F.when(F.col("branch") == i, F.col(f"_p{i}")),
        ).drop(f"_p{i}", f"_ok{i}")
    return out
