"""Incremental JDBC table polling — QueryDatabaseTable re-expressed.

Reference mapping (SURVEY.md §2.1):

- **QueryDatabaseTable(Record)** (reference .../standard/QueryDatabaseTable.java
  + AbstractDatabaseFetchProcessor.java:137 MAX_VALUE_COLUMN_NAMES): polls a
  table, remembers per-column max values in processor state, and emits only
  rows where maxvalue-col > last seen. Here: `spark.read.jdbc` with a
  derived `WHERE col > last_max` predicate; the high-water mark persists in
  a JSON state file next to the checkpoint (≙ NiFi cluster state).
- **GenerateTableFetch** (.../standard/GenerateTableFetch.java): emits paged
  SELECTs for parallel fetch — Spark's partitioned JDBC read
  (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`) does the
  same natively; :func:`read_incremental` passes those options through.

The full read path is exercised end-to-end against Apache Derby embedded
(an in-process JDBC engine that ships in Spark's jars) in
tests/test_jdbc.py: poll → watermark commit → only-new rows → partitioned
fetch. On a cluster, point ``url``/``driver`` at the real database.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class MaxValueState:
    """Persistent high-water mark per (table, column) — NiFi's
    `maxvalue.*` processor state as an auditable JSON file.

    A ``scheme://`` path (file://, hdfs://, s3a://) routes through FsIO
    (pass ``spark``), so the poll loop's state can live next to a remote
    checkpoint like the engine watermark; bare local paths keep the
    atomic tmp-then-rename write."""

    def __init__(self, path: str, spark: SparkSession | None = None):
        self.path = path
        self._io = None
        if "://" in path:
            if spark is None:
                raise ValueError(
                    "MaxValueState on a scheme:// path needs the spark handle"
                )
            from ..fsio import FsIO

            self._io = FsIO(spark, path)

    def _load(self) -> dict:
        if self._io is not None:
            if self._io.exists(self.path):
                return json.loads(self._io.read_text(self.path))
            return {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def get(self, table: str, column: str):
        return self._load().get(f"{table}::{column}")

    def update(self, table: str, column: str, value) -> None:
        state = self._load()
        key = f"{table}::{column}"
        prev = state.get(key)
        if prev is None or value > prev:
            state[key] = value
            if self._io is not None:
                self._io.write_text(self.path, json.dumps(state))
                return
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(state, f)
            os.replace(tmp, self.path)


def _sql_literal(value) -> str:
    """Type-aware SQL literal for the watermark (≙ reference
    AbstractDatabaseFetchProcessor.getLiteralByType): numbers verbatim,
    ISO timestamp strings as TIMESTAMP literals, everything else as a
    single-quoted string with embedded quotes doubled (never interpolated
    raw — a quote in a string watermark must not break or inject into the
    shipped subquery)."""
    import datetime
    import re

    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, (datetime.datetime, datetime.date)):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    s = str(value).replace("'", "''")
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?", str(value)):
        return f"TIMESTAMP '{s.replace('T', ' ')}'"
    return f"'{s}'"


def incremental_predicate(state: MaxValueState, table: str, max_value_column: str) -> str | None:
    """WHERE fragment for the next poll, or None on first run (full scan)."""
    last = state.get(table, max_value_column)
    if last is None:
        return None
    return f"{max_value_column} > {_sql_literal(last)}"


def read_incremental(
    spark: SparkSession,
    url: str,
    table: str,
    max_value_column: str,
    state: MaxValueState,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    **jdbc_options: str,
) -> DataFrame:
    """Build the incremental JDBC read plan (does not advance state —
    call :func:`commit_watermark` with the materialized max after the
    downstream write succeeds, so a failed batch re-polls the same rows:
    at-least-once source + idempotent sink = exactly-once, same contract
    as the streaming path)."""
    pred = incremental_predicate(state, table, max_value_column)
    # alias must not start with '_' (Derby and other engines reject it)
    dbtable = f"(SELECT * FROM {table}{' WHERE ' + pred if pred else ''}) AS incq"
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions or 8))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in jdbc_options.items():
        reader = reader.option(k, v)
    return reader.load()


def commit_watermark(df_max, state: MaxValueState, table: str, max_value_column: str) -> None:
    """Advance the high-water mark after a successful downstream commit."""
    if df_max is not None:
        state.update(table, max_value_column, df_max)
