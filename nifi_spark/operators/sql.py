"""QueryRecord — SQL over a record set with multi-relationship fan-out.

Reference: .../standard/QueryRecord.java:89-110 (dynamic property =
relationship name → SQL), :468 (record set exposed as table FLOWFILE),
:452-477 (statement cached per (sql, schema)), Calcite with MYSQL_ANSI
lexing (:560).

Spark restatement: register the DataFrame as a temp view and run each SQL
through Catalyst — parse/analyze/optimize/codegen replace Calcite's
enumerable interpreter wholesale. The multi-query fan-out shares one
cached source when the caller materializes several relationships in the
same action window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def query_record(
    df: DataFrame, queries: dict[str, str], view_name: str = "flowfile"
) -> dict[str, DataFrame]:
    """Run each named SQL against the record set (view ``flowfile``).

    Returns {relationship_name: DataFrame} — ≙ QueryRecord's one output
    relationship per dynamic property. SQL may use the full Spark SQL
    surface (projection, WHERE, GROUP BY, window functions, ORDER BY,
    LIMIT, UNION, subqueries) — a superset of NiFi's Calcite dialect.
    """
    df.createOrReplaceTempView(view_name)
    spark = df.sparkSession
    return {name: spark.sql(sql) for name, sql in queries.items()}
