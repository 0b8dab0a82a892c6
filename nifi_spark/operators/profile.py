"""Dataset profiling and declarative data-quality constraints.

A production ingest pipeline gates each batch on data-quality checks before it
reaches training: column completeness, key uniqueness, value ranges,
format conformance. The reference expresses these as flow topology —
ValidateRecord / ValidateCsv routing per RECORD
(nifi-standard-bundle .../ValidateRecord.java:268-320) plus
CalculateRecordStats counters (.../CalculateRecordStats.java:121-160); at
100 TB the per-record routing answer is wrong-shaped — what the gate needs
is ONE aggregation pass producing dataset-level verdicts (the public
Spark-native pattern: AWS Deequ's analyzer-then-check design).

Two operators:

- :func:`profile_columns` — long-form per-column statistics (rows, nulls,
  null rate, exact distinct count, lexical min/max, numeric mean) computed
  in a SINGLE aggregate over one scan (count-distincts share the pass via
  Spark's expand). Output is engine-portable: fractions are exact integer
  ratios rounded to 6, min/max rendered as strings, mean only for numeric
  columns (round 6).
- :func:`check_constraints` — declarative checks evaluated from the same
  one-pass aggregate: ``complete`` (non-null fraction >= min), ``unique``
  (distinct == non-null count), ``in_range`` (numeric min/max bounds),
  ``matches`` (regex conformance fraction >= min), ``non_empty``. Output
  is one row per check: (check, column, metric, passed) — the shape a
  batch gate consumes (`.filter(~passed)` routes to quarantine, the
  MonitorActivity-style alarm carries the metric).

Scale shape: both are map-side partial + final aggregates — no joins, no
windows, no per-record routing; the only shuffle is the aggregate's own
exchange. Constraint evaluation adds ZERO extra passes: every metric rides
the same aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _INTEGRAL + (T.FloatType, T.DoubleType, T.DecimalType)


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form per-column profile: one output row per column.

    Columns: ``column, dtype, n_rows, n_null, null_rate, n_distinct,
    min_value, max_value, mean_value`` (min/max rendered as strings so
    heterogeneous column types share one schema; mean is NULL for
    non-numeric columns). One aggregate over one scan.
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    dtypes = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
        if isinstance(fields[c], _INTEGRAL):
            # Exact integer sum (decimal(38,0) ≙ DuckDB's HUGEINT), then ONE
            # double division — F.avg would accumulate in DOUBLE and drift
            # past ~2^53 total (e.g. sum of ids at 10^10-doc scale), and the
            # running double sum is also partition-order dependent.
            aggs.append(
                F.round(
                    F.sum(F.col(c).cast("decimal(38,0)")).cast("double")
                    / F.count(F.col(c)),
                    6,
                ).alias(f"_av_{c}")
            )
        elif isinstance(fields[c], _NUMERIC):
            aggs.append(F.round(F.avg(F.col(c)), 6).alias(f"_av_{c}"))
    row = df.agg(*aggs)

    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_null"),
                F.round(
                    (F.col("_n") - F.col(f"_nn_{c}"))
                    / F.greatest(F.col("_n"), F.lit(1)),
                    6,
                ).alias("null_rate"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_value"),
                F.col(f"_mx_{c}").alias("max_value"),
                (
                    F.col(f"_av_{c}")
                    if isinstance(fields[c], _NUMERIC)
                    else F.lit(None).cast("double")
                ).alias("mean_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(entries).alias("p")).select("p.*")


def check_constraints(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Evaluate declarative data-quality checks in ONE aggregate.

    Each check is a dict with ``check`` (kind), ``column``, and
    kind-specific params:

    - ``{"check": "complete", "column": c, "min_fraction": f}`` — non-null
      fraction of c >= f
    - ``{"check": "unique", "column": c}`` — no duplicate non-null values
    - ``{"check": "in_range", "column": c, "lo": x, "hi": y}`` — every
      non-null value in [x, y]; metric = conforming fraction
    - ``{"check": "matches", "column": c, "pattern": p, "min_fraction": f}``
      — fraction of non-null values containing a regex-p match >= f
      (anchor the pattern — ``^...$`` — for full-value conformance; the
      partial-match default is what both Java regex and the oracle's RE2
      ``regexp_matches`` share)
    - ``{"check": "non_empty"}`` — the dataset has >= 1 row

    Output: ``(check, column, metric, threshold, passed)``; ``metric`` is
    the measured fraction/count as double (exact integer ratio, round 6).
    """
    kinds = {"complete", "unique", "in_range", "matches", "non_empty"}
    for ck in checks:
        if ck.get("check") not in kinds:
            raise ValueError(f"unknown check kind: {ck.get('check')!r}")
        if ck["check"] != "non_empty" and ck.get("column") not in df.columns:
            raise ValueError(f"{ck['check']}: unknown column {ck.get('column')!r}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, ck in enumerate(checks):
        kind = ck["check"]
        if kind == "non_empty":
            continue
        c = F.col(ck["column"])
        if kind == "complete":
            aggs.append(F.count(c).alias(f"_m{i}"))
        elif kind == "unique":
            aggs += [F.countDistinct(c).alias(f"_m{i}"), F.count(c).alias(f"_t{i}")]
        elif kind == "in_range":
            ok = F.when(c.isNotNull() & c.between(ck["lo"], ck["hi"]), 1).otherwise(0)
            aggs += [F.sum(ok).alias(f"_m{i}"), F.count(c).alias(f"_t{i}")]
        elif kind == "matches":
            ok = F.when(c.rlike(ck["pattern"]), 1).otherwise(0)
            aggs += [
                F.sum(F.when(c.isNotNull(), ok).otherwise(0)).alias(f"_m{i}"),
                F.count(c).alias(f"_t{i}"),
            ]
    row = df.agg(*aggs)

    def _frac(num, den):
        return F.round(num / F.greatest(den, F.lit(1)), 6)

    entries = []
    for i, ck in enumerate(checks):
        kind = ck["check"]
        if kind == "non_empty":
            metric = F.col("_n").cast("double")
            thresh = F.lit(1.0)
            passed = F.col("_n") >= 1
            column = F.lit(None).cast("string")
        elif kind == "complete":
            metric = _frac(F.col(f"_m{i}"), F.col("_n"))
            thresh = F.lit(float(ck["min_fraction"]))
            passed = metric >= thresh
            column = F.lit(ck["column"])
        elif kind == "unique":
            metric = _frac(F.col(f"_m{i}"), F.col(f"_t{i}"))
            thresh = F.lit(1.0)
            passed = F.col(f"_m{i}") == F.col(f"_t{i}")
            column = F.lit(ck["column"])
        else:  # in_range / matches share the conforming-fraction shape
            metric = _frac(F.col(f"_m{i}"), F.col(f"_t{i}"))
            thresh = F.lit(float(ck.get("min_fraction", 1.0)))
            passed = metric >= thresh
            column = F.lit(ck["column"])
        entries.append(
            F.struct(
                F.lit(kind).alias("check"),
                column.alias("column"),
                metric.alias("metric"),
                thresh.alias("threshold"),
                passed.alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*entries)).alias("v")).select("v.*")


def drift_report(
    cur: DataFrame,
    ref: DataFrame,
    max_null_rate_delta: float = 0.01,
    max_mean_rel_delta: float = 0.1,
    max_distinct_rel_delta: float = 0.5,
) -> DataFrame:
    """Compare two :func:`profile_columns` outputs (current batch vs a
    reference window) and flag per-column drift — the ingest-monitoring
    loop a production pipeline runs before admitting a batch upstream of
    training (schema drift surfaces as missing/new columns; value drift
    as null-rate / mean / distinct-count shifts).

    Output, one row per column in either profile: ``column, status``
    (``ok | drift | new_column | missing_column``), the three deltas
    (``null_rate_delta``, ``mean_rel_delta``, ``distinct_rel_delta`` —
    relative deltas NULL when the reference side is NULL/zero), and
    ``dtype_changed``. A full outer join of two tiny aggregate outputs —
    cost is O(columns), nothing rescans the data.
    """
    c = cur.select(
        F.col("column"),
        F.col("dtype").alias("_dt_c"),
        F.col("null_rate").alias("_nr_c"),
        F.col("mean_value").alias("_mv_c"),
        F.col("n_distinct").alias("_nd_c"),
    )
    r = ref.select(
        F.col("column"),
        F.col("dtype").alias("_dt_r"),
        F.col("null_rate").alias("_nr_r"),
        F.col("mean_value").alias("_mv_r"),
        F.col("n_distinct").alias("_nd_r"),
    )
    j = c.join(r, "column", "full_outer")
    nr_delta = F.round(F.abs(F.col("_nr_c") - F.col("_nr_r")), 6)
    mv_delta = F.when(
        F.col("_mv_r").isNotNull() & (F.col("_mv_r") != 0) & F.col("_mv_c").isNotNull(),
        F.round(F.abs(F.col("_mv_c") - F.col("_mv_r")) / F.abs(F.col("_mv_r")), 6),
    )
    nd_delta = F.when(
        F.col("_nd_r").isNotNull() & (F.col("_nd_r") > 0) & F.col("_nd_c").isNotNull(),
        F.round(
            F.abs(F.col("_nd_c") - F.col("_nd_r")) / F.col("_nd_r"), 6
        ),
    )
    dtype_changed = (
        F.col("_dt_c").isNotNull()
        & F.col("_dt_r").isNotNull()
        & (F.col("_dt_c") != F.col("_dt_r"))
    )
    drifted = (
        (nr_delta > max_null_rate_delta)
        | (F.coalesce(mv_delta > max_mean_rel_delta, F.lit(False)))
        | (F.coalesce(nd_delta > max_distinct_rel_delta, F.lit(False)))
        | dtype_changed
    )
    status = (
        F.when(F.col("_dt_r").isNull(), F.lit("new_column"))
        .when(F.col("_dt_c").isNull(), F.lit("missing_column"))
        .when(drifted, F.lit("drift"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "column",
        status.alias("status"),
        nr_delta.alias("null_rate_delta"),
        mv_delta.alias("mean_rel_delta"),
        nd_delta.alias("distinct_rel_delta"),
        dtype_changed.alias("dtype_changed"),
    )
