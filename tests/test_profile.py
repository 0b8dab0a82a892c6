"""profile_columns / check_constraints — one-pass dataset quality gate."""

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators.profile import check_constraints, profile_columns


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10.0),
            (2, "beta", 20.0),
            (3, None, 30.0),
            (4, "beta", None),
            (4, "Gamma9", 50.0),
        ],
        "id long, name string, score double",
    )


def test_profile_stats(spark, df):
    p = {r.column: r for r in profile_columns(df).collect()}
    assert set(p) == {"id", "name", "score"}
    assert p["id"].n_rows == 5 and p["id"].n_null == 0
    assert p["id"].n_distinct == 4  # 4 appears twice
    assert p["id"].min_value == "1" and p["id"].max_value == "4"
    assert p["id"].mean_value == round(14 / 5, 6)
    assert p["name"].n_null == 1 and p["name"].null_rate == 0.2
    assert p["name"].mean_value is None  # non-numeric
    assert p["score"].n_null == 1 and p["score"].n_distinct == 4
    assert p["score"].mean_value == round(110.0 / 4, 6)


def test_profile_column_subset_and_unknown(spark, df):
    assert [r.column for r in profile_columns(df, ["name"]).collect()] == ["name"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["nope"])


def test_profile_empty_frame_has_no_div_zero(spark):
    empty = spark.createDataFrame([], "id long")
    row = profile_columns(empty).collect()[0]
    assert row.n_rows == 0 and row.null_rate == 0.0 and row.n_distinct == 0


def test_checks_verdicts(spark, df):
    got = {
        (r.check, r.column): (r.metric, r.passed)
        for r in check_constraints(
            df,
            [
                {"check": "non_empty"},
                {"check": "complete", "column": "name", "min_fraction": 0.9},
                {"check": "complete", "column": "id", "min_fraction": 1.0},
                {"check": "unique", "column": "id"},
                {"check": "unique", "column": "name"},
                {"check": "in_range", "column": "score", "lo": 0, "hi": 40},
                {"check": "matches", "column": "name",
                 "pattern": "^[a-z]+$", "min_fraction": 0.5},
            ],
        ).collect()
    }
    assert got[("non_empty", None)] == (5.0, True)
    assert got[("complete", "name")] == (0.8, False)  # 1 null of 5
    assert got[("complete", "id")] == (1.0, True)
    assert got[("unique", "id")][1] is False  # 4 duplicated
    assert got[("unique", "name")][1] is False  # beta duplicated
    # score: 3 of 4 non-null in [0, 40]
    assert got[("in_range", "score")] == (0.75, False)
    # names: alpha, beta, beta lowercase; Gamma9 fails → 3/4
    assert got[("matches", "name")] == (0.75, True)


def test_checks_validation_errors(spark, df):
    with pytest.raises(ValueError, match="unknown check kind"):
        check_constraints(df, [{"check": "percentile", "column": "id"}])
    with pytest.raises(ValueError, match="unknown column"):
        check_constraints(df, [{"check": "unique", "column": "nope"}])


def test_single_aggregate_plan(spark, df):
    """Both operators must stay one aggregate over one scan: no joins, no
    windows, at most the aggregate's own exchanges."""
    for out in (
        profile_columns(df),
        check_constraints(df, [
            {"check": "complete", "column": "name", "min_fraction": 0.5},
            {"check": "unique", "column": "id"},
            {"check": "in_range", "column": "score", "lo": 0, "hi": 100},
        ]),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "Window" not in plan


def test_drift_report_statuses(spark):
    from nifi_spark.operators.profile import drift_report

    ref = spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(100)],
        "id long, name string, score double",
    )
    # current: score mean shifted 10x, name now 30% null, id stable;
    # extra column added, score dtype preserved
    cur = spark.createDataFrame(
        [(i, f"u{i}" if i % 10 >= 3 else None, float(i) * 10, "x")
         for i in range(100)],
        "id long, name string, score double, extra string",
    )
    got = {r.column: r for r in
           drift_report(profile_columns(cur), profile_columns(ref)).collect()}
    assert got["id"].status == "ok" and got["id"].null_rate_delta == 0.0
    assert got["name"].status == "drift" and got["name"].null_rate_delta == 0.3
    assert got["score"].status == "drift"
    assert got["score"].mean_rel_delta == pytest.approx(9.0, abs=1e-4)
    assert got["extra"].status == "new_column"

    # reversed roles: extra goes missing
    rev = {r.column: r for r in
           drift_report(profile_columns(ref), profile_columns(cur)).collect()}
    assert rev["extra"].status == "missing_column"


def test_drift_report_dtype_change(spark):
    from nifi_spark.operators.profile import drift_report

    a = profile_columns(spark.createDataFrame([(1,)], "v long"))
    b = profile_columns(spark.createDataFrame([("1",)], "v string"))
    row = drift_report(a, b).collect()[0]
    assert row.status == "drift" and row.dtype_changed is True


def test_profile_oracle_total_on_empty_input():
    """ADVICE r4: the profile_documents oracle must yield one row per
    column with n_rows=0 on an EMPTY table, matching profile_columns'
    agg-without-groupBy totality (the old cross-join + GROUP BY shape
    collapsed to zero groups)."""
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet' WHERE 1=0"
    )
    df = con.sql(entry_mod.oracle_sql()["profile_documents"]).df()
    con.close()
    assert len(df) == 5
    assert (df.n_rows == 0).all() and (df.n_null == 0).all()
    assert df.min_value.isna().all() and df.mean_value.isna().all()


def test_profile_integral_mean_is_exact_sum_then_one_division(spark):
    """ADVICE r4: integral means accumulate in decimal(38,0) (exact, like
    DuckDB's HUGEINT sum) with a single double division at the end — not
    F.avg's running double sum, which drifts past ~2^53 total."""
    big = 1 << 60  # each value alone exceeds double's 2^53 integer range
    df = spark.createDataFrame([(big,), (big + 2,), (big + 7,)], "v long")
    got = {r.column: r for r in profile_columns(df).collect()}["v"]
    exact = float((big * 3 + 9)) / 3  # one rounding, after the exact sum
    assert got.mean_value == round(exact, 6)
