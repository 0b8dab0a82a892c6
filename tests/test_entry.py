"""Replicates the driver's correctness gate locally: every ``queries()``
entry runs on Spark and its ``oracle_sql()`` on DuckDB over the same
parquet tables; results must match exactly (names, row count, values) —
the driver's value-hash comparison is strict, so this test is too.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[ns]")
        elif pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype(bool)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    sdf = entry_mod.queries()[name](spark, SF).toPandas()
    osql = entry_mod.oracle_sql().get(name)
    if osql is None:
        # rows-only contract: runs, stable schema, deterministic rerun
        assert sdf.shape[1] > 0
        return
    odf = ddb.sql(osql).df()
    assert list(sdf.columns) == list(odf.columns), f"{name}: column names differ"
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs oracle {len(odf)}"
    a, b = _norm(sdf), _norm(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 4


def test_no_driver_collect_in_query_bodies():
    """VERDICT r2 item 6: every queries() entry must return a lazy plan —
    a toPandas/collect inside a query body is a driver-side materialization
    that breaks at scale (the one flagged instance detached a temp-dir
    cache table; state now builds under a process-lifetime work dir)."""
    import inspect

    src = inspect.getsource(entry_mod)
    assert ".toPandas(" not in src
    assert ".collect(" not in src


# Queries whose plan INTENTIONALLY contains a broadcast nested-loop join:
# the brute-force ANN scorers broadcast the (tiny) query set against the
# corpus scan (similarity.py:160, :673 — a cross join IS the operator),
# and domain_mix broadcasts a one-row per-domain cap frame
# (traindata.py:496). Everything else must stay equi-join only.
_NESTED_LOOP_OK = {
    "embedding_cosine_topk",
    "embedding_ann_pq",
    "embedding_ann_pq_refined",
    "domain_mix",
}


def test_no_unintended_nested_loop_or_cartesian_plans(spark):
    """Global scale guard: an accidental theta-join (CartesianProduct /
    BroadcastNestedLoopJoin) in any driver query is an O(n*m) bomb at
    100 TB. Plans are built, not executed — cheap to check all of them."""
    flagged = {}
    for name, fn in entry_mod.queries().items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        hits = [
            w for w in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if w in plan
        ]
        if hits and name not in _NESTED_LOOP_OK:
            flagged[name] = hits
        if "CartesianProduct" in plan:
            # even the whitelisted shapes must be BROADCAST nested loops,
            # never an unbroadcast cartesian shuffle
            flagged[name] = flagged.get(name, []) + ["CartesianProduct"]
    assert not flagged, f"unintended theta-join plans: {flagged}"
