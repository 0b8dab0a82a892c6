"""Jolt spec interpreter (shift / default / remove / chains / errors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators.jolt import jolt_chain


def _src(spark):
    return spark.createDataFrame(
        [(1, ("a", (10, None)))],
        "id long, doc struct<name string, inner struct<x long, y string>>",
    )


def test_shift_reshapes_and_fans_out(spark):
    df = jolt_chain(
        _src(spark),
        "doc",
        [("shift", {"name": ["meta.n", "copy"], "inner": {"x": "meta.xx"}})],
    )
    (r,) = df.collect()
    assert r.doc.meta.n == "a" and r.doc.copy == "a" and r.doc.meta.xx == 10


def test_shift_wildcard_with_ampersand(spark):
    df = jolt_chain(_src(spark), "doc", [("shift", {"inner": {"*": "kept.&"}})])
    (r,) = df.collect()
    assert r.doc.kept.x == 10 and r.doc.kept.y is None


def test_default_fills_null_and_adds_missing(spark):
    df = jolt_chain(
        _src(spark),
        "doc",
        [("default", {"inner": {"y": "dflt"}, "extra": 5})],
    )
    (r,) = df.collect()
    assert r.doc.inner.y == "dflt"  # was NULL
    assert r.doc.inner.x == 10      # untouched
    assert r.doc.extra == 5         # added


def test_remove_then_shift_chain(spark):
    df = jolt_chain(
        _src(spark),
        "doc",
        [
            ("remove", {"inner": {"y": ""}}),
            ("shift", {"name": "n", "inner": "rest"}),
        ],
    )
    (r,) = df.collect()
    assert r.doc.n == "a" and r.doc.rest.asDict() == {"x": 10}


def test_unsupported_spec_raises(spark):
    with pytest.raises(ValueError, match="unsupported"):
        jolt_chain(_src(spark), "doc", [("cardinality", {})])
    with pytest.raises(ValueError, match="not in input"):
        jolt_chain(_src(spark), "doc", [("shift", {"nope": "x"})])
    with pytest.raises(ValueError, match="collision"):
        jolt_chain(_src(spark), "doc", [("shift", {"name": "x", "inner": {"x": "x"}})])
