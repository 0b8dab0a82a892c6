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
        jolt_chain(_src(spark), "doc", [("jslt", {})])
    with pytest.raises(ValueError, match="not in input"):
        jolt_chain(_src(spark), "doc", [("shift", {"nope": "x"})])
    with pytest.raises(ValueError, match="collision"):
        jolt_chain(_src(spark), "doc", [("shift", {"name": "x", "inner": {"x": "x"}})])
    # indexed ampersand match refs in output paths are rejected, not mangled
    with pytest.raises(ValueError, match="indexed Jolt match ref"):
        jolt_chain(_src(spark), "doc", [("shift", {"inner": {"*": "out.&0"}})])


def test_cardinality_one_many(spark):
    df = spark.createDataFrame(
        [(1, ([7, 8], "solo"))],
        "id long, doc struct<xs array<long>, one string>",
    )
    out = jolt_chain(df, "doc", [("cardinality", {"xs": "ONE", "one": "MANY"})])
    (r,) = out.collect()
    assert r.doc.xs == 7 and r.doc.one == ["solo"]
    # schema reflects the unwrap/wrap
    dt = dict((f.name, f.dataType.simpleString()) for f in out.schema["doc"].dataType.fields)
    assert dt["xs"] == "bigint" and dt["one"] == "array<string>"


def test_sort_orders_fields_recursively(spark):
    df = spark.createDataFrame(
        [(1, (("z", 1), "b"))],
        "id long, doc struct<m struct<zz string, aa long>, b string>",
    )
    out = jolt_chain(df, "doc", [("sort", None)])
    names = [f.name for f in out.schema["doc"].dataType.fields]
    inner = [f.name for f in out.schema["doc"].dataType["m"].dataType.fields]
    assert names == ["b", "m"] and inner == ["aa", "zz"]
    (r,) = out.collect()
    assert r.doc.m.aa == 1 and r.doc.b == "b"


def test_modify_default_and_overwrite(spark):
    df = spark.createDataFrame(
        [(1, ("ab", None, 3))],
        "id long, doc struct<name string, note string, n long>",
    )
    out = jolt_chain(
        df,
        "doc",
        [
            ("modify-default-beta", {"note": "filled", "name": "ignored"}),
            (
                "modify-overwrite-beta",
                {
                    "upper": "=toUpper(@(1,name))",
                    "sz": "=size(@(1,name))",
                    "joined": "=join('-', @(1,name), @(1,n))",
                },
            ),
        ],
    )
    (r,) = out.collect()
    assert r.doc.note == "filled"       # default fills NULL
    assert r.doc.name == "ab"           # default does not overwrite
    assert r.doc.upper == "AB" and r.doc.sz == 2 and r.doc.joined == "ab-3"


def test_default_does_not_mutate_source_schema(spark):
    # StructType.add mutates the passed fields list in place; jolt_chain
    # must copy so the source DataFrame's cached schema stays intact.
    df = _src(spark)
    n_before = len(df.schema["doc"].dataType.fields)
    jolt_chain(df, "doc", [("default", {"added": 1}), ("default", {"more": 2})])
    assert len(df.schema["doc"].dataType.fields) == n_before


def test_modify_define_vs_default_semantics(spark):
    """Definr vs Defaultr: define never touches an existing key — a
    present-but-null value stays null — while default fills nulls; both
    add absent keys; a later overwrite rewrites a defined field."""
    from nifi_spark.operators.jolt import jolt_chain

    src = spark.createDataFrame([(1,)], "id int").select(
        "id",
        F.struct(
            F.lit(None).cast("string").alias("note"),
            F.struct(F.lit(7).alias("vid")).alias("meta"),
        ).alias("doc"),
    )
    out = jolt_chain(
        src, "doc",
        [
            ("modify-define-beta", {
                "note": "nope", "origin": "gen",
                "meta": {"tag": "=concat('t-', @(1,vid))"},
            }),
            ("modify-overwrite-beta", {"origin": "=toUpper"}),
        ],
    ).select(
        F.col("doc")["note"].alias("note"),
        F.col("doc")["origin"].alias("origin"),
        F.col("doc")["meta"]["tag"].alias("tag"),
    ).collect()[0]
    assert out.note is None          # define skipped the existing null key
    assert out.origin == "GEN"       # define added, overwrite rewrote
    assert out.tag == "t-7"          # nested define into existing struct

    # default (not define) fills the null
    filled = jolt_chain(
        src, "doc", [("modify-default-beta", {"note": "fallback"})]
    ).select(F.col("doc")["note"].alias("note")).collect()[0]
    assert filled.note == "fallback"
