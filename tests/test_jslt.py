"""JSLT subset compiler (operators/jslt.py) — programs mirror the
reference's own fixtures (nifi-jslt-bundle TestJSLTTransformJSON:
simpleTransform / dynamicKeyTransform), evaluated as Catalyst
expressions over struct/map columns."""

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators.jslt import jslt_transform


def _doc(spark):
    return spark.createDataFrame(
        [(1, ((3.0,), (5,), "good", ["a", "b"]))],
        "id int, doc struct<rating: struct<value: double>, quality: struct<value: bigint>, kind: string, tags: array<string>>",
    )


def test_jslt_simple_transform(spark):
    """The reference's simpleTransform.json shape: nested object
    constructor over dot paths."""
    out = jslt_transform(
        _doc(spark), "doc",
        '{"SecondaryRatings": {"quality": {"Value": .rating.value, '
        '"RatingRange": .quality.value}}}',
    ).collect()[0].doc
    assert out.SecondaryRatings.quality.Value == 3.0
    assert out.SecondaryRatings.quality.RatingRange == 5


def test_jslt_if_functions_let_ops(spark):
    out = jslt_transform(
        _doc(spark), "doc",
        'let v = .rating.value '
        '{"band": if ($v >= 2.5) "high" else "low", '
        '"label": uppercase(.kind), '
        '"n": size(.tags), '
        '"sum": $v + .quality.value, '
        '"neg": if (not($v > 100.0)) 1 else 0, '
        '"has_a": contains("a", .tags), '
        '"missing": .nope.deep}',
    ).collect()[0].doc
    assert out.band == "high"
    assert out.label == "GOOD"
    assert out.n == 2
    assert out.sum == 8.0
    assert out.neg == 1
    assert out.has_a is True
    assert out.missing is None  # JSLT: absent path -> null


def test_jslt_object_matcher(spark):
    """'* : .' copies input fields not already named."""
    out = jslt_transform(
        _doc(spark), "doc",
        '{"kind": uppercase(.kind), * : .}',
    ).collect()[0].doc
    assert out.kind == "GOOD"
    assert out.rating.value == 3.0 and out.tags == ["a", "b"]


def test_jslt_for_over_map(spark):
    """dynamicKeyTransform shape: for() over a map — dynamic keys."""
    df = spark.createDataFrame(
        [(1, {"primary": 3.0, "quality": 5.0})], "id int, doc map<string,double>"
    )
    out = jslt_transform(
        df, "doc", '{for (.) uppercase(.key) : .value * 2.0}'
    ).collect()[0].doc
    assert out == {"PRIMARY": 6.0, "QUALITY": 10.0}


def test_jslt_for_over_struct(spark):
    """for() over an object: keys are schema-static, value exprs unify."""
    df = spark.createDataFrame(
        [(1, (3.0, 5.0))], "id int, doc struct<primary: double, quality: double>"
    )
    out = jslt_transform(
        df, "doc", '{for (.) .key : {"Id": .key, "Value": .value}}'
    ).collect()[0].doc
    assert out["primary"].Id == "primary" and out["primary"].Value == 3.0
    assert out["quality"].Value == 5.0


def test_jslt_is_functions_static(spark):
    out = jslt_transform(
        _doc(spark), "doc",
        '{"ta": is-array(.tags), "ko": is-object(.rating), '
        '"ks": is-string(.kind), "kn": is-number(.rating.value)}',
    ).collect()[0].doc
    assert (out.ta, out.ko, out.ks, out.kn) == (True, True, True, True)


def test_jslt_unsupported_raise(spark):
    df = _doc(spark)
    # def declarations are supported since round 4 (compile-time inline)
    assert jslt_transform(df, "doc", 'def f(x) $x {"a": f(1)}').count() > 0
    with pytest.raises(ValueError, match="function"):
        jslt_transform(df, "doc", '{"a": test("x")}')


def test_def_functions_inline(spark):
    """User `def` functions: $param binding, nesting (a def calling
    another def), `.` = caller's node, and the recursion guard."""
    from nifi_spark.operators.jslt import jslt_transform

    df = spark.createDataFrame(
        [(("ada", 2),), (("bob", 5),)], "doc struct<name:string, n:bigint>"
    )
    prog = """
        def shout(s) uppercase($s) + "!"
        def label(x) shout(.name) + "-" + string($x * 2)
        { "tag": label(.n), "plain": shout("hi") }
    """
    rows = {r.doc.tag for r in jslt_transform(df, "doc", prog).collect()}
    assert rows == {"ADA!-4", "BOB!-10"}

    import pytest as _pt
    with _pt.raises(ValueError, match="recursive def"):
        jslt_transform(df, "doc", 'def loop(x) loop($x) {"a": loop(1)}')
    with _pt.raises(ValueError, match="takes 1 args"):
        jslt_transform(df, "doc", 'def one(x) $x {"a": one(1, 2)}')
