"""Property-based tests (hypothesis) — randomized coverage the reference
suite lacks (SURVEY.md §5: "no randomized/property-based testing"):

- the LWW fold kernel against the independent pandas oracle on arbitrary
  event sets with shuffled sequence numbers,
- RecordPath parse → unparse → parse round-trips over the full step
  grammar (index, multi-index, wildcard, map key, predicate),
- EL string functions against plain-Python reference semantics.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nifi_spark.functions.el import _compile_json_path
from nifi_spark.functions.recordpath import _unparse, parse_path
from nifi_spark.operators.ordering import lww_fold

from .oracle import pandas_fold

_SETTINGS = dict(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_texts = st.text(alphabet="ab é", max_size=5)
_events = st.lists(
    st.tuples(
        st.integers(0, 3),  # conv
        st.integers(0, 2),  # turn
        st.sampled_from(["I", "U", "D"]),
        _texts,
    ),
    min_size=1,
    max_size=40,
).flatmap(
    lambda evs: st.permutations(range(len(evs))).map(
        lambda seqs: [
            (f"c{c}", t, o, x, s) for (c, t, o, x), s in zip(evs, seqs)
        ]
    )
)


@settings(**_SETTINGS)
@given(rows=_events)
def test_lww_fold_matches_pandas_oracle(spark, rows):
    cols = ["conv_id", "turn_idx", "op", "text", "seq"]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, op string, text string, seq long"
    )
    actual = (
        lww_fold(df)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    expected = (
        pandas_fold(pd.DataFrame(rows, columns=cols))
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(actual, expected[actual.columns], check_dtype=False)


_names = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,4}", fullmatch=True)
_steps = st.one_of(
    st.integers(0, 9),
    st.just("*"),
    st.tuples(
        st.just("idx"), st.lists(st.integers(0, 9), min_size=2, max_size=3)
    ).map(lambda t: (t[0], t[1])),
    st.tuples(
        st.just("key"), st.lists(_names, min_size=1, max_size=2)
    ).map(lambda t: (t[0], t[1])),
    st.tuples(
        st.just("pred"),
        st.one_of(st.just("."), _names),
        st.sampled_from(["=", "!=", ">", ">=", "<", "<="]),
        st.one_of(st.integers(-99, 99), _names.map(str)),
    ),
)
_segs = st.lists(
    st.tuples(_names, st.lists(_steps, max_size=2)), min_size=1, max_size=4
)


@settings(deadline=None, max_examples=200)
@given(segs=_segs)
def test_recordpath_parse_unparse_roundtrip(segs):
    path = "/" + "/".join(_unparse(segs))
    assert parse_path(path) == segs


@settings(deadline=None, max_examples=200)
@given(toks=st.lists(st.one_of(_names, st.integers(0, 99)), max_size=5))
def test_el_json_path_compile_roundtrip(toks):
    path = "$" + "".join(
        f".{t}" if isinstance(t, str) else f"[{t}]" for t in toks
    )
    assert _compile_json_path(path) == toks


_subjects = st.lists(st.text(alphabet="abc:/", max_size=8), min_size=1, max_size=30)


@settings(**_SETTINGS)
@given(
    subjects=_subjects,
    x=st.text(alphabet="abc:/", min_size=1, max_size=3),
)
def test_el_substring_functions_match_python(spark, subjects, x):
    # NiFi EL search arguments are literals in the expression, matching
    # the evaluator constructor signatures — so x is per-example here
    from nifi_spark.functions.el import el

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(subjects)], "i long, s string"
    )
    got = {
        r.i: r
        for r in df.select(
            "i",
            el("indexOf", F.col("s"), x).alias("idx"),
            el("lastIndexOf", F.col("s"), x).alias("lidx"),
            el("substringBefore", F.col("s"), x).alias("sb"),
            el("substringAfter", F.col("s"), x).alias("sa"),
            el("substringAfterLast", F.col("s"), x).alias("sal"),
        ).collect()
    }
    for i, s in enumerate(subjects):
        r = got[i]
        assert r.idx == s.find(x), (s, x)
        assert r.lidx == s.rfind(x), (s, x)
        assert r.sb == (s.split(x, 1)[0] if x in s else s), (s, x)
        assert r.sa == (s[s.find(x) + len(x):] if x in s else s), (s, x)
        assert r.sal == (s[s.rfind(x) + len(x):] if x in s else s), (s, x)
