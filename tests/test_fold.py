"""Slice-0 scenarios: fold-basic, out-of-order, skew, late-data (FIXTURES.md §5.1/2/3/8)."""

import pandas as pd
from pyspark.sql import functions as F

from nifi_spark.feedgen import generate_change_feed
from nifi_spark.operators.ordering import (
    enforce_order,
    lww_fold,
    lww_fold_salted,
    split_late,
)

from .oracle import assert_final_state_equal, pandas_fold


def _final_cols(df):
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def test_feed_contract(spark):
    ev = generate_change_feed(spark, n_conversations=20, max_turns=8, max_edits=4).cache()
    pdf = ev.toPandas()
    # globally unique, strictly orderable seq
    assert pdf["seq"].is_unique
    # every key's first event (min seq) is an INSERT
    first = pdf.loc[pdf.groupby(["conv_id", "turn_idx"])["seq"].idxmin()]
    assert (first["op"] == "I").all()
    # deterministic: regeneration is byte-identical
    pdf2 = generate_change_feed(spark, n_conversations=20, max_turns=8, max_edits=4).toPandas()
    pd.testing.assert_frame_equal(
        pdf.sort_values("seq").reset_index(drop=True),
        pdf2.sort_values("seq").reset_index(drop=True),
    )
    ev.unpersist()


def test_fold_basic_equals_oracle(spark):
    ev = generate_change_feed(spark, n_conversations=20, max_turns=8, max_edits=4)
    events_pd = ev.toPandas()
    actual = _final_cols(lww_fold(ev)).toPandas()
    assert_final_state_equal(actual, pandas_fold(events_pd))


def test_fold_out_of_order_input(spark):
    # shuffle arrival order; fold must still converge (seq is the truth)
    ev = generate_change_feed(spark, n_conversations=50, max_turns=8, max_edits=4)
    shuffled = ev.orderBy(F.xxhash64("seq"))
    actual = _final_cols(lww_fold(shuffled)).toPandas()
    assert_final_state_equal(actual, pandas_fold(ev.toPandas()))


def test_salted_fold_equals_plain_fold(spark):
    ev = generate_change_feed(
        spark, n_conversations=50, max_turns=8, max_edits=4,
        hot_keys=2, hot_extra_edits=64,
    )
    plain = _final_cols(lww_fold(ev)).toPandas()
    salted = _final_cols(lww_fold_salted(ev, salt_buckets=8)).toPandas()
    assert_final_state_equal(salted, plain)
    # the skew is real: hot conv has many more events
    counts = ev.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    assert counts.max() > counts.median() * 4


def test_split_late(spark):
    ev = generate_change_feed(spark, n_conversations=20, max_turns=4, max_edits=2)
    wm = ev.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    on_time, late = split_late(ev, watermark=F.lit(wm))
    n_all, n_on, n_late = ev.count(), on_time.count(), late.count()
    assert n_on + n_late == n_all
    assert n_late > 0
    # final state of on-time events equals oracle of on-time events
    actual = _final_cols(lww_fold(on_time)).toPandas()
    assert_final_state_equal(actual, pandas_fold(on_time.toPandas()))


def test_enforce_order_ranks(spark):
    ev = generate_change_feed(spark, n_conversations=5, max_turns=4, max_edits=4)
    ranked = enforce_order(ev, ["conv_id", "turn_idx"], "seq").toPandas()
    grp = ranked.sort_values("seq").groupby(["conv_id", "turn_idx"])["_order_rank"]
    for _, ranks in grp:
        assert list(ranks) == list(range(1, len(ranks) + 1))
