"""Tests: stateful streaming operators and log-dialect readers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_spark.schema import CHANGE_EVENTS
from nifi_spark.sources.formats import (
    convert_record,
    grok_to_regex,
    parse_cef,
    parse_grok,
    parse_syslog_3164,
)
from nifi_spark.streaming.stateful import (
    stateful_detect_duplicate,
    stateful_stale_filter,
)


def _seg(spark, tmp_path, name, rows):
    df = spark.createDataFrame(rows, CHANGE_EVENTS)
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "feed" / name))
    return df


def test_stateful_stale_filter_drops_replayed_events(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    mk = lambda seq, text: (seq, "U", ts, "c1", 0, "user", text, None, "f", seq, None)
    # batch 1: seq 5 and 7; batch 2: replay of 5 (stale) + fresh 9
    _seg(spark, tmp_path, "b1", [mk(5, "v5"), mk(7, "v7")])
    _seg(spark, tmp_path, "b2", [mk(5, "v5-replay"), mk(9, "v9")])

    stream = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "feed" / "*"))
    )
    filtered = stateful_stale_filter(stream, ["conv_id", "turn_idx"], "seq")
    q = (
        filtered.writeStream.format("memory")
        .queryName("stale_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r["seq"] for r in spark.sql("SELECT seq FROM stale_test ORDER BY seq").collect()]
    assert 7 in rows and 9 in rows
    assert rows.count(5) == 1  # the batch-2 replay of seq 5 was dropped


def test_stateful_detect_duplicate_first_only(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    mk = lambda seq, conv: (seq, "U", ts, conv, 0, "user", "t", None, "f", seq, None)
    _seg(spark, tmp_path, "b1", [mk(1, "c1"), mk(2, "c2")])
    _seg(spark, tmp_path, "b2", [mk(3, "c1"), mk(4, "c3")])

    stream = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "feed" / "*"))
    )
    out = stateful_detect_duplicate(stream, ["conv_id", "turn_idx"])
    q = (
        out.writeStream.format("memory")
        .queryName("dup_test")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT conv_id, seq FROM dup_test").collect()
    by_conv = {r["conv_id"]: r["seq"] for r in rows}
    assert len(rows) == 3  # c1 once, c2, c3
    assert by_conv["c1"] == 1  # first occurrence won


def test_parse_syslog_3164(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[1234]: 'su root' failed for lonvick"
    df = spark.createDataFrame([(line,), ("garbage",)], "line string")
    out = parse_syslog_3164(df).collect()
    ok = [r for r in out if r["host"] == "mymachine"][0]
    assert ok["pri"] == 34 and ok["facility"] == 4 and ok["severity"] == 2
    assert ok["tag"] == "su" and ok["pid"] == 1234
    assert ok["message"].startswith("'su root' failed")
    bad = [r for r in out if r["host"] == ""][0]
    assert bad["message"] == ""


def test_parse_cef(spark):
    line = "CEF:0|Vendor|Prod|1.0|sig42|Port scan|7|src=10.0.0.1 dst=10.0.0.2"
    out = parse_cef(spark.createDataFrame([(line,)], "line string")).collect()[0]
    assert out["vendor"] == "Vendor" and out["signature_id"] == "sig42"
    assert out["cef_severity"] == "7" and "src=10.0.0.1" in out["extensions"]


def test_parse_grok(spark):
    pat = "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{GREEDYDATA:msg}"
    regex, fields = grok_to_regex(pat)
    assert fields == ["ts", "level", "msg"]
    df = spark.createDataFrame(
        [("2024-01-01T10:00:00 ERROR boom happened",)], "line string"
    )
    out = parse_grok(df, "line", pat).collect()[0]
    assert out["level"] == "ERROR" and out["msg"] == "boom happened"


def test_convert_record_roundtrip(spark, tmp_path):
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    src.write.mode("overwrite").parquet(str(tmp_path / "in"))
    convert_record(spark, str(tmp_path / "in"), "parquet", str(tmp_path / "out"), "json")
    back = spark.read.json(str(tmp_path / "out"))
    assert {(r["id"], r["s"]) for r in back.collect()} == {(1, "a"), (2, "b")}
