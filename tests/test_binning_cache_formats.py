"""Round-2 wave 3: MergeRecord binning, ControlRate, map cache, N-of-M
Wait/Notify, log dialects (5424 / CEF extensions / Grok pattern files),
CHOICE parse, XML/YAML readers."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- binning

def _ev(spark, rows):
    return spark.createDataFrame(rows, "corr string, seq long, ts timestamp, content string")


def test_assign_bins_count_flush(spark):
    from nifi_spark.operators.binning import assign_bins

    rows = [("a", i, None, f"c{i}") for i in range(7)]
    df = spark.createDataFrame(rows, "corr string, seq long, ts timestamp, content string")
    out = assign_bins(df, ["corr"], "seq", max_records=3).orderBy("seq").collect()
    assert [r.bin_id for r in out] == [0, 0, 0, 1, 1, 1, 2]


def test_assign_bins_age_breaks(spark):
    import datetime as dt

    from nifi_spark.operators.binning import assign_bins

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("a", 1, t0, "x"),
        ("a", 2, t0 + dt.timedelta(minutes=5), "y"),
        # 2h later: must start a new bin even though max_records not hit
        ("a", 3, t0 + dt.timedelta(hours=3), "z"),
    ]
    df = _ev(spark, rows)
    out = (
        assign_bins(df, ["corr"], "seq", max_records=10, max_bin_age="1 hour", ts_col="ts")
        .orderBy("seq")
        .collect()
    )
    assert [r.bin_id for r in out] == [0, 0, 1]


def test_assemble_bins_underfilled_and_content(spark):
    from nifi_spark.operators.binning import assemble_bins

    rows = [("a", i, None, str(i)) for i in range(5)] + [("b", 0, None, "solo")]
    df = _ev(spark, rows)
    out = {
        (r.corr, r.bin_id): r
        for r in assemble_bins(
            df, ["corr"], "seq", "content", max_records=4, min_records=2
        ).collect()
    }
    assert out[("a", 0)].merged == "0,1,2,3" and not out[("a", 0)].underfilled
    assert out[("a", 1)].n_records == 1 and out[("a", 1)].underfilled
    assert out[("b", 0)].underfilled


def test_control_rate_count_and_size(spark):
    import datetime as dt

    from nifi_spark.operators.binning import control_rate

    t0 = dt.datetime(2026, 1, 1)
    rows = [("g", i, t0 + dt.timedelta(minutes=i), str(i)) for i in range(10)]
    df = _ev(spark, rows).withColumn("size", F.lit(100))
    admitted, throttled = control_rate(
        df, ["corr"], "ts", max_per_window=3, window_duration="1 hour",
        order_cols=["seq"],
    )
    assert admitted.count() == 3 and throttled.count() == 7
    assert {r.seq for r in admitted.collect()} == {0, 1, 2}
    # byte budget binds tighter than the count
    admitted2, _ = control_rate(
        df, ["corr"], "ts", max_per_window=5, window_duration="1 hour",
        order_cols=["seq"], size_col="size", max_size_per_window=250,
    )
    assert admitted2.count() == 2


def test_duplicate_records(spark):
    from nifi_spark.operators.binning import duplicate_records

    df = spark.range(3)
    out = duplicate_records(df, 2)
    assert out.count() == 9
    assert out.filter(F.col("copy_idx") == 0).count() == 3


# ------------------------------------------------------- streaming binning

def test_stateful_bin_flush_count_and_age(spark, tmp_path):
    """Count flush emits immediately; age flush fires via state timeout on
    a later micro-batch (RecordBinManager housekeeping semantics)."""
    from nifi_spark.streaming.stateful import stateful_bin_flush

    src_dir, out_rows = str(tmp_path / "src"), []
    spark.createDataFrame(
        [("a", i, f"r{i}") for i in range(5)] + [("b", 0, "lone")],
        "corr string, seq long, content string",
    ).write.json(src_dir)
    stream = spark.readStream.schema("corr string, seq long, content string").json(src_dir)
    binned = stateful_bin_flush(
        stream, ["corr"], "seq", "content", max_records=2, max_bin_age_ms=100
    )
    q = (
        binned.writeStream.format("memory")
        .queryName("bins")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM bins").collect()
            if len(rows) >= 4:
                break
            # keep feeding empty-ish batches so the timeout fires
            time.sleep(0.5)
        got = {(r.corr, r.merged): r.flush_reason for r in rows}
        assert got[("a", "r0,r1")] == "count"
        assert got[("a", "r2,r3")] == "count"
        assert got[("a", "r4")] == "age"
        assert got[("b", "lone")] == "age"
    finally:
        q.stop()


def test_stateful_bin_age_flush_under_trickle(spark, tmp_path):
    """A trickle-fed bin (every batch touches the key, count never reached)
    must still flush at MAX_BIN_AGE since *bin creation* — the data path
    rolls the bin over; the timeout is only a quiet-key GC (reference
    RecordBinManager bin lifecycle: age is absolute, not idle time)."""
    from nifi_spark.streaming.stateful import stateful_bin_flush

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)

    def feed(i):
        spark.createDataFrame(
            [("t", i, f"r{i}")], "corr string, seq long, content string"
        ).write.mode("append").json(src_dir)

    feed(0)
    stream = spark.readStream.schema(
        "corr string, seq long, content string"
    ).json(src_dir)
    binned = stateful_bin_flush(
        stream, ["corr"], "seq", "content", max_records=100, max_bin_age_ms=600
    )
    q = (
        binned.writeStream.format("memory")
        .queryName("trickle_bins")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows, i = [], 1
        while time.time() < deadline:
            feed(i)  # sustained trickle: every batch has data for the key
            i += 1
            rows = spark.sql("SELECT * FROM trickle_bins").collect()
            if rows:
                break
            time.sleep(0.25)
        assert rows, "trickle-fed bin never age-flushed"
        assert rows[0].flush_reason == "age"
        assert rows[0].n_records < 100  # count was never the trigger
    finally:
        q.stop()


def test_stateful_rate_limit_successive_windows(spark, tmp_path):
    """Sustained traffic must admit max_per_window per *successive* window
    (NiFi ControlRate ledger), not max_per_window total: the data path
    rolls the window, not the state timeout."""
    from nifi_spark.streaming.stateful import stateful_rate_limit

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)

    def feed(lo, hi):
        spark.createDataFrame(
            [("g", i) for i in range(lo, hi)], "corr string, seq long"
        ).write.mode("append").json(src_dir)

    feed(0, 5)
    stream = spark.readStream.schema("corr string, seq long").json(src_dir)
    limited = stateful_rate_limit(stream, ["corr"], max_per_window=2, window_ms=400)
    q = (
        limited.writeStream.format("memory")
        .queryName("limited_multi")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="150 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        n, i = 0, 5
        while time.time() < deadline:
            feed(i, i + 3)  # sustained: every batch carries data for the key
            i += 3
            n = spark.sql("SELECT * FROM limited_multi").count()
            if n >= 6:  # >= 3 windows' worth admitted
                break
            time.sleep(0.25)
        assert n >= 6, f"only {n} admitted — window never rolled over"
    finally:
        q.stop()


def test_stateful_rate_limit(spark, tmp_path):
    from nifi_spark.streaming.stateful import stateful_rate_limit

    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [("g", i) for i in range(10)], "corr string, seq long"
    ).write.json(src_dir)
    stream = spark.readStream.schema("corr string, seq long").json(src_dir)
    limited = stateful_rate_limit(stream, ["corr"], max_per_window=4, window_ms=600000)
    q = (
        limited.writeStream.format("memory")
        .queryName("limited")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        # poll, not processAllAvailable: pending processing-time timeouts
        # keep scheduling empty batches, so "all available" never settles
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT * FROM limited").count()
            if n == 4:
                break
            time.sleep(0.5)
        assert n == 4
        time.sleep(1.0)  # no further admissions while the window is open
        assert spark.sql("SELECT * FROM limited").count() == 4
    finally:
        q.stop()


# ----------------------------------------------------------------- cache

def test_map_cache_put_fetch_ageoff(spark, tmp_path):
    from nifi_spark.operators.cache import MapCache

    cache = MapCache(spark, str(tmp_path / "cache"), n_buckets=2)
    cache.put(
        spark.createDataFrame(
            [("k1", "v1", 1), ("k2", "v2", 2)],
            "cache_key string, cache_value string, put_seq long",
        ),
        batch_id=0,
    )
    df = spark.createDataFrame([("k1",), ("k2",), ("k3",)], "k string")
    got = {r.k: r.cached_value for r in cache.fetch(df, "k").collect()}
    assert got == {"k1": "v1", "k2": "v2", "k3": None}
    # newer put wins; replayed batch_id is a no-op
    cache.put(
        spark.createDataFrame(
            [("k1", "v1b", 3)], "cache_key string, cache_value string, put_seq long"
        ),
        batch_id=1,
    )
    assert cache.put(
        spark.createDataFrame(
            [("k1", "IGNORED", 9)], "cache_key string, cache_value string, put_seq long"
        ),
        batch_id=1,
    ) is None
    got = {r.k: r.cached_value for r in cache.fetch(df, "k").collect()}
    assert got["k1"] == "v1b"
    # age-off below seq 3 tombstones k2
    cache.age_off(min_seq=3, batch_id=2)
    got = {r.k: r.cached_value for r in cache.fetch(df, "k").collect()}
    assert got == {"k1": "v1b", "k2": None, "k3": None}


def test_wait_notify_counters(spark):
    import datetime as dt

    from nifi_spark.operators.enrich import wait_notify_counters

    t0 = dt.datetime(2026, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    waiting = spark.createDataFrame(
        [("u1", ts(10), "early"), ("u1", ts(40), "late"), ("u2", ts(40), "solo")],
        "user string, ts timestamp, tag string",
    )
    signals = spark.createDataFrame(
        [("u1", ts(m)) for m in (5, 15, 25)] + [("u2", ts(5))],
        "user string, ts timestamp",
    )
    released, still = wait_notify_counters(
        waiting, signals, on=["user"], target_count=3
    )
    assert {r.tag for r in released.collect()} == {"late"}
    assert {r.tag for r in still.collect()} == {"early", "solo"}


# ------------------------------------------------------------ log dialects

def test_parse_syslog_5424(spark):
    from nifi_spark.sources.formats import parse_syslog_5424

    line = (
        '<165>1 2026-01-02T03:04:05Z myhost app 1234 ID47 '
        '[meta k="x" n="7"][other a="b"] hello world'
    )
    nil = "<165>1 2026-01-02T03:04:05Z - - - - -"
    df = spark.createDataFrame([(line,), (nil,)], "line string")
    r1, r2 = parse_syslog_5424(df, "line").orderBy(F.desc("host")).collect()
    assert (r1.pri, r1.facility, r1.severity, r1.version) == (165, 20, 5, 1)
    assert (r1.host, r1.app, r1.procid, r1.msgid) == ("myhost", "app", "1234", "ID47")
    assert r1.sd_id == "meta"
    assert r1.sd_params == {"k": "x", "n": "7", "a": "b"}
    assert r1.message == "hello world"
    assert r2.host is None and r2.message is None and r2.sd_id is None


def test_cef_extensions_map(spark):
    from nifi_spark.sources.formats import parse_cef

    line = (
        "CEF:0|vendor|prod|1.0|sig|name|5|src=10.0.0.1 spt=443 "
        "msg=out of memory act=blocked"
    )
    df = spark.createDataFrame([(line,)], "line string")
    (r,) = parse_cef(df, "line", parse_extensions=True).collect()
    assert r.ext == {
        "src": "10.0.0.1", "spt": "443", "msg": "out of memory", "act": "blocked"
    }


def test_grok_pattern_file_composites(spark):
    from nifi_spark.sources.formats import load_grok_patterns, parse_grok

    pats = load_grok_patterns("MYAPP app-%{INT}\nMYLINE %{MYAPP} ok")
    assert "SYSLOGTIMESTAMP" in pats and "(?:" in pats["SYSLOGTIMESTAMP"]
    assert pats["MYLINE"].startswith("(?:app-")
    df = spark.createDataFrame(
        [("Feb 03 04:05:06 web1.example.com nginx[99]: GET /",)], "line string"
    )
    (r,) = parse_grok(
        df, "line",
        r"%{SYSLOGTIMESTAMP:sts} %{HOSTNAME:host} %{WORD:prog}\[%{INT:pid}\]: %{GREEDYDATA:msg}",
        patterns=pats,
    ).collect()
    assert r.sts == "Feb 03 04:05:06"
    assert r.host == "web1.example.com"
    assert (r.prog, r.pid, r.msg) == ("nginx", "99", "GET /")


def test_grok_recursion_guard():
    from nifi_spark.sources.formats import load_grok_patterns

    with pytest.raises(ValueError, match="recursive"):
        load_grok_patterns("A %{B}\nB %{A}")


# --------------------------------------------- choice / xml / yaml / infer

def test_normalize_choice_branches(spark):
    from pyspark.sql import types as T

    from nifi_spark.normalize import normalize_choice

    a = T.StructType([T.StructField("id", T.LongType()), T.StructField("kind", T.StringType())])
    b = T.StructType([T.StructField("seq", T.LongType()), T.StructField("v", T.DoubleType())])
    df = spark.createDataFrame(
        [('{"id": 1, "kind": "x"}',), ('{"seq": 2, "v": 3.5}',), ("not json",)],
        "payload string",
    )
    rows = normalize_choice(df, "payload", [(a, ["id", "kind"]), (b, ["seq", "v"])]).collect()
    by_branch = {r.branch: r for r in rows}
    assert by_branch[0].parsed_0.kind == "x" and by_branch[0].parsed_1 is None
    assert by_branch[1].parsed_1.v == 3.5 and by_branch[1].parsed_0 is None
    assert -1 in by_branch  # unparseable → DLQ route


def test_parse_xml_and_yaml(spark):
    from nifi_spark.sources.formats import parse_xml, parse_yaml_tree

    df = spark.createDataFrame([("<r><k>5</k><n>hi</n></r>", "k: 5\nn: hi")], "x string, y string")
    (rx,) = parse_xml(df, "x", "k BIGINT, n STRING").collect()
    assert rx.parsed.k == 5 and rx.parsed.n == "hi"
    (ry,) = parse_yaml_tree(df, "y", "k BIGINT, n STRING").collect()
    assert ry.parsed.k == 5 and ry.parsed.n == "hi"


def test_evaluate_xpath(spark):
    from nifi_spark.sources.formats import evaluate_xpath

    df = spark.createDataFrame(
        [('<p id="7"><n>hi</n><s>1</s><s>2</s></p>',), ("<p><n>lo</n></p>",)],
        "x string",
    )
    out = evaluate_xpath(
        df,
        "x",
        {
            "pid": ("/p/@id", "long"),
            "name": "/p/n",  # bare string implies return type 'string'
            "n_s": ("count(/p/s)", "long"),
            "ss": ("/p/s/text()", "nodeset"),
            "two": ("count(/p/s) >= 2", "boolean"),
        },
    )
    rows = {r.name: r for r in out.collect()}
    r = rows["hi"]
    assert r.pid == 7 and r.n_s == 2 and r.ss == ["1", "2"] and r.two
    # no match: zero / empty per EvaluateXPath's attribute contract
    # (Hive xpath_long coerces a missing node to 0, not NULL)
    r2 = rows["lo"]
    assert r2.pid == 0 and r2.n_s == 0 and r2.ss == [] and not r2.two
    # the whole evaluation is JVM-side: no Python eval node in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown return type"):
        evaluate_xpath(df, "x", {"bad": ("/p", "float")})


def test_infer_json_schema_widens(spark):
    from nifi_spark.sources.formats import infer_json_schema

    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ('{"a": 2.5, "c": true}',)], "j string"
    )
    schema = infer_json_schema(spark, df, "j")
    fields = {f.name: f.dataType.simpleString() for f in schema}
    assert fields["a"] == "double"  # long widened to double across rows
    assert fields["b"] == "string" and fields["c"] == "boolean"


def test_parse_windows_event_xml(spark):
    from nifi_spark.sources.formats import parse_windows_event_xml

    full = (
        '<Event><System><Provider Name="P"/><EventID>7</EventID>'
        '<Level>2</Level><TimeCreated SystemTime="2024-01-01T00:00:00Z"/>'
        "<Computer>h1</Computer></System><EventData>"
        '<Data Name="k1">v1</Data><Data Name="k2">v2</Data>'
        "</EventData></Event>"
    )
    # no EventData block at all -> empty map, header still parsed
    bare = (
        '<Event><System><Provider Name="Q"/><EventID>8</EventID>'
        '<Level>0</Level><TimeCreated SystemTime="2024-01-02T00:00:00Z"/>'
        "<Computer>h2</Computer></System></Event>"
    )
    df = spark.createDataFrame([(1, full), (2, bare)], "id long, xml string")
    rows = {r.id: r for r in parse_windows_event_xml(df, "xml").collect()}
    r1 = rows[1]
    assert r1.provider == "P" and r1.event_id == 7 and r1.level == 2
    assert r1.computer == "h1" and r1.event_data == {"k1": "v1", "k2": "v2"}
    r2 = rows[2]
    assert r2.provider == "Q" and r2.event_id == 8 and r2.event_data == {}
