"""Deterministic synthetic CDC change feed at arbitrary scale.

Replaces the reference's test-data generators (GenerateFlowFile /
GenerateRecord, reference .../standard/GenerateFlowFile.java and
GenerateRecord.java) and its fake-binlog CDC test harness
(nifi-cdc-mysql .../CaptureChangeMySQLTest.java) with a lazy,
shuffle-free Spark plan: every column is a pure function of
``(seed, conv_id, turn_idx, edit_j)`` via ``xxhash64`` — no wall clock,
no unseeded randomness — so any re-run, any parallelism level, and any
resume produces identical logical content (FIXTURES.md §0 rule).

Feed shape (FIXTURES.md §2): events keyed ``(conv_id, turn_idx)`` with
``op ∈ {I,U,D}``, globally unique strictly-increasing ``seq``
(≙ NiFi ``cdc.sequence.id``), event-time ``ts`` monotone in seq with
bounded jitter, lineage coords ``source_file``/``source_pos``
(≙ binlog filename/position), and a raw ``payload_json`` copy for the
Arrow-normalization path.

seq construction: ``seq = vt * (C * Tmax) + key_index`` where
``vt = j * 2^16 + h(j) mod 2^16`` is per-key strictly increasing virtual
time and ``key_index = conv * Tmax + turn`` is unique per key — hence
seq is globally unique, totally ordered, and per-key order equals edit
order. Every key's first event (j=0) is an INSERT, so "≥1 I before any
U/D in seq order" holds by construction.

Scale note: the plan is ``range → filter → explode(sequence) → project``
— embarrassingly parallel, no shuffle, O(1) driver memory. A 10^10-event
feed is the same plan with bigger constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VT_STRIDE = 1 << 16  # per-edit virtual-time stride; jitter stays below it
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z — fixed, never wall-clock


def _h(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic non-negative 63-bit hash of (seed, tag, *cols)."""
    return F.abs(F.xxhash64(F.lit(seed), F.lit(tag), *cols))


def generate_change_feed(
    spark: SparkSession,
    n_conversations: int = 100,
    max_turns: int = 8,
    max_edits: int = 4,
    seed: int = 42,
    hot_keys: int = 0,
    hot_extra_edits: int = 0,
    delete_pct: int = 20,
    v2_from_seq: int | None = None,
    ts_jitter_s: int = 0,
    events_per_file: int = 1000,
) -> DataFrame:
    """Build the lazy change-event DataFrame (schema.CHANGE_EVENTS [+ tool_meta]).

    ``hot_keys``/``hot_extra_edits`` inject Zipf-ish skew: the first
    ``hot_keys`` conversations get up to ``hot_extra_edits`` additional
    updates per turn (the salted-fold test bed, SURVEY.md §7.2 slice 5).
    ``v2_from_seq`` switches on the ``tool_meta`` column from that seq
    onward (additive schema evolution scenario).
    """
    c_tmax = n_conversations * max_turns

    keys = (
        spark.range(c_tmax)
        .select(
            (F.col("id") / max_turns).cast("long").alias("conv"),
            F.pmod(F.col("id"), F.lit(max_turns)).cast("int").alias("turn"),
            F.col("id").alias("key_index"),
        )
        # turns per conversation: 1..max_turns, deterministic per conv
        .withColumn("n_turns", (F.pmod(_h(seed, "T", F.col("conv")), F.lit(max_turns)) + 1))
        .filter(F.col("turn") < F.col("n_turns"))
    )

    edits = F.pmod(_h(seed, "M", F.col("conv"), F.col("turn")), F.lit(max_edits)) + 1
    if hot_keys > 0 and hot_extra_edits > 0:
        edits = edits + F.when(
            F.col("conv") < hot_keys,
            F.pmod(_h(seed, "H", F.col("conv"), F.col("turn")), F.lit(hot_extra_edits)),
        ).otherwise(F.lit(0))
    keys = keys.withColumn("m", edits)

    ev = keys.select(
        "conv", "turn", "key_index",
        F.explode(F.sequence(F.lit(0), F.col("m") - 1)).alias("j"),
        "m",
    )

    vt = F.col("j") * VT_STRIDE + F.pmod(
        _h(seed, "J", F.col("conv"), F.col("turn"), F.col("j")), F.lit(VT_STRIDE)
    )
    ev = ev.withColumn("vt", vt).withColumn(
        "seq", F.col("vt") * c_tmax + F.col("key_index")
    )

    op = (
        F.when(F.col("j") == 0, F.lit("I"))
        .when(
            F.pmod(_h(seed, "O", F.col("conv"), F.col("turn"), F.col("j")), F.lit(100))
            < delete_pct,
            F.lit("D"),
        )
        .otherwise(F.lit("U"))
    )
    ev = ev.withColumn("op", op)

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    role = F.when(
        F.col("op") == "D", F.lit(None).cast("string")
    ).otherwise(
        F.element_at(roles, (F.pmod(_h(seed, "R", F.col("conv"), F.col("turn")), F.lit(4)) + 1).cast("int"))
    )

    text = F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("turn "), F.col("turn"), F.lit(" of conv "), F.col("conv"),
            F.lit(" rev "), F.col("j"), F.lit(" :: "),
            F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col("conv"), F.col("turn"), F.col("j"))), 1, 16),
        )
    )
    tool = F.when(
        (F.col("op") != "D") & (role == "tool"),
        F.concat(F.lit("tool_"), F.pmod(_h(seed, "X", F.col("conv"), F.col("turn")), F.lit(5))),
    ).otherwise(F.lit(None).cast("string"))

    ts_s = (F.col("seq") / F.lit(float(c_tmax * 16))).cast("long")
    if ts_jitter_s > 0:
        ts_s = ts_s + F.pmod(
            _h(seed, "Z", F.col("conv"), F.col("turn"), F.col("j")), F.lit(2 * ts_jitter_s)
        ) - ts_jitter_s
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + ts_s)

    out = ev.select(
        F.col("seq"),
        F.col("op"),
        ts.alias("ts"),
        F.concat(F.lit("conv-"), F.lpad(F.col("conv").cast("string"), 8, "0")).alias("conv_id"),
        F.col("turn").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
    )

    file_span = events_per_file * (c_tmax * 16)  # seq-space span per synthetic binlog file
    out = out.withColumn(
        "source_file",
        F.concat(F.lit("binlog."), F.lpad((F.col("seq") / file_span).cast("long").cast("string"), 6, "0")),
    ).withColumn("source_pos", F.pmod(F.col("seq"), F.lit(file_span)))

    payload = F.to_json(
        F.struct(
            F.col("op").alias("type"), F.col("ts").alias("timestamp"), F.col("seq"),
            F.col("conv_id"), F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool"),
        )
    )
    out = out.withColumn("payload_json", payload)

    if v2_from_seq is not None:
        out = out.withColumn(
            "tool_meta",
            F.when(
                (F.col("seq") >= v2_from_seq) & (F.col("op") != "D"),
                F.to_json(F.struct(F.col("seq").alias("call_id"), F.coalesce(F.col("tool"), F.lit("none")).alias("tool_name"))),
            ),
        )
    return out


def with_transactions(
    feed: DataFrame,
    txn_seq_span: int,
    dangling_mod: int | None = None,
) -> DataFrame:
    """Delimit the change feed into transactions (schema.CHANGE_EVENTS_TXN).

    Events are grouped into transactions by seq range
    (``txn_id = seq div txn_seq_span`` — contiguous in log order, the
    shape a binlog writer produces), and one commit-marker row (op='C',
    key columns NULL, seq/ts = the transaction's max) is appended per
    transaction — CaptureChangeMySQL's BEGIN→COMMIT delimiting
    (reference CaptureChangeMySQL.java:947-1024). ``dangling_mod``: every
    transaction with ``txn_id % dangling_mod == 0`` gets NO commit marker
    (a crashed writer's dangling transaction) — its events must never
    reach the sink under transaction-consistent apply.

    Commit markers carry a ``payload_json`` of ``{"type":"C","seq":...}``
    so the raw-JSON normalization path can still classify them.

    Scale note: one groupBy(txn_id) shuffle over the feed to derive the
    marker rows — a feed-materialization cost, not a pipeline cost.
    """
    data = feed.withColumn(
        "txn_id", F.expr(f"seq div {int(txn_seq_span)}")
    )
    commits = (
        data.groupBy("txn_id")
        .agg(
            F.max("seq").alias("max_seq"),
            F.max("ts").alias("max_ts"),
            F.max("source_file").alias("source_file"),
            F.max("source_pos").alias("source_pos"),
        )
    )
    if dangling_mod:
        commits = commits.filter(F.pmod("txn_id", F.lit(dangling_mod)) != 0)
    marker_payload = F.to_json(
        F.struct(
            F.lit("C").alias("type"),
            F.col("max_ts").alias("timestamp"),
            F.col("max_seq").alias("seq"),
        )
    )
    nstr = F.lit(None).cast("string")
    markers = commits.select(
        F.col("max_seq").alias("seq"),
        F.lit("C").alias("op"),
        F.col("max_ts").alias("ts"),
        nstr.alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        nstr.alias("role"),
        nstr.alias("text"),
        nstr.alias("tool"),
        *[
            F.lit(None).cast(dict((f.name, f.dataType) for f in data.schema.fields)[c]).alias(c)
            for c in data.columns
            if c not in (
                "seq", "op", "ts", "conv_id", "turn_idx", "role", "text",
                "tool", "source_file", "source_pos", "payload_json", "txn_id",
            )
        ],
        F.col("source_file"),
        F.col("source_pos"),
        marker_payload.alias("payload_json"),
        F.col("txn_id"),
    )
    return data.unionByName(markers.select(*data.columns))


def with_ddl(
    spark: SparkSession,
    feed: DataFrame,
    ddl_events: list[tuple[int, str]],
) -> DataFrame:
    """Inject DDL change events into the feed: one row per ``(seq,
    statement)`` with op='ddl', the statement in ``text``, key columns
    NULL (≙ the binlog DDL events CaptureChangeMySQL forwards when
    INCLUDE_DDL_EVENTS is set, reference CaptureChangeMySQL.java:353-362,
    :985-1008). ``ts`` is derived from the surrounding feed's epoch so
    watermarks keep advancing."""
    import datetime as dt
    import json as _json

    rows = []
    for seq, stmt in ddl_events:
        ts = dt.datetime.utcfromtimestamp(BASE_EPOCH)
        payload = _json.dumps(
            {"type": "ddl", "timestamp": ts.isoformat(sep=" "), "seq": seq,
             "text": stmt}
        )
        rows.append((seq, "ddl", ts, None, None, None, stmt, None,
                     "binlog.ddl", seq, payload))
    base_cols = [
        "seq", "op", "ts", "conv_id", "turn_idx", "role", "text", "tool",
        "source_file", "source_pos", "payload_json",
    ]
    ddl_df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("seq", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("conv_id", T.StringType(), True),
            T.StructField("turn_idx", T.IntegerType(), True),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("source_file", T.StringType(), True),
            T.StructField("source_pos", T.LongType(), True),
            T.StructField("payload_json", T.StringType(), True),
        ]),
    )
    for c in feed.columns:
        if c not in base_cols:
            ddl_df = ddl_df.withColumn(
                c, F.lit(None).cast(dict((f.name, f.dataType) for f in feed.schema.fields)[c])
            )
    return feed.unionByName(ddl_df.select(*feed.columns))


def materialize_feed(
    df: DataFrame,
    path: str,
    n_segments: int = 1,
    disorder_window: int = 0,
    seed: int = 42,
) -> None:
    """Write the feed to parquet segment files (the synthetic "binlog").

    ``n_segments`` splits the log into seq-contiguous files so tests can
    replay segment-by-segment (resume scenarios). ``disorder_window``
    shuffles arrival order within ±window ranks of true seq order —
    bounded disorder for the watermark/out-of-order tests — while the
    ``seq`` column keeps the truth.
    """
    order = F.col("seq")
    if disorder_window > 0:
        order = F.col("seq") + F.pmod(
            F.abs(F.xxhash64(F.lit(seed), F.lit("dis"), F.col("seq"))),
            F.lit(2 * disorder_window),
        ) - disorder_window
    (
        df.withColumn("_arrival", order)
        .repartitionByRange(n_segments, "_arrival")
        .sortWithinPartitions("_arrival")
        .drop("_arrival")
        .write.mode("overwrite")
        .parquet(path)
    )
