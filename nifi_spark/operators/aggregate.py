"""Aggregations, stats, sampling, dedup, ordering limits — SURVEY.md §2.6.

Mappings (reference file → function):

- CalculateRecordStats (.../standard/CalculateRecordStats.java:65-190) →
  :func:`record_stats` (grouped counts, top-N per tracked column)
- AttributeRollingWindow (nifi-stateful-analysis-bundle
  .../AttributeRollingWindow.java:60-141) → :func:`rolling_window` /
  :func:`tumbling_window`
- CountText (.../standard/CountText.java) → :func:`count_text`
- SampleRecord (.../standard/SampleRecord.java:77-97: interval / range /
  probabilistic / reservoir) → :func:`sample_interval`,
  :func:`sample_probabilistic`, :func:`sample_reservoir`
- DeduplicateRecord (.../standard/DeduplicateRecord.java:119-132) →
  :func:`dedup_exact` (exact HashSet arm) and :func:`bloom_seen` (the
  BloomFilter arm: approximate cross-stream membership — false positives
  drop non-duplicates, never false negatives, exactly the reference's
  tradeoff)
- queue prioritizers + ORDER BY inside QueryRecord → :func:`top_k`
- funnels / set ops (§2.6 "Set operations") → plain `union`,
  `intersect`, `exceptAll` (no wrapper needed)

Scale notes: every aggregate here compiles to partial (map-side) + final
hash aggregation — shuffle volume is O(groups), not O(rows). `top_k` uses
a window rank per group, which shuffles once on the group key; for global
top-k prefer `orderBy(...).limit(k)` (Spark's TakeOrderedAndProject — no
full sort materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def record_stats(df: DataFrame, cols: list[str], top_n: int | None = None) -> DataFrame:
    """Per-column grouped value counts, optionally top-N per column.

    ≙ CalculateRecordStats (record count + per-RecordPath category counts,
    limited to top N categories, reference CalculateRecordStats.java:65-70).
    Output: (stat_col, value, cnt) — long format, one shuffle per column
    unioned into one plan.
    """
    parts = []
    for c in cols:
        g = df.groupBy(F.col(c).cast("string").alias("value")).agg(F.count("*").alias("cnt"))
        g = g.select(F.lit(c).alias("stat_col"), "value", "cnt")
        if top_n:
            w = W.partitionBy("stat_col").orderBy(F.desc("cnt"), F.asc("value"))
            g = g.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= top_n).drop("_r")
        parts.append(g)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def tumbling_window(
    df: DataFrame, ts_col: str, value_col: str, window: str
) -> DataFrame:
    """Tumbling event-time window sum+count+mean.

    ≙ AttributeRollingWindow with sub-window granularity (reference
    AttributeRollingWindow.java:93-104). Returns (window_start, window_end,
    sum_value, n, mean_value).
    """
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.sum(value_col).alias("sum_value"),
            F.count("*").alias("n"),
            F.avg(value_col).alias("mean_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "sum_value",
            "n",
            "mean_value",
        )
    )


def rolling_window(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str,
    slide: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sliding event-time window (size=window, slide=slide) sum+count.

    NiFi evaluates the rolling aggregate per arriving FlowFile against
    buffered state; the set-based equivalent is the sliding window group.
    """
    keys = [F.col(c) for c in (group_cols or [])]
    return (
        df.groupBy(*keys, F.window(F.col(ts_col), window, slide).alias("w"))
        .agg(F.sum(value_col).alias("sum_value"), F.count("*").alias("n"))
        .select(
            *(group_cols or []),
            F.col("w.start").alias("window_start"),
            "sum_value",
            "n",
        )
    )


def count_text(df: DataFrame, text_col: str) -> DataFrame:
    """Line/word/char counts per row (≙ CountText.java)."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_lines": F.size(F.split(c, "\n")),
            "n_words": F.size(F.split(F.trim(c), r"\s+")),
            "n_chars": F.length(c),
        }
    )


def sample_interval(df: DataFrame, n: int, id_col: str) -> DataFrame:
    """Every n-th row by a deterministic id (≙ SampleRecord interval mode).

    NiFi samples every n-th record of the FlowFile; a distributed engine
    needs a stable id — pass a key column, not row position.
    """
    return df.filter(F.pmod(F.col(id_col), F.lit(n)) == 0)


def sample_probabilistic(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Bernoulli sample (≙ SampleRecord probabilistic mode), seeded."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def sample_reservoir(df: DataFrame, k: int, seed: int = 42, id_col: str | None = None) -> DataFrame:
    """Fixed-size uniform sample (≙ SampleRecord reservoir mode).

    Deterministic variant: rank by a seeded hash of the row id and keep the
    k smallest — equivalent in distribution to reservoir sampling but
    reproducible across retries/parallelism (FIXTURES.md §0 rule). Uses
    TakeOrderedAndProject (no global sort materialization).
    """
    key = F.xxhash64(F.lit(seed), F.col(id_col)) if id_col else F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns])
    return df.withColumn("_rk", key).orderBy("_rk").limit(k).drop("_rk")


def dedup_exact(
    df: DataFrame, key_cols: list[str], order_col: str | None = None
) -> DataFrame:
    """Exact dedup: one row per key (≙ DeduplicateRecord, all-fields or
    named-RecordPaths key, reference DeduplicateRecord.java:119-127).

    With ``order_col`` the kept row is deterministic (min by order);
    without, it is Spark's `dropDuplicates` (arbitrary winner — fine for
    idempotent payloads, wrong for tests).
    """
    if order_col is None:
        return df.dropDuplicates(key_cols)
    payload = [c for c in df.columns if c not in key_cols]
    return (
        df.groupBy(*key_cols)
        .agg(F.min_by(F.struct(*payload), F.col(order_col)).alias("_w"))
        .select(*key_cols, "_w.*")
    )


def _bloom_positions(col: Column, n_bits: int, n_hashes: int) -> Column:
    """The key's ``n_hashes`` Bloom bit positions — double hashing
    ``h1 + i·h2 (mod m)`` (Kirsch–Mitzenmacher), both hashes md5-derived
    (dedup_fuzzy.md5_long) so ANY engine reproduces the exact positions:
    oracle form ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    from .dedup_fuzzy import md5_long

    h1 = md5_long(col)
    h2 = md5_long(F.concat(F.lit("b2|"), col))
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)])


def bloom_seen(
    df: DataFrame,
    key_col: str,
    seen: DataFrame,
    n_bits: int = 1 << 22,
    n_hashes: int = 5,
    out_col: str = "bloom_seen",
) -> DataFrame:
    """DeduplicateRecord's BloomFilter arm (reference
    DeduplicateRecord.java:129-132 FILTER_TYPE bloom-filter + google
    BloomFilter usage): flag rows of ``df`` whose ``key_col`` is *possibly*
    in ``seen[key_col]`` — the approximate cross-stream dedup membership
    test. False-positive rate ≈ (1 − e^(−kn/m))^k; never false negatives.
    Positions are md5-deterministic, so the FP decisions themselves are
    bit-reproducible across engines (the oracle reproduces them).

    100-TB shape: the filter is materialized as the DISTINCT set of set
    bit positions (≤ n_hashes·|seen|, hard-capped by n_bits) — built with
    one hash aggregation and BROADCAST to the probe side; the probe is an
    explode(k)+broadcast-join+count per key, shuffling only df's distinct
    keys, never the payload.
    """
    bits = (
        seen.select(
            F.explode(_bloom_positions(F.col(key_col), n_bits, n_hashes)).alias("_p")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    probed = (
        df.select(F.col(key_col).alias("_k")).distinct()
        .select("_k", F.explode(_bloom_positions(F.col("_k"), n_bits, n_hashes)).alias("_p"))
        .join(F.broadcast(bits), "_p", "left")
        .groupBy("_k")
        .agg((F.count("_hit") == n_hashes).alias(out_col))
    )
    return df.join(probed, df[key_col] == probed["_k"], "left").drop("_k")


def top_k(df: DataFrame, group_cols: list[str], order_col: str, k: int, desc: bool = True) -> DataFrame:
    """Top-k rows per group (queue-prioritizer / ORDER BY LIMIT analog)."""
    order = F.desc(order_col) if desc else F.asc(order_col)
    w = W.partitionBy(*group_cols).orderBy(order, *[F.asc(c) for c in df.columns if c != order_col])
    return df.withColumn("_rank", F.row_number().over(w)).filter(F.col("_rank") <= k)


def sessionize(
    df: DataFrame, ts_col: str, gap: str, group_cols: list[str]
) -> DataFrame:
    """Event-time sessionization: events ≤gap apart merge into one session.

    Spark-native ``session_window`` (Structured Streaming's dynamic-gap
    windows work in batch too). NiFi has no session-window operator — its
    closest analog is MergeContent's max-bin-age correlation binning
    (reference MergeContent.java:271 MAX_BIN_AGE); this is the event-time
    generalization. Output: group cols + session_start/session_end/n_events
    where session_end = last event + gap (Spark's convention).
    """
    return (
        df.groupBy(*group_cols, F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            *group_cols,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
