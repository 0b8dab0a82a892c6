"""Training-data curation operators beyond dedup/similarity.

The large-scale pretraining pipeline the engine targets needs, after
near-dup removal (operators/dedup_fuzzy.py) and quality features
(operators/text.py), four more curation stages — each here as a
first-class operator over the `documents` table:

- **benchmark decontamination** (:func:`decontaminate`,
  :func:`decontaminate_bloom`) — drop/flag training documents that
  share n-grams with an evaluation benchmark, the standard leakage
  guard (the n-gram-overlap rule popularized by GPT-3/PaLM data
  cards); exact broadcast set by default, Bloom set-bit compression
  when the benchmark is too large to broadcast exactly.
- **sequence packing** (:func:`pack_sequences`) — assign documents to
  fixed-token-budget training sequences (quota packing: contiguous
  next-boundary rule, computed with one window sum — the scalable
  approximation of bin packing used by sharded packing jobs).
- **stratified sampling** (:func:`sample_stratified`, exact windowed
  form; :func:`sample_hash_threshold`, the zero-exchange map-side form
  for corpus scale) — deterministic md5-rank sampling, the
  replay-stable version of `df.sampleBy`.
- **domain mixing** (:func:`domain_mix`) — resample the corpus to a
  target domain mixture (weights over a domain column), capped by the
  scarcest domain; fully declarative (no driver-side counts).
- **quality funnel** (:func:`quality_funnel`) — per-stage survivor
  counts for the chained curation filters, the observability row a
  curation run reports.

Design for determinism + oracle parity (same doctrine as
dedup_fuzzy.py): ranks and hashes come from ``md5`` hex, never
``xxhash64``/``rand``, so the DuckDB oracle reproduces every decision
bit-for-bit and the driver's value-hash gate applies.

Scale notes:
- decontaminate: the benchmark side is tiny relative to the corpus
  (10^4-10^6 shingles vs 10^10 docs) → broadcast hash join; the corpus
  side streams through map-side, no corpus shuffle. ``broadcast_bench=
  False`` falls back to a shuffle join for pathological benchmark sizes.
- pack_sequences: packing is per shard (``group_size`` consecutive doc
  ids), windows partition by shard → parallel; no global sort. This is
  how production packing jobs scale: global next-fit is inherently
  sequential, sharded next-fit is embarrassingly parallel and within
  one partial pack per shard of optimal.
- sample_stratified / domain_mix: one hash-partition shuffle on the
  strata/domain column; per-stratum ranking is a window inside that
  exchange. Domain counts for the mix are a second tiny agg joined
  back — no collect, no driver loop.

Reference parity: the reference has no corpus-curation operators (NiFi
is a flow engine); these are the "beyond the reference" additions the
task brief names. Closest reference shapes cited per function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nifi_spark.operators.dedup_fuzzy import _guard_internal, md5_long, shingles


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

def benchmark_shingle_set(
    bench: DataFrame, text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """Distinct 60-bit hashed shingles of the benchmark corpus.

    One column ``bench_sh: long``. Computed once and reused across
    decontamination runs (callers may persist it — it is the small,
    stable side of the join).
    """
    return (
        bench.select(F.explode(shingles(F.col(text_col), shingle_n)).alias("_s"))
        .select(md5_long(F.col("_s")).alias("bench_sh"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_hits: int = 1,
    broadcast_bench: bool = True,
    include_clean: bool = True,
) -> DataFrame:
    """Flag training documents sharing >= ``min_hits`` distinct token
    n-grams with a benchmark set (eval-leakage guard).

    Output: one row per input document — ``(id_col, n_hits, containment,
    contaminated)`` where ``containment = n_hits / n_doc_shingles`` (the
    ratio thresholded contamination rules actually use — a short doc
    fully inside the benchmark scores 1.0 even with few absolute hits).
    Callers drop ``contaminated`` rows or keep the columns for audit.

    Plan shape at 100 TB: the benchmark shingle set is broadcast
    (n-grams of an eval suite are ~10^5-10^6 longs — a few MB); each
    corpus partition shingles, hashes, and probes the broadcast set
    map-side, then one hash agg by doc id counts hits. The corpus is
    never shuffled by shingle. ``broadcast_bench=False`` selects a
    shuffle hash join instead (both sides exploded on the shingle hash)
    for benchmark sets too large to broadcast.

    ``include_clean=False`` is the corpus-scale output shape: only the
    documents with >= 1 hit are returned (contamination is sparse —
    ~1e-4 of a web corpus); the default True keeps the n_hits=0 rows so
    the audit is total (and the oracle can value-check all rows).

    Plan note: the corpus is shingled EXACTLY once — one explode, then a
    left probe of the broadcast set, then one hash agg counting both the
    doc's shingles (``count(*)``, the containment denominator) and the
    hits (``count(bench_sh)``). The earlier ``size(arr)`` +
    ``explode(arr)`` form put the size in a Project ABOVE the Generate,
    where Catalyst re-evaluated the whole shingle+md5 array per EXPLODED
    row (~shingle-count× the work; measured 12 s → 0.6 s at sf0.1), and
    the Generate's inferred ``size(arr) > 0`` filter pushed a second full
    evaluation below the repartition onto the single scan task.
    ``explode_outer`` keeps null-text docs in the audit (n_hits 0,
    containment 0.0) and infers no such filter.
    """
    _guard_internal(
        docs, ["_sh_h", "_n_sh", "n_hits", "containment", "contaminated"],
        "decontaminate",
    )
    bench_sh = benchmark_shingle_set(bench, text_col, shingle_n)
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)

    sh_arr = F.array_distinct(
        F.transform(shingles(F.col(text_col), shingle_n), lambda s: md5_long(s))
    )
    doc_sh = docs.select(F.col(id_col), F.explode_outer(sh_arr).alias("_sh_h"))

    # shingle hashes are distinct per doc, so count(bench_sh) == distinct
    # hits and count(*) == the doc's shingle count (explode emits exactly
    # the distinct array; a null-text doc emits one null row → 0 hits)
    audit = (
        doc_sh.join(bench_sh, doc_sh["_sh_h"] == bench_sh["bench_sh"], "left")
        .groupBy(id_col)
        .agg(
            F.count("bench_sh").cast("long").alias("n_hits"),
            F.count(F.lit(1)).alias("_n_sh"),
        )
    )
    if not include_clean:
        audit = audit.filter(F.col("n_hits") >= 1)
    return audit.select(
        id_col,
        "n_hits",
        F.round(F.col("n_hits") / F.col("_n_sh"), 6).alias("containment"),
        (F.col("n_hits") >= min_hits).alias("contaminated"),
    )


def decontaminate_bloom(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_hits: int = 1,
    n_bits: int = 1 << 22,
    n_hashes: int = 5,
) -> DataFrame:
    """Bloom-filter decontamination — :func:`decontaminate` for
    benchmark sets too large to broadcast exactly.

    At 10^8+ benchmark shingles the exact distinct-hash set is GBs; the
    Bloom form broadcasts only the DISTINCT SET BIT POSITIONS (hard cap
    ``n_bits`` ≙ 4M defaults to a ≤32 MB int set, usually far less) and
    probes map-side. Never false negatives — every true overlap is
    counted; false positives inflate ``n_hits`` at the usual Bloom rate
    and are themselves md5-deterministic (aggregate._bloom_positions,
    Kirsch–Mitzenmacher double hashing), so even the FP decisions are
    value-checkable cross-engine. Use min_hits ≥ 2 to absorb FPs, or
    treat the output as a candidate set and re-verify exactly.

    Output: ``(id_col, n_hits, contaminated)`` — hit docs only (the
    sparse shape; clean docs are absent, like ``include_clean=False``).
    """
    from nifi_spark.operators.aggregate import _bloom_positions

    _guard_internal(
        docs, ["_sh_h", "_p", "_hit", "n_hits", "contaminated"], "decontaminate_bloom"
    )
    bits = (
        bench.select(F.explode(shingles(F.col(text_col), shingle_n)).alias("_s"))
        .select(md5_long(F.col("_s")).cast("string").alias("_k"))
        .distinct()
        .select(F.explode(_bloom_positions(F.col("_k"), n_bits, n_hashes)).alias("_p"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    probed = (
        docs.select(
            F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("_s")
        )
        .select(id_col, md5_long(F.col("_s")).cast("string").alias("_sh_h"))
        .select(
            id_col, "_sh_h",
            F.explode(_bloom_positions(F.col("_sh_h"), n_bits, n_hashes)).alias("_p"),
        )
        .join(F.broadcast(bits), "_p", "left")
        .groupBy(id_col, "_sh_h")
        .agg((F.count("_hit") == n_hashes).alias("_in"))
    )
    return (
        probed.filter(F.col("_in"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .select(
            id_col, "n_hits", (F.col("n_hits") >= min_hits).alias("contaminated")
        )
    )


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------

_PACK_SHARD_STRIDE = 1_000_000_000


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    group_size: int = 4096,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence.

    Quota packing within shards: documents are sharded by
    ``floor(id / group_size)`` (consecutive ids stay together), ordered
    by id inside the shard, and a document starts in the pack numbered
    ``floor(exclusive_prefix_tokens / budget)``. A pack may overflow by
    at most one document (the standard streaming next-boundary
    approximation; training loaders truncate or bridge the tail).

    Output: ``(id_col, n_tokens, pack_id)`` with
    ``pack_id = shard * 1e9 + local_pack`` — globally unique, stable.

    Scale: one window per shard partition (hash exchange on the shard
    key), no global sort, no driver state. Exact global next-fit is
    inherently sequential; sharded quota packing is the parallel form
    production packing jobs use, within one partial pack per shard of
    a global pass.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if group_size < 1:
        raise ValueError(f"group_size must be >= 1, got {group_size}")
    _guard_internal(docs, ["_shard", "_cum", "n_tokens", "pack_id"], "pack_sequences")

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    with_n = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.col(id_col).cast("long") / F.lit(group_size)).cast("long").alias("_shard"),
    )
    w = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return with_n.select(
        id_col,
        "n_tokens",
        (
            F.col("_shard") * F.lit(_PACK_SHARD_STRIDE)
            + (cum_excl / F.lit(budget)).cast("long")
        ).alias("pack_id"),
    )


def pack_greedy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 32,
    tag: str = "pack",
) -> DataFrame:
    """EXACT greedy next-fit packing within hash shards — the
    never-overflow complement of :func:`pack_sequences`.

    Documents are sharded by a 60-bit md5 of their id (``tag|id``,
    deterministic, partition-independent), ordered by id inside the
    shard, and greedily accumulated: a document opens a new pack iff
    adding it would push the running token total past ``budget``. No
    pack exceeds ``budget`` unless a SINGLE document does (it then sits
    alone in its pack) — the invariant :func:`pack_sequences`'s quota
    approximation trades away for a pure-window plan.

    Greedy next-fit is inherently sequential, so the per-shard scan is
    an Arrow-batched ``applyInPandas`` (grouped-map, one pandas frame
    per shard): the loop runs per DOCUMENT row inside a vectorized
    batch, never per token, and token counting stays JVM-side upstream.
    At 10^10 turns the packing input is per-sample rows (~10^7-10^8),
    sharded to thousands of groups — each group a sub-second numpy
    pass.

    Output: ``(id_col, n_tokens, shard, pack_id, slot)`` with
    ``pack_id = shard * 1e9 + local_pack`` (globally unique, stable)
    and ``slot`` the 1-based position inside the pack.

    Scale: one hash exchange on the shard key; group sizes are
    n/n_shards by md5 uniformity — no skew; no driver state, no global
    sort. ≙ the bin-packing step NiFi flows push into MergeContent's
    size-bound bins (MergeContent.java:115-127), which cannot order
    bins deterministically across a cluster.
    """
    import pandas as pd

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    _guard_internal(docs, ["n_tokens", "shard", "pack_id", "slot"], "pack_greedy")

    id_type = docs.schema[id_col].dataType.simpleString()
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    shard = F.pmod(
        md5_long(F.concat(F.lit(tag + "|"), F.col(id_col).cast("string"))),
        F.lit(n_shards),
    ).cast("int")
    with_n = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        shard.alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values([id_col, "n_tokens"], kind="mergesort").reset_index(
            drop=True
        )
        t = pdf["n_tokens"].to_numpy()
        pack_ids = np.empty(len(t), dtype="int64")
        slots = np.empty(len(t), dtype="int32")
        running, pk, slot = 0, 0, 0
        for i, ti in enumerate(t):
            if slot and running + ti > budget:
                pk, running, slot = pk + 1, 0, 0
            running += int(ti)
            slot += 1
            pack_ids[i] = pk
            slots[i] = slot
        base = int(pdf["shard"].iloc[0]) * _PACK_SHARD_STRIDE
        return pdf.assign(pack_id=base + pack_ids, slot=slots)

    out_schema = (
        f"{id_col} {id_type}, n_tokens long, shard int, pack_id long, slot int"
    )
    return with_n.groupBy("shard").applyInPandas(pack, schema=out_schema)


def pack_stats(packed: DataFrame) -> DataFrame:
    """Per-pack occupancy: ``(pack_id, n_docs, sum_tokens)`` — the
    shape a packing audit reports (fill factor, overflow tail)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


# --------------------------------------------------------------------------
# Stratified sampling / domain mixing
# --------------------------------------------------------------------------

def _md5_rank(id_col: str, tag: str):
    return F.md5(F.concat(F.lit(tag + "|"), F.col(id_col).cast("string")))


def sample_stratified(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    id_col: str,
    tag: str = "strat",
) -> DataFrame:
    """Exact per-stratum fraction with a deterministic md5 rank.

    Keeps ``ceil(fraction * n_stratum)`` rows per stratum — the rows
    with the smallest ``md5(tag|id)`` rank. Unlike ``df.sampleBy`` this
    is replay-stable (same rows every run, any partitioning) and exact
    per stratum, so the driver's value-hash oracle applies.

    One shuffle: both windows (rank and stratum size) share the
    partitioning on ``strata_cols``.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    _guard_internal(df, ["_rk", "_rn", "_ns"], "sample_stratified")
    strata = [F.col(c) for c in strata_cols]
    wo = Window.partitionBy(*strata).orderBy(_md5_rank(id_col, tag), F.col(id_col))
    wa = Window.partitionBy(*strata)
    return (
        df.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_ns", F.count(F.lit(1)).over(wa))
        .filter(F.col("_rn") <= F.ceil(F.col("_ns") * F.lit(fraction)))
        .drop("_rn", "_ns")
    )


def sample_hash_threshold(
    df: DataFrame,
    id_col: str,
    fraction: float | None = None,
    domain_col: str | None = None,
    fractions: dict[str, float] | None = None,
    tag: str = "thr",
) -> DataFrame:
    """Shuffle-free deterministic sampling: keep a row iff its 60-bit
    md5 rank is below ``fraction`` of the hash space.

    The corpus-scale counterpart of :func:`sample_stratified`: that one
    is EXACT per stratum but pays a per-stratum window — at 10^10 rows
    with a handful of strata the window serializes each stratum onto
    one reducer. This one is a pure map-side filter (no exchange at
    all); the kept count is binomial around ``fraction * n`` instead of
    exact. Decisions are still bit-deterministic (same rows every
    replay, same rows in the SQL oracle), only the count is
    approximate — the standard tradeoff for web-corpus sampling.

    Either a global ``fraction``, or per-domain ``fractions`` keyed by
    ``domain_col`` values (≙ ``df.sampleBy`` made replay-stable);
    per-domain thresholds ride a broadcast join, so the plan stays
    exchange-free on the corpus side. Domains absent from ``fractions``
    are dropped.
    """
    if (fraction is None) == (fractions is None):
        raise ValueError("pass exactly one of fraction / fractions")
    _guard_internal(df, ["_thr"], "sample_hash_threshold")
    scale = 1 << 60  # md5_long's domain: first 15 hex chars = 60 bits
    rank = md5_long(F.concat(F.lit(tag + "|"), F.col(id_col).cast("string")))
    if fractions is None:
        if not 0.0 < fraction <= 1.0:
            raise ValueError(f"fraction must be in (0, 1], got {fraction}")
        return df.filter(rank < F.lit(int(fraction * scale)))
    if domain_col is None:
        raise ValueError("fractions requires domain_col")
    if any(not 0.0 < v <= 1.0 for v in fractions.values()):
        raise ValueError(f"fractions must be in (0, 1], got {fractions}")
    thr = df.sparkSession.createDataFrame(
        [(k, int(v * scale)) for k, v in sorted(fractions.items())],
        f"{domain_col} string, _thr long",
    )
    return (
        df.join(F.broadcast(thr), domain_col, "inner")
        .filter(rank < F.col("_thr"))
        .drop("_thr")
    )


def domain_mix(
    docs: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str,
    tag: str = "mix",
) -> DataFrame:
    """Resample the corpus to a target domain mixture.

    ``weights`` maps domain value -> target share (need not sum to 1;
    they are normalized by construction of the cap). The achievable
    total is capped by the scarcest domain: ``T = min_d(avail_d / w_d)``,
    and each domain keeps its ``floor(T * w_d)`` smallest-md5-rank rows.
    Domains absent from ``weights`` are dropped (weight 0).

    Fully declarative — availability counts are a tiny agg, the cap is
    a window min over the per-domain rows (n_domains rows, not data),
    and the keep decision is the same one-shuffle ranked filter as
    :func:`sample_stratified`. No ``collect()``, no driver loop, so the
    plan is one job at any corpus size.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    _guard_internal(docs, ["_w", "_avail", "_cap", "_tgt", "_rn"], "domain_mix")
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        sorted(weights.items()), f"{domain_col} string, _w double"
    )
    avail = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_avail"))
    joined = avail.join(F.broadcast(wdf), domain_col, "inner")
    cap = joined.agg(F.min(F.col("_avail") / F.col("_w")).alias("_cap"))
    targets = joined.crossJoin(F.broadcast(cap)).select(
        domain_col,
        F.floor(F.col("_cap") * F.col("_w")).cast("long").alias("_tgt"),
    )
    wo = Window.partitionBy(domain_col).orderBy(_md5_rank(id_col, tag), F.col(id_col))
    return (
        docs.join(F.broadcast(targets), domain_col, "inner")
        .withColumn("_rn", F.row_number().over(wo))
        .filter(F.col("_rn") <= F.col("_tgt"))
        .drop("_tgt", "_rn")
    )


# --------------------------------------------------------------------------
# Quality funnel
# --------------------------------------------------------------------------

def quality_funnel(
    docs: DataFrame, text_col: str = "text", min_tokens: int = 5,
    min_alpha_ratio: float = 0.5, min_q_score: float = 0.5,
) -> DataFrame:
    """Survivor counts for the chained curation filters.

    Stages (cumulative — each row passes all previous gates too):

    1. ``total`` — input rows
    2. ``len`` — n_tokens >= min_tokens
    3. ``alpha`` — alphabetic char ratio >= min_alpha_ratio
    4. ``quality`` — composite q_score (text.quality_score formula)
       >= min_q_score

    Output: ``(stage_idx, stage, n_rows)`` — the observability row a
    curation run reports per stage. One aggregate over one scan (the
    booleans are conditional sums in a single groupBy().agg), then a
    4-row explode; no per-stage rescans.
    """
    c = F.col(text_col)
    toks = F.split(F.trim(c), r"\s+")
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    alpha_ratio = n_alpha / n_chars
    from nifi_spark.operators.text import STOPWORDS_EN

    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    q_score = F.when(n_tok < 5, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), n_tok / F.lit(64.0)) * 0.4
        + F.least(F.lit(1.0), (n_stop / n_tok) * 4) * 0.3
        + alpha_ratio * 0.3
    )

    b1 = n_tok >= min_tokens
    b2 = b1 & (alpha_ratio >= min_alpha_ratio)
    b3 = b2 & (q_score >= min_q_score)
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    agg = docs.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.when(b1, one).otherwise(zero)).alias("s1"),
        F.sum(F.when(b2, one).otherwise(zero)).alias("s2"),
        F.sum(F.when(b3, one).otherwise(zero)).alias("s3"),
    )
    stages = F.array(
        F.struct(F.lit(0).alias("stage_idx"), F.lit("total").alias("stage"), F.col("s0").alias("n_rows")),
        F.struct(F.lit(1).alias("stage_idx"), F.lit("len").alias("stage"), F.col("s1").alias("n_rows")),
        F.struct(F.lit(2).alias("stage_idx"), F.lit("alpha").alias("stage"), F.col("s2").alias("n_rows")),
        F.struct(F.lit(3).alias("stage_idx"), F.lit("quality").alias("stage"), F.col("s3").alias("n_rows")),
    )
    return agg.select(F.explode(stages).alias("x")).select("x.*")
