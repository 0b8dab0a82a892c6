"""Fuzzy / near-duplicate detection for training-data pipelines.

Four families, each a first-class operator over the `documents` table:

- exact dedup — see aggregate.dedup_exact (hash groupBy)
- MinHash + LSH (:func:`minhash_signature`, :func:`lsh_pairs`) —
  shingle → minhash → band → bucket-join
- SimHash (:func:`simhash`) — bit-vote fingerprint; equal fingerprints ≙
  near-dup cluster, hamming ≤ t via :func:`simhash_pairs`
- n-gram Jaccard (:func:`jaccard_pairs`) — blocked exact Jaccard

Design for determinism + oracle parity: every hash is derived from
``md5`` hex (first 15 hex chars → 60-bit int), NOT from Spark's
``xxhash64``, because md5 exists bit-identically in DuckDB/ANSI SQL —
the driver's value-hash correctness gate then applies to these
approximate operators too, not just a rows-only check.

Scale notes (the whole point of LSH): candidate generation is
``explode(bands) → groupBy(band bucket)`` — shuffle volume O(docs × n_bands),
never the O(docs²) cross join. Hot buckets (boilerplate-heavy corpora)
are bounded by ``max_bucket`` (drop degenerate buckets, standard practice)
so no reducer sees a quadratic blowup. The final verify step joins only
candidate pairs. The reference has nothing comparable — NiFi's
DeduplicateRecord (reference .../standard/DeduplicateRecord.java:87-132)
is exact-key only (HashSet or BloomFilter on one node).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _guard_internal(df: DataFrame, names: list[str], op: str) -> None:
    """Raise when an input column collides with an operator's internal
    temp names — a silent collision would corrupt the join/routing (same
    guard style as jaccard_pairs' block_cols validation)."""
    clash = [c for c in names if c in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input columns {clash} collide with internal temp "
            f"names; rename them before calling"
        )


def md5_long(col: Column) -> Column:
    """60-bit deterministic hash: first 15 hex chars of md5 → bigint.

    Oracle equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# Universal-hash family for MinHash: h_i(s) = (a_i*hi(s) + b_i*lo(s) + i) mod P
# where hi/lo split md5_long(s) into 30-bit halves. One md5 per shingle
# instead of n_hashes md5s (16x fewer string hashes + radix conversions),
# and every product stays < 2^58 — no 64-bit overflow, so DuckDB computes
# bit-identical values. Constants are fixed md5-derived 28-bit odd numbers.
MINHASH_PRIME = (1 << 61) - 1
_LO_MASK = (1 << 30) - 1


def _mh_const(tag: str, i: int) -> int:
    import hashlib

    return int(hashlib.md5(f"mh-{tag}-{i}".encode()).hexdigest()[:7], 16) | 1


MINHASH_AB = [(_mh_const("a", i), _mh_const("b", i)) for i in range(64)]


def shingles(text_col: Column, n: int = 3) -> Column:
    """Token n-gram shingles (space-joined), distinct.

    Documents shorter than n tokens yield their whole text as the single
    shingle (so they still participate).
    """
    toks = F.split(F.trim(text_col), r"\s+")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(grams)


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_n: int = 3,
    out_col: str = "sig",
) -> DataFrame:
    """MinHash signature: sig[i] = min over shingles of h_i(shingle).

    h_i(s) = (a_i*hi + b_i*lo + i) mod P over the 30-bit halves of
    md5_long(s) — one md5 per shingle, then n_hashes affine hashes; fully
    JVM-side (whole-stage codegen over array HOFs; no UDF, no shuffle).

    The shingle-hash array is materialized as its own projection before
    the n_hashes min-folds: Catalyst does NOT common-subexpression-
    eliminate a higher-order-function tree inlined n_hashes times, so the
    single-expression form recomputes md5-per-shingle 16× (measured 6×
    slower at sf0.1). CollapseProject keeps the split because the array
    is non-cheap and referenced n_hashes times.
    """
    _guard_internal(df, ["_mh_hs"], "minhash_signature")
    hs = F.transform(shingles(F.col(text_col), shingle_n), lambda s: md5_long(s))

    def hash_i(i: int):
        # NOTE: must be a 1-arg lambda — pyspark passes the array index as a
        # second Column argument to 2-arg lambdas, shadowing any default.
        a, b = MINHASH_AB[i]
        return lambda h: F.pmod(
            F.lit(a) * F.shiftright(h, 30)
            + F.lit(b) * h.bitwiseAND(F.lit(_LO_MASK))
            + F.lit(i),
            F.lit(MINHASH_PRIME),
        )

    # Deliberately UNROLLED (one min-fold per slot), unlike the 2D-literal
    # transform collapse used for PQ/IVF/LSH constants: folding the slots
    # into one outer transform leaves `_mh_hs` with a single lexical
    # reference, so CollapseProject inlines the md5-per-shingle projection
    # INTO the lambda and it re-evaluates per slot — measured 10× slower
    # (the exact regression the materialized hash array exists to avoid).
    # The n_hashes constants here are scalars, not dim-sized trees, so the
    # unrolled plan is small anyway.
    sig = F.array(
        *[F.array_min(F.transform(F.col("_mh_hs"), hash_i(i))) for i in range(n_hashes)]
    )
    return df.withColumn("_mh_hs", hs).withColumn(out_col, sig).drop("_mh_hs")


def band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    n_bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """One row per (doc, LSH band): ``(id_col, band, bhash)``.

    band hash = md5 of the comma-joined signature slice — the exploded
    bucketing shape shared by :func:`lsh_pairs` (batch self-join) and
    dedup_incremental.LshIndex (the persisted probe-side index).
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(sig_col)[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bhash"),
            )
            for b in range(n_bands)
        ]
    )
    return df.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash")
    )


def verify_jaccard_pairs(
    cand: DataFrame, sh: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against per-doc
    distinct hashed-shingle arrays ``sh = (id_col, _sh)``.

    Shared by :func:`minhash_dedup_pairs` and dedup_incremental.LshIndex:
    length-bound prune, one array_intersect per surviving pair
    (|A∪B| = |A|+|B|−|A∩B| — no second set build), jaccard >= threshold.
    """
    return (
        cand.join(
            sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "sh_a"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "sh_b"),
            "id_b",
        )
        .filter(
            (F.size("sh_a") >= F.lit(threshold) * F.size("sh_b"))
            & (F.size("sh_b") >= F.lit(threshold) * F.size("sh_a"))
        )
        .withColumn("_i", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_i") / (F.size("sh_a") + F.size("sh_b") - F.col("_i")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    n_bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """LSH candidate pairs: ids sharing ≥1 band bucket, id_a < id_b.

    band hash = md5 of the comma-joined signature slice. Buckets larger
    than ``max_bucket`` are dropped (degenerate boilerplate guard — at
    10^10 docs an unbounded bucket is a quadratic bomb; dropping it only
    loses pairs that exact-dedup already catches).
    """
    exploded = band_rows(df, id_col, sig_col, n_bands, rows_per_band)
    buckets = (
        exploded.groupBy("band", "bhash")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pairs = (
        buckets.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    return pairs


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_n: int = 3,
    n_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs verified by exact Jaccard.

    Output: (id_a, id_b, jaccard) for candidate pairs whose true shingle
    Jaccard ≥ threshold. The verify join touches only candidates — the
    LSH contract.

    The verify compares 60-bit md5 shingle hashes, not shingle strings
    (Broder-style hashed shingling): array_intersect over bigints is
    ~2.3× faster than over ~20-byte strings and the shuffled verify
    arrays shrink ~3×. The DuckDB oracle hashes with the identical md5
    recipe, so the Jaccard values match bit-for-bit by construction even
    in the (astronomically unlikely) event of a hash collision.
    """
    rows_per_band = n_hashes // n_bands
    with_sig = minhash_signature(df, text_col, n_hashes, shingle_n).withColumn(
        "_sh",
        F.array_distinct(
            F.transform(shingles(F.col(text_col), shingle_n), lambda s: md5_long(s))
        ),
    )
    cand = lsh_pairs(with_sig, id_col, "sig", n_bands, rows_per_band)
    sh = with_sig.select(F.col(id_col), F.col("_sh"))
    return verify_jaccard_pairs(cand, sh, id_col, threshold)


def simhash(
    df: DataFrame, text_col: str = "text", n_bits: int = 32, out_col: str = "simhash"
) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote of token hashes.

    bit j = 1 iff sum over tokens of (±1 by bit j of md5_long(token)) > 0.
    Near-duplicate docs (mostly shared tokens) land on equal or
    hamming-close fingerprints. All JVM-side: the token-hash array is
    materialized ONCE as its own projection (one md5 per token), then the
    n_bits per-bit vote folds reference it — the earlier single nested-SQL
    fold recomputed md5-per-token inside the per-bit lambda, n_bits× the
    hash work (see minhash_signature for the no-CSE-across-HOFs note).
    Unrolling bits Python-side also gives shiftright its required literal
    shift. Values are bit-identical (integer arithmetic, same vote order).
    """
    _guard_internal(df, ["_sh_th"], "simhash")
    th = F.transform(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: md5_long(t)
    )

    # Deliberately UNROLLED per bit (see minhash_signature's note): a
    # single outer fold over the bit index leaves `_sh_th` with one
    # lexical reference, CollapseProject inlines the md5-per-token
    # projection into the lambda, and the hashes recompute per bit —
    # measured 4× slower than this form. Per-bit constants are scalars,
    # so the unrolled plan stays small.
    def vote(j: int) -> Column:
        return F.aggregate(
            F.col("_sh_th"),
            F.lit(0).cast("long"),
            lambda v, h: v
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    fp = F.lit(0).cast("long")
    for j in range(n_bits):
        fp = fp + F.when(vote(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("_sh_th", th).withColumn(out_col, fp).drop("_sh_th")


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    max_hamming: int = 3,
    n_bits: int = 32,
    n_blocks: int = 4,
) -> DataFrame:
    """Hamming-≤t pairs via the block trick (pigeonhole: t < n_blocks ⇒
    some block of the fingerprint matches exactly → bucket join, never a
    cross join)."""
    width = n_bits // n_blocks
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftright(F.col(sim_col), b * width).bitwiseAND(F.lit(mask)).alias("bval"),
            )
            for b in range(n_blocks)
        ]
    )
    ex = df.select(id_col, sim_col, F.explode(blocks).alias("bb")).select(
        id_col, sim_col, "bb.blk", "bb.bval"
    )
    a = ex.select(
        F.col(id_col).alias("id_a"), F.col(sim_col).alias("sim_a"), "blk", "bval"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col(sim_col).alias("sim_b"), "blk", "bval"
    )
    cand = (
        a.join(b, ["blk", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: list[str] | None = None,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_block: int | None = 100_000,
    n_grid: int | None = None,
) -> DataFrame:
    """Blocked exact n-gram Jaccard pairs (the non-approximate baseline).

    ``block_cols`` are REQUIRED: they bound the quadratic term (e.g.
    ['lang']); inside a block the join is a self equi-join on the block key
    then a pairwise filter. With no natural block the operator refuses to
    run — an unbounded self-join on a documents table is the canonical
    scale-killer — and the caller must use :func:`minhash_dedup_pairs`
    (sub-quadratic by construction) instead. Blocks larger than
    ``max_block`` are dropped entirely (same degenerate-bucket guard as
    ``lsh_pairs.max_bucket``: a 10^6-doc block is a 10^12-pair bomb; such
    corpora need the LSH path, not a bigger block join).

    The pairwise verify compares 60-bit md5 shingle hashes rather than
    shingle strings (see :func:`minhash_dedup_pairs` — ~2.3× faster
    intersects, ~3× smaller shuffled arrays, oracle hashes identically).

    ``n_grid`` splits each block's pair space fragment-replicate style:
    block keys are few (5 langs ⇒ 5 shuffle partitions carry ALL the
    quadratic intersect work, however many cores exist), so side a is
    routed by a deterministic grid cell ``g(id_a) mod n_grid`` and side b
    is replicated to every cell — each (a,b) pair meets exactly once, the
    O(|block|²) verify work spreads over ``n_blocks × n_grid`` tasks, at
    an O(n_grid·N) b-side shuffle-replication cost (linear, the standard
    trade). Routing only — the pair set and values are unchanged.
    ``n_grid=None`` (default) derives the split from the data: enough
    cells that the largest block's pair count spreads at ~1M verify pairs
    per task, capped at 64 — so small fine-grained blocks pay no
    replication and a few fat blocks still parallelize.
    """
    if not block_cols:
        raise ValueError(
            "jaccard_pairs requires block_cols — an unblocked all-pairs "
            "Jaccard is quadratic in the corpus; use minhash_dedup_pairs "
            "for blockless near-dup detection"
        )
    _guard_internal(
        df, ["_grid", "_na", "_nb", "_i", "_blk_n", "sh"], "jaccard_pairs"
    )
    sh = df.select(
        F.col(id_col), *[F.col(c) for c in block_cols],
        F.array_distinct(
            F.transform(shingles(F.col(text_col), shingle_n), lambda s: md5_long(s))
        ).alias("sh"),
    )
    if max_block is not None or n_grid is None:
        # sizes over the RAW frame, not `sh`: block counts don't need the
        # shingle arrays, and the n_grid probe's collect would otherwise
        # re-run the md5 shingle transform as a second full pass
        sizes = df.groupBy(*[F.col(c) for c in block_cols]).agg(
            F.count("*").alias("_blk_n")
        )
        if n_grid is None:
            # same probe that backs the max_block guard: size the grid so
            # the biggest block's |B|²/2 candidate pairs land ~1M per task
            mx = sizes.agg(F.max("_blk_n")).collect()[0][0] or 0
            if max_block is not None:
                mx = min(mx, max_block)
            n_grid = max(1, min(64, (mx * mx // 2) // 1_000_000 + 1))
        if max_block is not None:
            sh = (
                sh.join(F.broadcast(sizes), on=block_cols)
                .filter(F.col("_blk_n") <= max_block)
                .drop("_blk_n")
            )
    a = sh.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
        F.size("sh").alias("_na"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_grid)).alias("_grid"),
    )
    b = sh.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
        F.size("sh").alias("_nb"),
        F.explode(F.sequence(F.lit(0), F.lit(n_grid - 1)).cast("array<long>")).alias(
            "_grid"
        ),
    )
    return (
        a.join(b, on=block_cols + ["_grid"], how="inner")
        .drop("_grid")
        .filter(F.col("id_a") < F.col("id_b"))
        # exact length-bound prune (ppjoin's length filter): J(A,B) ≤
        # min/max of the set sizes, so J ≥ t needs min ≥ t·max — a
        # two-int predicate that skips the O(|A|+|B|) intersect/union for
        # the bulk of a block's pairs; results are identical
        .filter(
            (F.col("_na") >= F.lit(threshold) * F.col("_nb"))
            & (F.col("_nb") >= F.lit(threshold) * F.col("_na"))
        )
        # |A∪B| = |A|+|B|−|A∩B| for distinct arrays — halves the set work
        # (array_union costs the same hash build as the intersect); the
        # integer ratio (and so the rounded double) is unchanged
        .withColumn("_i", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
