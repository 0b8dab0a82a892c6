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
    """
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

    sig = F.array(
        *[F.array_min(F.transform(hs, hash_i(i))) for i in range(n_hashes)]
    )
    return df.withColumn(out_col, sig)


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
    exploded = df.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash")
    )
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
    """
    rows_per_band = n_hashes // n_bands
    with_sig = minhash_signature(df, text_col, n_hashes, shingle_n).withColumn(
        "_sh", shingles(F.col(text_col), shingle_n)
    )
    cand = lsh_pairs(with_sig, id_col, "sig", n_bands, rows_per_band)
    sh = with_sig.select(F.col(id_col), F.col("_sh"))
    verified = (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        # exact length-bound prune before the intersect (see jaccard_pairs)
        .filter(
            (F.size("sh_a") >= F.lit(threshold) * F.size("sh_b"))
            & (F.size("sh_b") >= F.lit(threshold) * F.size("sh_a"))
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(
    df: DataFrame, text_col: str = "text", n_bits: int = 32, out_col: str = "simhash"
) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote of token hashes.

    bit j = 1 iff sum over tokens of (±1 by bit j of md5_long(token)) > 0.
    Near-duplicate docs (mostly shared tokens) land on equal or
    hamming-close fingerprints. One SQL HOF expression (the Python DSL's
    shiftright requires a literal shift, so the nested fold over bit
    positions is written as Spark SQL — still JVM-side, still codegen'd).
    """
    fp = F.expr(
        f"""
        aggregate(
          sequence(0, {n_bits - 1}),
          cast(0 as bigint),
          (acc, j) -> acc + if(
            aggregate(
              transform(split(trim(`{text_col}`), '\\\\s+'),
                        t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)),
              cast(0 as bigint),
              (v, h) -> v + if((shiftright(h, j) & 1) = 1, 1, -1)
            ) > 0,
            shiftleft(cast(1 as bigint), j),
            cast(0 as bigint)))
        """
    )
    return df.withColumn(out_col, fp)


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
    """
    if not block_cols:
        raise ValueError(
            "jaccard_pairs requires block_cols — an unblocked all-pairs "
            "Jaccard is quadratic in the corpus; use minhash_dedup_pairs "
            "for blockless near-dup detection"
        )
    sh = df.select(
        F.col(id_col), *[F.col(c) for c in block_cols],
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    if max_block is not None:
        sizes = sh.groupBy(*block_cols).agg(F.count("*").alias("_blk_n"))
        sh = (
            sh.join(F.broadcast(sizes), on=block_cols)
            .filter(F.col("_blk_n") <= max_block)
            .drop("_blk_n")
        )
    a = sh.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
        F.size("sh").alias("_na"),
    )
    b = sh.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
        F.size("sh").alias("_nb"),
    )
    return (
        a.join(b, on=block_cols, how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        # exact length-bound prune (ppjoin's length filter): J(A,B) ≤
        # min/max of the set sizes, so J ≥ t needs min ≥ t·max — a
        # two-int predicate that skips the O(|A|+|B|) intersect/union for
        # the bulk of a block's pairs; results are identical
        .filter(
            (F.col("_na") >= F.lit(threshold) * F.col("_nb"))
            & (F.col("_nb") >= F.lit(threshold) * F.col("_na"))
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
