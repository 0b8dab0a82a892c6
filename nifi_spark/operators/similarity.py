"""Similarity search over embedding columns (`array<float>`).

Two paths, as a training-data pipeline needs at 100 TB:

- :func:`cosine_topk` — brute-force exact top-k: broadcast the query set,
  one pass over the corpus, per-query heap via window rank. Cost
  O(|corpus| × |queries|) but embarrassingly parallel and shuffle-light
  (the only shuffle is the final per-query top-k, O(queries × k) rows
  after map-side rank pruning with AQE).
- :func:`cosine_topk_lsh` — random-hyperplane LSH: deterministic
  pseudo-hyperplanes from md5 hashing, sign signature → bucket join →
  exact re-rank inside buckets. Sublinear candidate generation; the scale
  path (an IVF variant would swap the bucketer for k-means cells — same
  plumbing).

All vector math is `zip_with`/`aggregate` over array columns — JVM-side,
codegen'd, no Python. Doubles throughout; similarities rounded to 6 dp so
results are comparable across engines (the DuckDB oracle mirrors the
exact expression shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup_fuzzy import md5_long


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force, broadcast).

    Output: (query_id, neighbor_id, rank, cos_sim) — self-matches excluded.
    Ties break by neighbor id (deterministic).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _hyperplane(p: int, dim: int) -> Column:
    """Deterministic pseudo-hyperplane p: components in [-1,1) from md5.

    component d = md5_long('hp|p|d') / 2^59 - 1  (60-bit hash scaled).
    Not gaussian, but sign-LSH only needs symmetric zero-mean components.
    """
    return F.array(
        *[
            (md5_long(F.lit(f"hp|{p}|{d}")) / F.lit(float(1 << 59)) - 1.0)
            for d in range(dim)
        ]
    )


def lsh_signature(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, dim: int = 64,
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Sign signature: bit p = 1 iff dot(vec, hyperplane_p) > 0.

    n_planes is small and fixed, so the signature is an explicit per-plane
    sum of bit weights (one dot product per plane, all in one projection).
    """
    bits = []
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        d = dot(F.col(vec_col), plane)
        bits.append(F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return df.withColumn(out_col, total.cast("long"))


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the full sign signature bucket;
    exact cosine re-rank within the bucket.

    Recall tuning = fewer planes (bigger buckets) or multi-probe; at scale
    the bucket join replaces the O(n²) cross join with O(n) bucketed work.
    """
    qs = lsh_signature(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "_qv", n_planes, dim,
    )
    cs = lsh_signature(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        "_cv", n_planes, dim,
    )
    scored = (
        qs.join(cs, on="lsh_sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("_qv"), F.col("_cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
