"""Training-data curation operators (operators/traindata.py) and
incremental MV maintenance (operators/mv.py).

Each operator is checked against an independent pandas recomputation
(the oracle-parity check vs DuckDB additionally runs for the queries()
entries in test_entry.py); plan-shape assertions pin the scale
contracts (broadcast benchmark join, one-exchange stratified window).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nifi_spark.operators.traindata import (
    decontaminate,
    domain_mix,
    pack_sequences,
    pack_stats,
    quality_funnel,
    sample_stratified,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox sleeps all day long", "en"),
    (2, "completely unrelated text about spark engines", "en"),
    (3, "der schnelle braune fuchs springt", "de"),
    (4, "le renard brun rapide saute", "fr"),
    (5, "a b", "en"),
    (6, "der schnelle braune fuchs schlaeft", "de"),
    (7, "the lazy dog naps under the tree", "en"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _py_shingles(text, n=3):
    toks = text.strip().split()
    if len(toks) <= n:
        grams = [" ".join(toks)] if len(toks) < n else [" ".join(toks)]
    grams = [" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))]
    return set(grams)


def _md5_rank(tag, v):
    return hashlib.md5(f"{tag}|{v}".encode()).hexdigest()


# --------------------------------------------------------------------------
# decontaminate
# --------------------------------------------------------------------------

def test_decontaminate_matches_python_recompute(spark, docs):
    bench = docs.filter(F.col("doc_id") == 0).select("text")
    out = decontaminate(docs, bench, shingle_n=3, min_hits=2).toPandas()
    bench_sh = _py_shingles(DOCS[0][1])
    expect = {
        d: len(_py_shingles(t) & bench_sh) for d, t, _ in DOCS
    }
    got = dict(zip(out.doc_id, out.n_hits))
    assert got == expect
    # containment = hits / distinct shingles of the doc
    for _, r in out.iterrows():
        n_sh = len(_py_shingles(DOCS[int(r.doc_id)][1]))
        assert abs(r.containment - round(r.n_hits / n_sh, 6)) < 1e-9
    flagged = set(out[out.contaminated].doc_id)
    assert flagged == {d for d, n in expect.items() if n >= 2}
    # every input doc present exactly once, clean docs carry n_hits=0
    assert sorted(out.doc_id) == [d for d, _, _ in DOCS]


def test_decontaminate_broadcasts_benchmark(spark, docs):
    bench = docs.filter(F.col("doc_id") == 0).select("text")
    plan = decontaminate(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # corpus side must not be exchanged by shingle hash before the probe:
    # the only hash exchanges allowed are the final per-doc agg + left join
    shuffle_free = decontaminate(docs, bench, broadcast_bench=False)
    plan2 = shuffle_free._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan2  # fallback path still produces a valid join plan


def test_decontaminate_guards_internal_names(spark, docs):
    bad = docs.withColumn("n_hits", F.lit(1))
    with pytest.raises(ValueError, match="n_hits"):
        decontaminate(bad, docs.select("text"))


# --------------------------------------------------------------------------
# pack_sequences
# --------------------------------------------------------------------------

def test_pack_sequences_quota_rule(spark, docs):
    out = pack_sequences(docs, budget=8, group_size=100).toPandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # independent recompute: all ids in one shard (<100), next-boundary rule
    toks = {d: len(t.strip().split()) for d, t, _ in DOCS}
    cum = 0
    expect = {}
    for d in sorted(toks):
        expect[d] = cum // 8
        cum += toks[d]
    got = dict(zip(out.doc_id, out.pack_id))
    assert got == expect
    assert dict(zip(out.doc_id, out.n_tokens)) == toks


def test_pack_sequences_shards_are_independent(spark, docs):
    out = pack_sequences(docs, budget=8, group_size=4).toPandas()
    # shard 0 = ids 0..3, shard 1 = ids 4..7; pack ids disjoint across shards
    s0 = set(out[out.doc_id < 4].pack_id)
    s1 = set(out[out.doc_id >= 4].pack_id)
    assert s0.isdisjoint(s1)
    assert all(p >= 1_000_000_000 for p in s1)


def test_pack_stats_overflow_bounded_by_one_doc(spark, docs):
    packed = pack_sequences(docs, budget=8, group_size=100)
    st = pack_stats(packed).toPandas()
    det = packed.toPandas()
    for pack_id, grp in det.groupby("pack_id"):
        # quota rule: all but the final doc of a pack start strictly inside
        # the budget, so sum - last_doc_tokens < budget always
        last = grp.sort_values("doc_id").n_tokens.iloc[-1]
        assert grp.n_tokens.sum() - last < 8
    assert st.n_docs.sum() == len(DOCS)


def test_pack_sequences_validates_args(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, group_size=0)


def test_pack_greedy_never_overflows(spark, docs):
    from nifi_spark.operators.traindata import pack_greedy

    out = pack_greedy(docs, budget=8, n_shards=2).toPandas()
    assert len(out) == len(DOCS)
    for pack_id, grp in out.groupby("pack_id"):
        # the exact-greedy invariant pack_sequences trades away: a pack
        # only exceeds the budget when a SINGLE doc does
        assert grp.n_tokens.sum() <= 8 or len(grp) == 1
        assert sorted(grp.slot) == list(range(1, len(grp) + 1))


def test_pack_greedy_matches_python_recompute_and_partitioning(spark, docs):
    from nifi_spark.operators.traindata import pack_greedy

    got = {
        r.doc_id: (r.shard, r.pack_id, r.slot)
        for r in pack_greedy(docs, budget=8, n_shards=2).collect()
    }
    # independent greedy recompute over md5 shards
    toks = {d: len(t.strip().split()) for d, t, _ in DOCS}
    shard = {
        d: int(hashlib.md5(f"pack|{d}".encode()).hexdigest()[:15], 16) % 2
        for d in toks
    }
    expect = {}
    for s in (0, 1):
        running, pk, slot = 0, 0, 0
        for d in sorted(x for x in toks if shard[x] == s):
            if slot and running + toks[d] > 8:
                pk, running, slot = pk + 1, 0, 0
            running += toks[d]
            slot += 1
            expect[d] = (s, s * 1_000_000_000 + pk, slot)
    assert got == expect
    # assignment is partition-independent (md5 shard, in-shard sort)
    got7 = {
        r.doc_id: (r.shard, r.pack_id, r.slot)
        for r in pack_greedy(docs.repartition(7), budget=8, n_shards=2).collect()
    }
    assert got7 == expect


def test_pack_greedy_validates_args(spark, docs):
    from nifi_spark.operators.traindata import pack_greedy

    with pytest.raises(ValueError):
        pack_greedy(docs, budget=0)
    with pytest.raises(ValueError):
        pack_greedy(docs, n_shards=0)


# --------------------------------------------------------------------------
# sample_stratified / domain_mix
# --------------------------------------------------------------------------

def test_sample_stratified_exact_per_stratum(spark, docs):
    out = sample_stratified(docs, ["lang"], 0.5, "doc_id").toPandas()
    import math

    by_lang = {}
    for d, t, lang in DOCS:
        by_lang.setdefault(lang, []).append(d)
    for lang, ids in by_lang.items():
        want_n = math.ceil(len(ids) * 0.5)
        keep = sorted(ids, key=lambda d: (_md5_rank("strat", d), d))[:want_n]
        got = sorted(out[out.lang == lang].doc_id)
        assert got == sorted(keep), lang


def test_sample_stratified_single_exchange(spark, docs):
    plan = (
        sample_stratified(docs, ["lang"], 0.5, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows share one hashpartitioning(lang) exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_domain_mix_hits_target_mixture(spark, docs):
    # en:4 docs per unit weight is scarcest? avail: en=5, de=2, fr=1
    weights = {"en": 0.5, "de": 0.25, "fr": 0.25}
    out = domain_mix(docs, "lang", weights, "doc_id").toPandas()
    # T = min(5/.5, 2/.25, 1/.25) = min(10, 8, 4) = 4
    want = {"en": int(4 * 0.5), "de": int(4 * 0.25), "fr": int(4 * 0.25)}
    got = out.groupby("lang").size().to_dict()
    assert got == want
    # selected rows are the smallest-md5-rank ones per domain
    for lang, n in want.items():
        ids = [d for d, _, lg in DOCS if lg == lang]
        keep = sorted(ids, key=lambda d: (_md5_rank("mix", d), d))[:n]
        assert sorted(out[out.lang == lang].doc_id) == sorted(keep)


def test_domain_mix_drops_unweighted_domains(spark, docs):
    out = domain_mix(docs, "lang", {"de": 1.0}, "doc_id").toPandas()
    assert set(out.lang) == {"de"}
    with pytest.raises(ValueError):
        domain_mix(docs, "lang", {}, "doc_id")
    with pytest.raises(ValueError):
        domain_mix(docs, "lang", {"en": -1.0}, "doc_id")


# --------------------------------------------------------------------------
# quality_funnel
# --------------------------------------------------------------------------

def test_quality_funnel_monotone_and_total(spark, docs):
    out = quality_funnel(docs).toPandas().sort_values("stage_idx")
    assert list(out.stage) == ["total", "len", "alpha", "quality"]
    ns = list(out.n_rows)
    assert ns[0] == len(DOCS)
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    # stage 1 recompute: docs with >= 5 whitespace tokens
    assert ns[1] == sum(1 for _, t, _ in DOCS if len(t.split()) >= 5)


# --------------------------------------------------------------------------
# scale-path variants: sparse decontamination output, threshold sampling
# --------------------------------------------------------------------------

def test_decontaminate_sparse_output_matches_dense(spark, docs):
    from pyspark.sql import functions as F

    bench = docs.filter(F.col("doc_id") == 0).select("text")
    dense = decontaminate(docs, bench, min_hits=2).toPandas()
    sparse = decontaminate(docs, bench, min_hits=2, include_clean=False).toPandas()
    # sparse = exactly the dense rows with >= 1 hit
    want = dense[dense.n_hits > 0].sort_values("doc_id").reset_index(drop=True)
    got = sparse.sort_values("doc_id").reset_index(drop=True)
    assert got.to_dict("records") == want.to_dict("records")


def test_sample_hash_threshold_deterministic_and_mapside(spark, docs):
    from nifi_spark.operators.dedup_fuzzy import md5_long as _  # noqa: F401
    from nifi_spark.operators.traindata import sample_hash_threshold

    a = sample_hash_threshold(docs, "doc_id", fraction=0.5).toPandas()
    b = sample_hash_threshold(docs, "doc_id", fraction=0.5).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    # independent recompute of the keep decision
    import hashlib

    keep = {
        d for d, _, _ in DOCS
        if int(hashlib.md5(f"thr|{d}".encode()).hexdigest()[:15], 16) < (1 << 59)
    }
    assert set(a.doc_id) == keep
    # pure map-side: no exchange anywhere in the plan
    plan = (
        sample_hash_threshold(docs, "doc_id", fraction=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_sample_hash_threshold_per_domain(spark, docs):
    import hashlib

    from nifi_spark.operators.traindata import sample_hash_threshold

    out = sample_hash_threshold(
        docs, "doc_id", domain_col="lang", fractions={"en": 1.0, "de": 0.5}
    ).toPandas()
    assert set(out.lang) <= {"en", "de"}  # fr dropped (no fraction)
    assert sorted(out[out.lang == "en"].doc_id) == sorted(
        d for d, _, lg in DOCS if lg == "en"
    )
    keep_de = {
        d for d, _, lg in DOCS if lg == "de"
        and int(hashlib.md5(f"thr|{d}".encode()).hexdigest()[:15], 16) < (1 << 59)
    }
    assert set(out[out.lang == "de"].doc_id) == keep_de
    # corpus side stays exchange-free: only a broadcast for the thresholds
    plan = (
        sample_hash_threshold(docs, "doc_id", domain_col="lang", fractions={"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_sample_hash_threshold_validates_args(spark, docs):
    from nifi_spark.operators.traindata import sample_hash_threshold

    with pytest.raises(ValueError):
        sample_hash_threshold(docs, "doc_id")
    with pytest.raises(ValueError):
        sample_hash_threshold(docs, "doc_id", fraction=0.5, fractions={"en": 0.5})
    with pytest.raises(ValueError):
        sample_hash_threshold(docs, "doc_id", fraction=1.5)
    with pytest.raises(ValueError):
        sample_hash_threshold(docs, "doc_id", fractions={"en": 0.5})


# --------------------------------------------------------------------------
# bloom decontamination (benchmark too large to broadcast exactly)
# --------------------------------------------------------------------------

def _py_md5_long(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_bloom_pos(k, n_bits, n_hashes=5):
    h1 = _py_md5_long(k)
    h2 = _py_md5_long("b2|" + k)
    return {(h1 + i * h2) % n_bits for i in range(n_hashes)}


def test_decontaminate_bloom_matches_python_recompute(spark, docs):
    from nifi_spark.operators.traindata import decontaminate_bloom

    n_bits = 1 << 10  # small filter to force some false positives
    bench = docs.filter(F.col("doc_id") == 0).select("text")
    out = decontaminate_bloom(docs, bench, min_hits=2, n_bits=n_bits).toPandas()

    bench_keys = {str(_py_md5_long(s)) for s in _py_shingles(DOCS[0][1])}
    bits = set().union(*(_py_bloom_pos(k, n_bits) for k in bench_keys))
    expect = {}
    for d, t, _ in DOCS:
        keys = {str(_py_md5_long(s)) for s in _py_shingles(t)}
        n = sum(1 for k in keys if _py_bloom_pos(k, n_bits) <= bits)
        if n:
            expect[d] = n
    assert dict(zip(out.doc_id, out.n_hits)) == expect
    assert set(out[out.contaminated].doc_id) == {
        d for d, n in expect.items() if n >= 2
    }


def test_decontaminate_bloom_never_false_negative(spark, docs):
    from nifi_spark.operators.traindata import decontaminate, decontaminate_bloom

    bench = docs.filter(F.col("doc_id") == 0).select("text")
    exact = decontaminate(docs, bench, min_hits=1).toPandas()
    bloom = decontaminate_bloom(docs, bench, min_hits=1, n_bits=1 << 10).toPandas()
    b = dict(zip(bloom.doc_id, bloom.n_hits))
    for _, r in exact.iterrows():
        if r.n_hits > 0:
            assert b.get(r.doc_id, 0) >= r.n_hits  # superset, never below


def test_pack_greedy_single_exchange(spark, docs):
    from nifi_spark.operators.traindata import pack_greedy

    plan = (
        pack_greedy(docs, budget=8, n_shards=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash exchange on the shard key feeds the grouped Arrow pass
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan or "MapGroups" in plan
