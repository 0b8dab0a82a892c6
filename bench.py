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
WORKER_TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_BENCH_WORKER_TIMEOUT", "900"))
# Scaling levels: N vs 4N cores INSIDE the physical-core range. The host
# exposes 32 SMT threads over ~16 physical cores; higher pairs conflate
# SMT contention + frequency scaling with strong scaling (parallel-burn
# calibration: eff 0.80 at 16 procs, 0.56 at 32), so the 4x pair is 2 vs 8.
CORES_LO = max(int(os.environ.get("SPARK_GRAFT_BENCH_CORES_LO", "2")), 1)
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
    "embedding_cosine_topk",
    "doc_fingerprint",
    "quality_score",
    "multimodal_decode",
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
    """One parallelism level: warmup + 1 timed CDC apply trial.

    The timed pipeline is the full apply path: JSON payload normalization
    (when the feed carries payload_json — the faithful binlog shape) →
    in-bucket LWW fold → merge commit, all in the single bucket shuffle
    (laketable.merge_events "one-shuffle physical plan"). Bucket count and
    shuffle partitions are FIXED across parallelism levels so the physical
    plan is identical and only core count varies.
    """
    from nifi_spark.normalize import normalize_json
    from nifi_spark.schema import KEY_COLS
    from nifi_spark.session import get_spark
    from nifi_spark.sinks.laketable import LakeTable

    spark = get_spark(
        f"bench_cdc_{cores}", cores=cores, shuffle_partitions=SHUFFLE_PARTS
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
    # a fraction of the full-run cost (the timed trial is the full feed)
    apply_once(ev.sample(fraction=0.25, seed=1))
    best = apply_once(ev)
    print(json.dumps({"cores": cores, "n_events": n, "wall_sec": round(best, 3),
                      "events_per_sec": round(n / best)}))


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


def _run_worker(cores: int) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
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


def _scaling_runs(budget_s: float = 1100.0) -> tuple[dict | None, dict | None]:
    """Interleave lo/hi trials so host-load noise hits both levels; keep
    the best (min wall) result per level.

    Robust to throttling windows: a level with ZERO completed trials is
    retried past the soft budget (a missing level means no efficiency
    headline at all — worth the extra wall time); once both levels have
    two completed trials the loop exits early."""
    best = {CORES_LO: None, CORES_HI: None}
    counts = {CORES_LO: 0, CORES_HI: 0}
    t0 = time.time()
    for cores in (CORES_LO, CORES_HI, CORES_LO, CORES_HI, CORES_LO, CORES_HI):
        if counts[cores] >= 2:
            continue
        if (time.time() - t0) > budget_s and best[cores] is not None:
            continue  # budget spent: only chase levels still missing a result
        # bracket the trial with calibration burns: the mean measures the
        # host's permitted parallelism in the same throttle window
        b0 = _burn_wall(cores)
        r = _run_worker(cores)
        b1 = _burn_wall(cores)
        if r:
            r["burn_wall"] = round((b0 + b1) / 2, 3)
            counts[cores] += 1
            if best[cores] is None or r["wall_sec"] < best[cores]["wall_sec"]:
                best[cores] = r
    return best[CORES_LO], best[CORES_HI]


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
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()
    return timings


def _calib_section(cdc: dict) -> str:
    if "host_parallel_eff" not in cdc:
        return ""
    ratio = cdc["cores_hi"] // cdc["cores_lo"]
    return f"""
Host-parallelism calibration (BASELINE.md §C.5): an embarrassingly-parallel
arithmetic burn bracketing each timed trial ran in {cdc['burn_wall_lo']} s at
{cdc['cores_lo']} procs vs {cdc['burn_wall_hi']} s at {cdc['cores_hi']} procs — i.e. in this
window the host permitted **{cdc['host_parallel_eff']}** of the ideal {ratio}× parallel
speedup (1.0 = unthrottled). Engine scaling normalized by that ceiling:
**{cdc['scaling_efficiency_normalized']}**. The normalized figure is the
cluster-transferable one — on real N vs 4N executors the ceiling is 1.0.
"""


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
Host caveat: the sandbox VM throttles CPU unpredictably (single-thread
benchmark varies 3-10x between runs at 0% steal/0% iowait); trials are
interleaved across parallelism levels and min-wall is reported per level.

## CDC apply throughput at two parallelism levels

Same physical input ({FEED_DIR}), fresh JVM per level, warmup excluded,
best of 2 trials. "Cluster of N vs 4N executors" is evidenced as
local[{cdc['cores_lo']}] vs local[{cdc['cores_hi']}] per the sandbox protocol.

| cores | wall s | events/s |
|---|---|---|
| {cdc['cores_lo']} | {cdc['wall_sec_lo']} | {cdc['events_per_sec_lo']:,} |
| {cdc['cores_hi']} | {cdc['wall_sec_hi']} | {cdc['events_per_sec_hi']:,} |

**Scaling efficiency** = (evps_hi / evps_lo) / ({cdc['cores_hi']}/{cdc['cores_lo']})
= **{cdc['scaling_efficiency']}** (target ≥ 0.8).
{_calib_section(cdc)}
Command lines:

```
python bench.py --cdc-worker {cdc['cores_lo']} {FEED_DIR}
python bench.py --cdc-worker {cdc['cores_hi']} {FEED_DIR}
```

## Headline query timings (sf_dir = {SF_DIR}, local[{CPUS}], warm)

| query | sec |
|---|---|
{qlines}

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

    import pyspark

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    ensure_feed()
    queries = time_queries()
    lo, hi = _scaling_runs()
    cdc: dict = {"cores_lo": CORES_LO, "cores_hi": CORES_HI}
    if lo and hi:
        eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (CORES_HI / CORES_LO)
        cdc.update(
            n_events=hi["n_events"],
            wall_sec_lo=lo["wall_sec"], wall_sec_hi=hi["wall_sec"],
            events_per_sec_lo=lo["events_per_sec"],
            events_per_sec_hi=hi["events_per_sec"],
            scaling_efficiency=round(eff, 3),
        )
        if lo.get("burn_wall") and hi.get("burn_wall"):
            # per-proc work is identical, so the host's permitted parallel
            # speedup over the lo->hi core ratio is wall_lo / wall_hi
            host_eff = lo["burn_wall"] / hi["burn_wall"]
            cdc.update(
                burn_wall_lo=lo["burn_wall"], burn_wall_hi=hi["burn_wall"],
                host_parallel_eff=round(host_eff, 3),
                scaling_efficiency_normalized=round(eff / host_eff, 3),
            )
    result = {
        "metric": "cdc_apply_wall_sec_hi",
        "value": (hi or {}).get("wall_sec", -1.0),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "spark_version": pyspark.__version__,
        "cdc": cdc,
    }
    write_report(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
