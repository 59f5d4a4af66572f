"""Benchmark harness.

Default mode (what the driver runs): headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the CDC engine's end-to-end apply
throughput on a deterministic synthetic change log. Prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": 0.1, "cdc_events_per_sec": ...}

``--scaling`` mode: runs the identical CDC apply job at local[8] and
local[32] on the identical log and writes throughput + scaling efficiency
to BENCH/BASELINE.md (the sandbox stand-in for the north rule's N vs 4N
executor criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
from biomedica_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "4000000"))
CDC_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "8"))
CDC_MODE = os.environ.get("SPARK_GRAFT_BENCH_MODE", "mor")  # ingest-optimized path
COMPACT_EVERY = int(os.environ.get("SPARK_GRAFT_BENCH_COMPACT_EVERY", "4"))
N_BUCKETS = int(os.environ.get("SPARK_GRAFT_BENCH_BUCKETS", "32"))

HEADLINE = [
    "lww_latest_event_per_user",
    "dedup_first_seen",
    "anti_join_resume",
    "broadcast_enrich_region",
    "q1_pricing_summary",
    "q3_top_revenue",
    "offset_range_batching",
    "quality_scores",
    "minhash_lsh_candidates",
    "simhash_16",
    "cosine_topk",
    "ann_lsh_bucketed",
    "multimodal_decode",
]


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _bench_log_dir(events: int, batches: int) -> str:
    """Deterministic change log reused across runs (generation excluded
    from timed work)."""
    d = os.path.join(
        tempfile.gettempdir(), f"spark-graft-bench-log-{events}-{batches}"
    )
    if not os.path.exists(os.path.join(d, "_meta.json")):
        shutil.rmtree(d, ignore_errors=True)
        cfg = GeneratorConfig(
            n_events=events,
            batch_size=max(events // batches, 1),
            n_convs=max(events // 100, 100),
            zipf_a=1.1,
            update_frac=0.25,
            delete_frac=0.05,
            avg_text_len=160,
        )
        generate_change_log(d, cfg)
    return d


def run_cdc_apply(
    spark, workdir: str, events: int = CDC_EVENTS, batches: int = CDC_BATCHES
) -> tuple[float, int]:
    """Apply the full bench log; returns (seconds, events applied)."""
    from biomedica_etl_spark.cdc.runner import CdcRunner

    log = _bench_log_dir(events, batches)
    with open(os.path.join(log, "_meta.json")) as f:
        n_rows = json.load(f)["n_rows_written"]
    table_root = os.path.join(workdir, "table")
    shutil.rmtree(table_root, ignore_errors=True)
    runner = CdcRunner(spark, log, table_root, n_buckets=N_BUCKETS,
                       mode=CDC_MODE, compact_every=COMPACT_EVERY)
    t0 = time.time()
    runner.run()
    return time.time() - t0, n_rows


def run_headline(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm the JVM/codegen path once, outside timed work
    qs["q1_pricing_summary"](spark, SF_DIR).collect()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    if "--scaling" in sys.argv:
        return scaling_main()
    spark = get_spark(app_name="bench", cores=CPUS, shuffle_partitions=CPUS)
    workdir = tempfile.mkdtemp(prefix="bench-")
    queries = run_headline(spark)
    cdc_sec, cdc_events = run_cdc_apply(spark, workdir)
    queries["cdc_apply_end_to_end"] = round(cdc_sec, 3)
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_cdc_apply_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": _sf_from_dir(SF_DIR),
                "cdc_events": cdc_events,
                "cdc_events_per_sec": round(cdc_events / cdc_sec, 1),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


SCALING_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALING_EVENTS", "8000000"))
SCALING_BATCHES = int(os.environ.get("SPARK_GRAFT_SCALING_BATCHES", "2"))
SCALING_REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))


def _steal_ticks() -> int:
    """CPU ticks stolen by the hypervisor (this sandbox VM is throttled in
    bursts; a run with high steal measures the host, not the engine)."""
    try:
        return int(open("/proc/stat").readline().split()[8])
    except Exception:  # noqa: BLE001
        return 0


def scaling_main() -> None:
    """Same job, same input, two parallelism levels -> BENCH/BASELINE.md.

    Uses larger micro-batches than the default bench so per-core compute
    (scan + LWW shuffle + write) dominates the constant driver-side commit
    cost — matching the regime the north rule targets (>=10^7-event batches
    at 10^10 scale)."""
    results = {}
    workdir = tempfile.mkdtemp(prefix="bench-scaling-")
    # best-of-N per configuration: the sandbox VM suffers bursty hypervisor
    # CPU steal, so the minimum wall time is the engine's number; steal% is
    # recorded per attempt for honesty
    for cores in (8, 32):
        attempts = []
        for i in range(SCALING_REPEATS):
            spark = get_spark(app_name=f"bench-scaling-{cores}-{i}", cores=cores,
                              shuffle_partitions=cores)
            s0 = _steal_ticks()
            sec, events = run_cdc_apply(spark, os.path.join(workdir, f"{cores}-{i}"),
                                        events=SCALING_EVENTS, batches=SCALING_BATCHES)
            steal_pct = (_steal_ticks() - s0) / max(sec * 100 * 32, 1) * 100
            spark.stop()
            attempts.append({"sec": round(sec, 2), "steal_pct": round(steal_pct, 1)})
            print(f"local[{cores}] try{i}: {sec:.1f}s steal={steal_pct:.1f}%",
                  file=sys.stderr)
        best = min(a["sec"] for a in attempts)
        results[cores] = {
            "sec": best,
            "events_per_sec": round(events / best, 1),
            "attempts": attempts,
        }
    speedup = results[8]["sec"] / results[32]["sec"]
    efficiency = speedup / 4
    md = f"""# BENCH baseline — CDC apply throughput + scaling

Job: full micro-batch apply loop (read batch -> schema align -> LWW reduce ->
COW merge -> exactly-once commit) of a deterministic synthetic change log.
Input: {SCALING_EVENTS:,} change events ({SCALING_BATCHES} micro-batches, zipf-skewed
conversations, 25% updates / 5% deletes, {N_BUCKETS} table buckets),
identical bytes at both parallelism levels. Generation excluded from timing.

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster in this sandbox, so evidenced at two local
parallelism levels on identical input (local[8] vs local[32], 32 physical
cores), per the driver instructions.

| parallelism | wall sec | events/sec |
|---|---|---|
| local[8]  | {results[8]["sec"]} | {results[8]["events_per_sec"]:,} |
| local[32] | {results[32]["sec"]} | {results[32]["events_per_sec"]:,} |

- speedup 8->32 cores (4x resources): **{speedup:.2f}x**
- scaling efficiency = speedup / 4 = **{efficiency:.2f}**
- per-attempt walls (best-of-{SCALING_REPEATS}; this VM sees bursty
  hypervisor CPU steal, recorded per attempt):
  local[8] {results[8]["attempts"]}, local[32] {results[32]["attempts"]}

Notes: single-JVM local mode understates scaling vs a real 4x-executor
cluster (shared driver, GC, page cache, and Python driver loop are
constant-cost at both sizes; shuffle is in-process). Per-batch driver
overhead (~3 Spark jobs/commit) amortizes with batch size; at the
target 10^10-event scale batches are >=10^7 events and the loop is
I/O-bound on the scan + one key shuffle.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"metric": "cdc_scaling_efficiency", "value": efficiency,
                      "unit": "ratio", "detail": results}))


if __name__ == "__main__":
    main()
