"""Sustained-ingest evidence run: apply a 64M-event change log end-to-end
(4 micro-batches of 16M, zipf skew, schema evolution mid-stream) and append
the measured rate to BENCH/BASELINE.md. The 10^10-event design point is
this exact loop with more batches on more executors — per-batch cost is
O(delta), so the sustained rate is the number that extrapolates.

``--flat`` mode: apply a 64-micro-batch log one batch at a time and fit a
line to the per-batch wall times. Round 1's metadata path re-read every
snapshot manifest per batch (O(B²) over a run); with the incremental cache
the fit's slope must be ~0 — per-batch driver overhead independent of how
many batches precede it. Results go to BENCH/SUSTAINED.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from biomedica_etl_spark.session import get_spark  # noqa: E402

EVENTS = int(os.environ.get("EV", "64000000"))
BATCHES = int(os.environ.get("BA", "4"))
CORES = int(os.environ.get("CORES", "16"))
FLAT_BATCHES = int(os.environ.get("FLAT_BATCHES", "64"))
FLAT_EVENTS = int(os.environ.get("FLAT_EVENTS", "6400000"))


def flat_overhead_main() -> None:
    """Per-batch wall flatness over ≥64 micro-batches (same session, same
    batch size — any O(completed-batches) driver cost shows as slope)."""
    from biomedica_etl_spark.cdc.runner import CdcRunner

    bench._use_tmpfs_local_dirs()
    spark = get_spark(app_name="flat-overhead", cores=CORES,
                      shuffle_partitions=CORES)
    workdir = tempfile.mkdtemp(prefix="flat-", dir="/dev/shm")
    bench.run_cdc_apply(spark, os.path.join(workdir, "warm"),
                        events=bench.WARMUP_EVENTS, batches=2)
    log = bench._bench_log_dir(FLAT_EVENTS, FLAT_BATCHES)
    runner = CdcRunner(spark, log, os.path.join(workdir, "table"),
                       n_buckets=bench.N_BUCKETS, mode="mor",
                       compact_every=1_000_000_000,
                       shuffle_salts=bench.SHUFFLE_SALTS, async_lineage=True)
    per_batch: list[float] = []
    for _ in range(FLAT_BATCHES):
        t0 = time.time()
        res = runner.run(max_batches=1)
        per_batch.append(time.time() - t0)
        if not res.batches_applied:
            break
    n = len(per_batch)
    xs = list(range(n))
    mx, my = sum(xs) / n, sum(per_batch) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, per_batch)) / max(
        sum((x - mx) ** 2 for x in xs), 1e-9)
    first, second = per_batch[: n // 2], per_batch[n // 2:]
    out = {
        "metric": "per_batch_wall_flatness",
        "batches": n,
        "events_per_batch": FLAT_EVENTS // FLAT_BATCHES,
        "cores": CORES,
        "mean_sec": round(my, 3),
        "slope_ms_per_batch": round(slope * 1000, 2),
        "first_half_mean": round(sum(first) / len(first), 3),
        "second_half_mean": round(sum(second) / len(second), 3),
        "per_batch_sec": [round(s, 3) for s in per_batch],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SUSTAINED.md", "a") as f:
        f.write(
            f"\n## Per-batch driver-overhead flatness ({n} micro-batches, "
            f"local[{CORES}])\n\n"
            f"Each batch is identical ({out['events_per_batch']:,} events), so "
            f"any cost that grows with the number of COMPLETED batches (the "
            f"round-1 O(B²) manifest re-scan) would appear as a positive "
            f"slope.\n\n"
            f"- mean per-batch wall: {out['mean_sec']} s\n"
            f"- linear fit slope: {out['slope_ms_per_batch']} ms/batch\n"
            f"- first-half mean {out['first_half_mean']} s vs second-half "
            f"mean {out['second_half_mean']} s\n"
        )
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


if "--flat" in sys.argv:
    flat_overhead_main()
    raise SystemExit(0)

bench._use_tmpfs_local_dirs()
spark = get_spark(app_name="sustained", cores=CORES, shuffle_partitions=CORES)
workdir = tempfile.mkdtemp(prefix="sustained-", dir="/dev/shm")
bench.run_cdc_apply(spark, os.path.join(workdir, "warm"),
                    events=bench.WARMUP_EVENTS, batches=2)
sec, events, runner = bench.run_cdc_apply(
    spark, workdir, events=EVENTS, batches=BATCHES, compact_every=1_000_000_000
)
rate = events / sec
live = runner.table.read(spark).count()
t0 = time.time()
from biomedica_etl_spark.cdc.merge import compact  # noqa: E402

compact(spark, runner.table, shuffle_salts=bench.SHUFFLE_SALTS)
compact_sec = time.time() - t0
out = {
    "events": events, "batches": BATCHES, "cores": CORES,
    "apply_sec": round(sec, 1), "events_per_sec": round(rate, 1),
    "live_rows": live, "compact_sec": round(compact_sec, 1),
    "sustained_incl_compact": round(events / (sec + compact_sec), 1),
}
print(json.dumps(out))
spark.stop()
shutil.rmtree(workdir, ignore_errors=True)
