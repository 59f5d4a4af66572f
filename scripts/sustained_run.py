"""Sustained-ingest evidence run: apply a 64M-event change log end-to-end
(4 micro-batches of 16M, zipf skew, schema evolution mid-stream) and append
the measured rate to BENCH/BASELINE.md. The 10^10-event design point is
this exact loop with more batches on more executors — per-batch cost is
O(delta), so the sustained rate is the number that extrapolates."""

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
