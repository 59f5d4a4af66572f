"""One-off profiler: where does CDC apply wall time go at each core count?"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _bench_log_dir  # noqa: E402
from biomedica_etl_spark.cdc.lineage import delta_partition_metrics  # noqa: E402
from biomedica_etl_spark.cdc.runner import CdcRunner, read_batch  # noqa: E402
from biomedica_etl_spark.cdc.checkpoint import planned_batches  # noqa: E402
from biomedica_etl_spark.cdc.merge import mor_apply_batch  # noqa: E402
from biomedica_etl_spark.session import get_spark  # noqa: E402

EVENTS = int(os.environ.get("EV", "8000000"))
BATCHES = int(os.environ.get("BA", "2"))
CORES = int(os.environ.get("CORES", "32"))

log = _bench_log_dir(EVENTS, BATCHES)
spark = get_spark(app_name="prof", cores=CORES, shuffle_partitions=CORES)
# warm-up job
spark.range(1000).selectExpr("sum(id)").collect()

workdir = tempfile.mkdtemp(prefix="prof-")
t_total0 = time.time()
runner = CdcRunner(spark, log, os.path.join(workdir, "t"), n_buckets=32, mode="mor",
                   compact_every=4)
t0 = time.time(); pend = runner.pending(); t_pending = time.time() - t0
schema_of = dict(planned_batches(log))
phases = []
for b in pend:
    t0 = time.time()
    changes = read_batch(spark, log, b, schema_of[b], runner.registry)
    t_read = time.time() - t0
    from biomedica_etl_spark.cdc.table import BUCKET_COL, bucket_expr
    t0 = time.time()
    stats = delta_partition_metrics(
        changes.withColumn(BUCKET_COL, bucket_expr("conv_id", 32)), b)
    t_metrics = time.time() - t0
    t0 = time.time()
    snap = mor_apply_batch(spark, runner.table, changes, b,
                           lineage_dir=runner.lineage_dir)
    t_apply = time.time() - t0
    phases.append({"batch": b, "plan_read": round(t_read, 2),
                   "metrics_job": round(t_metrics, 2),
                   "apply(dup metrics+reduce+write+commit)": round(t_apply, 2)})
total = time.time() - t_total0
print(json.dumps({"cores": CORES, "events": EVENTS, "pending_antijoin": round(t_pending, 2),
                  "phases": phases, "total": round(total, 2)}, indent=1))
spark.stop()
shutil.rmtree(workdir, ignore_errors=True)
