"""Prototype: single-shuffle bucket-aligned LWW reduce + write vs current plan."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _bench_log_dir  # noqa: E402
from biomedica_etl_spark.cdc.checkpoint import planned_batches  # noqa: E402
from biomedica_etl_spark.cdc.reduce import lww_reduce  # noqa: E402
from biomedica_etl_spark.cdc.runner import read_batch  # noqa: E402
from biomedica_etl_spark.cdc.schema import CHANGE_COLS, KEY_COLS, SchemaRegistry  # noqa: E402
from biomedica_etl_spark.cdc.table import BUCKET_COL, bucket_expr  # noqa: E402
from biomedica_etl_spark.session import get_spark  # noqa: E402

CORES = int(os.environ.get("CORES", "32"))
spark = get_spark(app_name="prof3", cores=CORES, shuffle_partitions=CORES)

log = _bench_log_dir(8_000_000, 2)
reg = SchemaRegistry()
SCHEMA_OF = dict(planned_batches(log))
changes = read_batch(spark, log, 0, SCHEMA_OF[0], reg)
VALUE_COLS = [c for c in CHANGE_COLS if c not in KEY_COLS]

# warm-up: tiny versions of both plans (JIT/codegen/committer warm)
tiny = changes.limit(10_000)
tiny_red = lww_reduce(tiny).withColumn(BUCKET_COL, bucket_expr("conv_id", 32))
d0 = tempfile.mkdtemp(prefix="warm-")
tiny_red.repartition(2, F.col(BUCKET_COL)).write.mode("overwrite").partitionBy(
    BUCKET_COL).parquet(d0)


def aligned(df, n_buckets):
    b = df.select(*CHANGE_COLS).withColumn(BUCKET_COL, bucket_expr("conv_id", n_buckets))
    shuffled = b.repartition(n_buckets, F.col(BUCKET_COL))
    agg = shuffled.groupBy(BUCKET_COL, *KEY_COLS).agg(
        F.max_by(F.struct(*VALUE_COLS), F.col("lsn")).alias("_w"))
    return agg.select(BUCKET_COL, *KEY_COLS,
                      *[F.col(f"_w.{c}").alias(c) for c in VALUE_COLS])


al = aligned(changes, 32)
n_ex = al._jdf.queryExecution().executedPlan().toString().count("Exchange")
print("aligned plan exchanges (expect 1):",
      aligned(changes, 32).explain("formatted") or "", flush=True)

for rep in (1, 2):
    d1 = tempfile.mkdtemp(prefix="cur-")
    t0 = time.time()
    red = lww_reduce(changes).withColumn(BUCKET_COL, bucket_expr("conv_id", 32))
    red.repartition(32, F.col(BUCKET_COL)).write.mode("overwrite").partitionBy(
        BUCKET_COL).parquet(d1)
    print(f"pass{rep} CURRENT two-shuffle : {time.time()-t0:6.2f}s", flush=True)

    d2 = tempfile.mkdtemp(prefix="ali-")
    t0 = time.time()
    aligned(changes, 32).write.mode("overwrite").partitionBy(BUCKET_COL).parquet(d2)
    print(f"pass{rep} ALIGNED one-shuffle : {time.time()-t0:6.2f}s", flush=True)
    nf = sum(len(files) for _, _, files in os.walk(d2))
    print("  aligned files written:", nf, flush=True)
spark.stop()
