"""Component-wise timing of the MOR apply path on one 4M-event batch."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _bench_log_dir  # noqa: E402
from biomedica_etl_spark.cdc.reduce import lww_reduce  # noqa: E402
from biomedica_etl_spark.cdc.runner import read_batch  # noqa: E402
from biomedica_etl_spark.cdc.schema import SchemaRegistry  # noqa: E402
from biomedica_etl_spark.cdc.table import BUCKET_COL, bucket_expr  # noqa: E402
from biomedica_etl_spark.session import get_spark  # noqa: E402

CORES = int(os.environ.get("CORES", "32"))
spark = get_spark(app_name="prof2", cores=CORES, shuffle_partitions=CORES)
spark.range(1000).selectExpr("sum(id)").collect()

log = _bench_log_dir(8_000_000, 2)
reg = SchemaRegistry()
from biomedica_etl_spark.cdc.checkpoint import planned_batches  # noqa: E402
SCHEMA_OF = dict(planned_batches(log))


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label:45s} {time.time()-t0:7.2f}s", flush=True)
    return r


for rep in (1, 2):
    print(f"--- pass {rep} ---")
    changes = read_batch(spark, log, 0, SCHEMA_OF[0], reg)
    t("scan+count(*)", lambda: changes.count())
    t("scan all cols (sum length)", lambda: changes.select(
        F.sum(F.length("text")), F.max("lsn")).collect())
    red = lww_reduce(changes).withColumn(BUCKET_COL, bucket_expr("conv_id", 32))
    t("reduce only (count)", lambda: red.count())
    d1 = tempfile.mkdtemp(prefix="w1-")
    t("reduce+write flat (no partitionBy)", lambda: red.write.mode(
        "overwrite").parquet(d1))
    d2 = tempfile.mkdtemp(prefix="w2-")
    t("reduce+repart(32,bucket)+write partitionBy", lambda: red.repartition(
        32, F.col(BUCKET_COL)).write.mode("overwrite").partitionBy(
        BUCKET_COL).parquet(d2))
spark.stop()
