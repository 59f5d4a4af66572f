"""Checkpoint = applied offset ranges, derived from the snapshot chain.

The reference resumes by diffing the manifest against the completed-log
(anti-join at ``src/pmc_oa/download_batch.py:279-316``, invoked by
``scripts/03_download_batch_ftp.py:35-38`` and ``scripts/04_build_json.py:51-55``).
Here: planned batches come from the change log's partition directories
(cheap listing — no data read), committed batches from snapshot manifests,
and pending = planned ANTI JOIN committed. The anti-join runs in Spark so
the same plan works when the checkpoint is a real table with 10^5+ batches.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .table import CowTable

_BATCH_RE = re.compile(r"batch_id=(\d+)$")


def planned_batches(log_dir: str) -> list[tuple[int, int]]:
    """(batch_id, schema_id) pairs present in the log, from dir listing only."""
    out: list[tuple[int, int]] = []
    for d in glob.glob(os.path.join(log_dir, "schema_id=*", "batch_id=*")):
        m = _BATCH_RE.search(d)
        schema_id = int(os.path.basename(os.path.dirname(d)).split("=")[1])
        if m:
            out.append((int(m.group(1)), schema_id))
    return sorted(out)


def checkpoint_df(spark: SparkSession, table: CowTable) -> DataFrame:
    """The applied-offset-range checkpoint as a DataFrame."""
    schema = T.StructType(
        [
            T.StructField("batch_id", T.LongType()),
            T.StructField("lsn_lo", T.LongType()),
            T.StructField("lsn_hi", T.LongType()),
            T.StructField("snapshot_id", T.LongType()),
        ]
    )
    rows = [
        (s["batch_id"], s["lsn_lo"], s["lsn_hi"], s["snapshot_id"])
        for s in table.snapshots()
        if s["batch_id"] is not None
    ]
    return spark.createDataFrame(rows, schema)


def pending_batches(spark: SparkSession, log_dir: str, table: CowTable) -> list[int]:
    """Resume anti-join: planned batch ids not yet committed, ascending."""
    planned = planned_batches(log_dir)
    if not planned:
        return []
    planned_df = spark.createDataFrame(
        [(b,) for b, _ in planned], T.StructType([T.StructField("batch_id", T.LongType())])
    ).distinct()
    committed = checkpoint_df(spark, table).select("batch_id")
    pending = planned_df.join(committed, on="batch_id", how="left_anti")
    return sorted(r.batch_id for r in pending.collect())
