"""Per-partition lineage / metrics rows.

Reference analogue: the append-only ``complete``/``error`` CSV logs written
per processed key (``src/pmc_oa/download_batch.py:190-222``) that double as
audit trail and resume checkpoint. Here: one row per Spark partition of the
reduced delta per micro-batch — offsets applied, rows upserted/deleted,
watermark (max event ts) — appended to a parquet metrics table so any
failure can be diagnosed and reconciled (sum(rows) vs table delta).

Computed with a single ``groupBy(spark_partition_id())`` aggregate — no
collect of data rows, only the tiny per-partition summary comes back to the
driver (bounded by shuffle partition count, not data size).
"""

from __future__ import annotations

import os
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import BUCKET_COL

LINEAGE_COLS = [
    "batch_id", "snapshot_id", "partition_id", "bucket", "offsets_applied",
    "rows_upserted", "rows_deleted", "lsn_lo", "lsn_hi", "watermark",
]


def delta_partition_metrics(changes_bucketed: DataFrame, batch_id: int) -> list[dict[str, Any]]:
    """One metrics row per (spark partition, bucket) of the incoming batch.

    Runs on the RAW change events (pre-reduce): the aggregation emits one
    tiny row per (input partition, bucket), so the shuffle is a few hundred
    rows regardless of batch size and the wide text column never leaves the
    scan — a separate cheap pass instead of persisting the reduced delta.
    """
    agg = (
        changes_bucketed.groupBy(
            F.spark_partition_id().alias("partition_id"), F.col(BUCKET_COL).alias("bucket")
        )
        .agg(
            F.count("*").alias("offsets_applied"),
            F.sum(F.when(F.col("op") != "D", 1).otherwise(0)).alias("rows_upserted"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("rows_deleted"),
            F.min("lsn").alias("lsn_lo"),
            F.max("lsn").alias("lsn_hi"),
            F.max("ts").alias("watermark"),
        )
        .collect()
    )
    return [{"batch_id": batch_id, **r.asDict()} for r in agg]


def append_lineage(lineage_dir: str, rows: list[dict[str, Any]], snapshot_id: int) -> None:
    if not rows:
        return
    os.makedirs(lineage_dir, exist_ok=True)
    cols: dict[str, list[Any]] = {c: [] for c in LINEAGE_COLS}
    for r in rows:
        r = {**r, "snapshot_id": snapshot_id}
        for c in LINEAGE_COLS:
            cols[c].append(r.get(c))
    schema = pa.schema(
        [
            ("batch_id", pa.int64()), ("snapshot_id", pa.int64()),
            ("partition_id", pa.int32()), ("bucket", pa.int32()),
            ("offsets_applied", pa.int64()), ("rows_upserted", pa.int64()),
            ("rows_deleted", pa.int64()), ("lsn_lo", pa.int64()),
            ("lsn_hi", pa.int64()), ("watermark", pa.timestamp("us")),
        ]
    )
    table = pa.table(cols, schema=schema)
    pq.write_table(table, os.path.join(lineage_dir, f"lineage-{uuid.uuid4().hex}.parquet"))
