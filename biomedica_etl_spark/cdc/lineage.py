"""Per-partition lineage / metrics rows.

Reference analogue: the append-only ``complete``/``error`` CSV logs written
per processed key (``src/pmc_oa/download_batch.py:190-222``) that double as
audit trail and resume checkpoint. Here: one row per Spark partition of the
reduced delta per micro-batch — offsets applied, rows upserted/deleted,
watermark (max event ts) — appended to a parquet metrics table so any
failure can be diagnosed and reconciled (sum(rows) vs table delta).

Per-bucket rows are produced by merge.py (``_plan_cow`` for the COW
planning pass, ``_layer_bucket_metrics`` for the MOR read-back); only the
tiny per-bucket summary ever reaches the driver (bounded by bucket count,
not data size). This module owns the append-only parquet sink.
"""

from __future__ import annotations

import os
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

LINEAGE_COLS = [
    "batch_id", "snapshot_id", "partition_id", "bucket", "offsets_applied",
    "rows_upserted", "rows_deleted", "lsn_lo", "lsn_hi", "watermark",
]


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


def read_lineage(spark, lineage_dir: str):
    """The metrics table as a DataFrame — the reconcile/diagnose read half
    of the reference's completeness checks
    (``src/pmc_oa/download_batch.py:246-276``): sum(rows_upserted/deleted)
    per batch reconciles against snapshot summaries, max(watermark) per
    bucket is the freshness dashboard. Empty dir -> empty typed frame."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("batch_id", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("offsets_applied", T.LongType()),
        T.StructField("rows_upserted", T.LongType()),
        T.StructField("rows_deleted", T.LongType()),
        T.StructField("lsn_lo", T.LongType()),
        T.StructField("lsn_hi", T.LongType()),
        T.StructField("watermark", T.TimestampType()),
    ])
    if not os.path.isdir(lineage_dir) or not os.listdir(lineage_dir):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(lineage_dir)
