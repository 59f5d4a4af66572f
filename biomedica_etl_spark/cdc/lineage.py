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
