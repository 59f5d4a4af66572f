"""Pure-Python replay oracle.

Single-threaded, dict-based replay of a change log in global LSN order —
the ground truth the Spark engine must match batch-for-batch and after
arbitrary restarts. Mirrors the reference's operational correctness style
(row-count completeness + content checks, reference
``src/pmc_oa/download_batch.py:246-276``) but as an executable oracle.

Semantics (shared with merge.py and encoded in tests):
- events are totally ordered by ``lsn``; the max-LSN event per
  ``(conv_id, turn_idx)`` wins (duplicates of the same lsn are verbatim
  copies, so apply order among them is irrelevant);
- ``I`` and ``U`` are both full-row upserts (U-of-absent-key inserts —
  reference analogue: tolerant left join, ``scripts/05_json_to_entrez.py:329-330``);
- ``D`` removes the key (D-of-absent-key is a no-op);
- epoch-0/1 events lack ``tool`` -> NULL; ``turn_idx`` compares as int64;
- corrupt events (unknown op, negative turn_idx, null key) are quarantined:
  skipped here, routed to the engine's ``_quarantine`` sink there
  (reference analogue: error-row logs instead of batch abort,
  ``src/pmc_oa/download_batch.py:123-139``).
"""

from __future__ import annotations

import glob
import os
from typing import Any

import pyarrow.dataset as ds

FINAL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _read_all_events(log_dir: str) -> list[dict[str, Any]]:
    rows: list[dict[str, Any]] = []
    for epoch_dir in sorted(glob.glob(os.path.join(log_dir, "schema_id=*"))):
        dataset = ds.dataset(epoch_dir, format="parquet", partitioning="hive")
        for batch in dataset.to_table().to_pylist():
            batch.setdefault("tool", None)
            batch["turn_idx"] = int(batch["turn_idx"])
            rows.append(batch)
    return rows


def replay(log_dir: str, max_batch_id: int | None = None) -> list[dict[str, Any]]:
    """Replay the log (optionally only batches <= max_batch_id) to final state.

    Returns rows sorted by (conv_id, turn_idx) — the stable ordering the
    pass gate compares under.
    """
    events = _read_all_events(log_dir)
    if max_batch_id is not None:
        events = [e for e in events if e["batch_id"] <= max_batch_id]
    events.sort(key=lambda e: e["lsn"])

    state: dict[tuple[str, int], dict[str, Any]] = {}
    for e in events:
        if (e["op"] not in ("I", "U", "D") or e["turn_idx"] < 0
                or e["conv_id"] is None or e["lsn"] is None):
            continue  # quarantined
        key = (e["conv_id"], e["turn_idx"])
        if e["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = {c: e[c] for c in FINAL_COLS}
    return [state[k] for k in sorted(state)]


def spark_replay(spark, log_dir: str, max_batch_id: int | None = None):
    """One-shot Spark replay of the whole log — an INDEPENDENT plan for
    cross-checking the engine at scales where the dict replay above is
    infeasible (the 10^8+-event soaks).

    Independence argument: the engine applies the log incrementally —
    per-batch LWW reduce, bucket routing, delta layers, fold/compaction
    maintenance, snapshot commits — while this is a single global
    ``max_by(payload, lsn)`` over the raw files with none of that
    machinery (no bucketing, no salting, no table metadata, no batching).
    Sequential apply in LSN order per key == keep the max-LSN event per
    key, then drop keys whose winner is a delete; duplicate-LSN events are
    verbatim copies so the ``max_by`` tie pick is value-identical. The
    validity gate mirrors ``merge._valid_pred`` / the dict replay above.

    Returns the final state (FINAL_COLS) — compare with
    ``table.read(spark)`` via two-sided ``exceptAll`` counts.
    """
    from pyspark.sql import functions as F

    from .schema import CHANGE_COLS, SchemaRegistry, align_to_target

    registry = SchemaRegistry()
    parts = []
    for epoch_dir in sorted(glob.glob(os.path.join(log_dir, "schema_id=*"))):
        schema_id = int(os.path.basename(epoch_dir).split("=")[1])
        # explicit epoch schema (no mergeSchema inference pass); Spark
        # appends the discovered batch_id partition column to the
        # user-specified schema
        df = spark.read.schema(registry.get(schema_id)).parquet(epoch_dir)
        parts.append(align_to_target(df).select(*CHANGE_COLS, "batch_id"))
    events = parts[0]
    for p in parts[1:]:
        events = events.unionByName(p)
    if max_batch_id is not None:
        events = events.filter(F.col("batch_id") <= max_batch_id)
    valid = F.coalesce(
        F.col("op").isin("I", "U", "D")
        & (F.col("turn_idx") >= 0)
        & F.col("conv_id").isNotNull()
        & F.col("lsn").isNotNull(),
        F.lit(False),
    )
    payload = F.struct(*[F.col(c) for c in ["op"] + FINAL_COLS])
    winners = (
        events.filter(valid)
        .groupBy("conv_id", "turn_idx")
        .agg(F.max_by(payload, F.col("lsn")).alias("w"))
    )
    return (
        winners.filter(F.col("w.op") != "D")
        .select(*[F.col(f"w.{c}").alias(c) for c in FINAL_COLS])
    )
