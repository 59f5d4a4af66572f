"""Key-partitioned copy-on-write MERGE of one micro-batch into the table.

Equivalent of ``MERGE INTO transcripts USING delta ON (conv_id, turn_idx)
WHEN MATCHED AND delta.lsn > base._lsn ...`` expressed as a DataFrame plan
(no lakehouse jars in this sandbox; the plan is what Iceberg's COW MERGE
generates anyway).

Reference analogues: enrichment left-join with pass-through of unmatched
rows (``scripts/05_json_to_entrez.py:303-330``), LWW build-probe dict
(``scripts/06_serilaize_to_webdataset_parallel.py:141-143``), COW output
dir (``:332-334``).

Cross-batch out-of-order correctness: the stored table keeps ``_lsn`` and a
``_deleted`` tombstone per key. A delta row wins only if its lsn exceeds
the stored row's — so applying batches in ANY order converges to the same
state as the oracle's global-LSN replay, and replaying an already-applied
batch is a value-level no-op even before snapshot fencing turns it into a
structural no-op.

Scale notes:
- Only buckets touched by the delta are read and rewritten (file pruning
  via the snapshot manifest). 100 TB table + 1 GB delta => the join reads
  |affected buckets|, not the table.
- The delta after LWW-reduce is small relative to base; Spark/AQE
  broadcasts it when under threshold, else it's a shuffle join on the key
  with AQE skew splitting. The base side arrives bucket-partitioned from
  disk.
- The rewrite is ``repartition(n_affected, bucket)`` + ``partitionBy`` so
  each bucket's files are written by one task straight from the join
  output — one shuffle total for join+write.
"""

from __future__ import annotations

import glob
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import delta_partition_metrics
from .reduce import lww_reduce, lww_reduce_salted
from .schema import KEY_COLS, PAYLOAD_COLS, SYS_DELETED, SYS_LSN
from .table import BUCKET_COL, CowTable, bucket_expr


def merge_batch(
    spark: SparkSession,
    table: CowTable,
    changes: DataFrame,
    batch_id: int,
    salted: bool = False,
    n_salts: int = 8,
    lineage_dir: str | None = None,
    one_file_per_bucket: bool = True,
) -> dict[str, Any] | None:
    """LWW-reduce ``changes`` and merge into ``table`` as one commit.

    Returns the committed snapshot dict, or None when batch_id was already
    applied (exactly-once no-op).
    """
    if batch_id in table.committed_batch_ids():
        return None

    n_buckets = table.n_buckets
    stats_rows = delta_partition_metrics(
        changes.withColumn(BUCKET_COL, bucket_expr("conv_id", n_buckets)), batch_id
    )
    if not stats_rows:
        table.commit(batch_id, {}, None, None, {"rows_upserted": 0, "rows_deleted": 0})
        return table.current_snapshot()
    affected = sorted({r["bucket"] for r in stats_rows if r["bucket"] is not None})
    lsn_lo = min(r["lsn_lo"] for r in stats_rows)
    lsn_hi = max(r["lsn_hi"] for r in stats_rows)

    delta = (lww_reduce_salted(changes, n_salts) if salted else lww_reduce(changes))
    base = table.read_raw(spark, buckets=affected)

    d = delta.select(
        *KEY_COLS,
        *[F.col(c).alias(f"_d_{c}") for c in PAYLOAD_COLS if c not in KEY_COLS],
        F.col("lsn").alias("_d_lsn"),
        (F.col("op") == "D").alias("_d_del"),
    )
    joined = base.join(d, on=KEY_COLS, how="full_outer")
    delta_wins = F.col("_d_lsn").isNotNull() & (
        F.col(SYS_LSN).isNull() | (F.col("_d_lsn") > F.col(SYS_LSN))
    )
    merged = joined.select(
        *KEY_COLS,
        *[
            F.when(delta_wins, F.col(f"_d_{c}")).otherwise(F.col(c)).alias(c)
            for c in PAYLOAD_COLS
            if c not in KEY_COLS
        ],
        F.when(delta_wins, F.col("_d_lsn")).otherwise(F.col(SYS_LSN)).alias(SYS_LSN),
        F.when(delta_wins, F.col("_d_del"))
        .otherwise(F.coalesce(F.col(SYS_DELETED), F.lit(False)))
        .alias(SYS_DELETED),
    ).withColumn(BUCKET_COL, bucket_expr("conv_id", n_buckets))

    stage = table.new_data_dir()
    if one_file_per_bucket:
        # exactly one file per bucket dir: costs one extra full shuffle
        # of the merged output; right when downstream reads dominate
        merged = merged.repartition(max(len(affected), 1), F.col(BUCKET_COL))
    merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stage)
    rewritten = {
        int(os.path.basename(p).split("=")[1]): p
        for p in glob.glob(os.path.join(stage, f"{BUCKET_COL}=*"))
    }
    upserts = sum(r["rows_upserted"] for r in stats_rows)
    deletes = sum(r["rows_deleted"] for r in stats_rows)
    snap = table.commit(
        batch_id,
        rewritten,
        lsn_lo,
        lsn_hi,
        {"rows_upserted": upserts, "rows_deleted": deletes,
         "buckets_rewritten": len(rewritten)},
    )
    if snap is not None and lineage_dir is not None:
        from .lineage import append_lineage

        append_lineage(lineage_dir, stats_rows, snapshot_id=snap["snapshot_id"])
    return snap


def _to_stored(delta: DataFrame) -> DataFrame:
    """Reduced delta -> stored row shape (_lsn + _deleted tombstones)."""
    return delta.select(
        *KEY_COLS,
        *[F.col(c) for c in PAYLOAD_COLS if c not in KEY_COLS],
        F.col("lsn").alias(SYS_LSN),
        (F.col("op") == "D").alias(SYS_DELETED),
        F.col(BUCKET_COL),
    )


def mor_apply_batch(
    spark: SparkSession,
    table: CowTable,
    changes: DataFrame,
    batch_id: int,
    salted: bool = False,
    n_salts: int = 8,
    lineage_dir: str | None = None,
) -> dict[str, Any] | None:
    """Merge-on-read apply: write the LWW-reduced delta as a new layer.

    Iceberg-v2-MOR-style ingest: cost is O(delta) — one partial-agg shuffle
    of the batch plus one bucket-partitioned write; the base table is never
    read or rewritten. Readers resolve layers by max-_lsn (table.read_raw);
    ``compact`` folds layers back into the base. This is the
    write-optimized path for sustained high-rate tails; COW ``merge_batch``
    is the read-optimized one.
    """
    if batch_id in table.committed_batch_ids():
        return None
    n_buckets = table.n_buckets
    stats_rows = delta_partition_metrics(
        changes.withColumn(BUCKET_COL, bucket_expr("conv_id", n_buckets)), batch_id
    )
    if not stats_rows:
        return table.commit_delta(batch_id, {}, None, None,
                                  {"rows_upserted": 0, "rows_deleted": 0})
    affected = sorted({r["bucket"] for r in stats_rows if r["bucket"] is not None})
    lsn_lo = min(r["lsn_lo"] for r in stats_rows)
    lsn_hi = max(r["lsn_hi"] for r in stats_rows)

    delta = (lww_reduce_salted(changes, n_salts) if salted else lww_reduce(changes))
    delta = delta.withColumn(BUCKET_COL, bucket_expr("conv_id", n_buckets))
    stage = table.new_data_dir()
    (
        _to_stored(delta)
        .repartition(max(len(affected), 1), F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(stage)
    )
    appended = {
        int(os.path.basename(p).split("=")[1]): p
        for p in glob.glob(os.path.join(stage, f"{BUCKET_COL}=*"))
    }
    snap = table.commit_delta(
        batch_id, appended, lsn_lo, lsn_hi,
        {
            "rows_upserted": sum(r["rows_upserted"] for r in stats_rows),
            "rows_deleted": sum(r["rows_deleted"] for r in stats_rows),
            "buckets_appended": len(appended),
        },
    )
    if snap is not None and lineage_dir is not None:
        from .lineage import append_lineage

        append_lineage(lineage_dir, stats_rows, snapshot_id=snap["snapshot_id"])
    return snap


def compact(spark: SparkSession, table: CowTable) -> dict[str, Any] | None:
    """Fold all merge-on-read delta layers into the base (COW rewrite of
    buckets that have layers). Tombstones are retained — an out-of-order
    batch with a lower lsn must still lose to a compacted delete."""
    snap = table.current_snapshot()
    if not snap or not snap.get("delta_dirs"):
        return None
    buckets = sorted(int(b) for b in snap["delta_dirs"])
    resolved = table.read_raw(spark, buckets=buckets).withColumn(
        BUCKET_COL, bucket_expr("conv_id", table.n_buckets)
    )
    stage = table.new_data_dir()
    (
        resolved.repartition(max(len(buckets), 1), F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(stage)
    )
    rewritten = {
        int(os.path.basename(p).split("=")[1]): p
        for p in glob.glob(os.path.join(stage, f"{BUCKET_COL}=*"))
    }
    # a bucket whose layers contained only... nothing is impossible here:
    # every bucket in delta_dirs has at least one row; still, carry any
    # bucket that produced no output file by mapping it to an empty new dir
    for b in buckets:
        if b not in rewritten:
            empty = os.path.join(stage, f"{BUCKET_COL}={b}")
            os.makedirs(empty, exist_ok=True)
            rewritten[b] = empty
    return table.commit(
        None, rewritten, snap["lsn_lo"], snap["lsn_hi"],
        {"commit_type": "compact", "buckets_rewritten": len(rewritten)},
    )
