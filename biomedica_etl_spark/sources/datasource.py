"""Spark 4 Python Data Source API adapters for the transcript table.

Exposes the engine's lakehouse table through Spark's NATIVE source
interface (``pyspark.sql.datasource``, Spark 4.0+), so any consumer —
including one that knows nothing about this package — reads it with plain
``spark.read.format(...)`` / ``spark.readStream.format(...)``:

- ``cowtable`` (batch): resolved live rows of a snapshot. The driver side
  plans ONE input partition per table bucket from the manifest (no file
  listing beyond the snapshot's own dirs, no Spark job to plan); each
  executor task LWW-folds its bucket locally with pyarrow and yields
  Arrow record batches — buckets are disjoint by construction so the
  fold needs no shuffle at all, which is exactly why the table buckets
  on ``xxhash64(conv_id)`` in the first place. Options: ``root``
  (required), ``snapshot_id`` (time travel), ``tombstones=true`` (emit
  unresolved system columns instead of live rows).
- ``cowtable_changes`` (streaming): the table's change feed as a
  Structured Streaming source. Offsets are snapshot ids — the stream
  tails the commit chain exactly like the engine tails a WAL: each
  micro-batch serves the delta files the snapshots in ``(start, end]``
  appended, one partition per (snapshot, bucket-layer dir). A commit
  that rewrites history in place (COW merge, compaction, rollback)
  cannot be served incrementally; the source then fails the batch with
  the same resync contract ``CowTable.read_changes_since`` documents.
  Options: ``root`` (required), ``start_snapshot_id`` (default: the
  table's genesis snapshot).

Scale notes: planning is manifest-driven and O(commits in range) on the
driver; data movement is executor-side Arrow with zero Python row loops
(the LWW fold is vectorized pandas/pyarrow — §2.9 discipline). At 100 TB
the batch source parallelizes across all buckets and each task streams
its files batch-by-batch instead of materializing the bucket.

Reference analogue: the reference exposes its final corpus only as files
on disk (``scripts/06_serilaize_to_webdataset_parallel.py``); here the
table is a first-class Spark source either way — state or feed.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..cdc.schema import PAYLOAD_FIELDS, SYS_DELETED, SYS_LSN
from ..cdc.table import CowTable, stored_schema


def _arrow_schema(with_sys: bool) -> pa.Schema:
    """Arrow shape Spark expects for the declared read schema (timestamps
    as int64 micros, UTC session basis)."""
    spark_to_arrow = {
        "string": pa.string(),
        "bigint": pa.int64(),
        "timestamp": pa.timestamp("us"),
        "boolean": pa.bool_(),
    }
    fields = [(n, spark_to_arrow[t.simpleString()]) for n, t in PAYLOAD_FIELDS]
    if with_sys:
        fields += [(SYS_LSN, pa.int64()), (SYS_DELETED, pa.bool_())]
    return pa.schema(fields)


def _read_stored_arrow(files: list[str], with_sys: bool) -> pa.Table:
    """Read stored-shape parquet files into one Arrow table, normalized to
    the target schema (ts cast to us; old INT96 files land as ns)."""
    target = _arrow_schema(True)
    tabs = []
    for f in files:
        t = pq.read_table(f, columns=target.names)
        tabs.append(t.cast(target))
    merged = (pa.concat_tables(tabs) if tabs
              else target.empty_table())
    return merged if with_sys else merged


def _lww_fold(stored: pa.Table, tombstones: bool) -> pa.Table:
    """Vectorized per-bucket LWW resolve: newest ``_lsn`` wins per
    (conv_id, turn_idx); tombstones dropped unless requested. Bucket-local
    — disjoint key spaces make this embarrassingly parallel."""
    df = stored.to_pandas()
    if len(df):
        df = (df.sort_values(SYS_LSN, kind="stable")
                .groupby(["conv_id", "turn_idx"], as_index=False, sort=True)
                .tail(1)
                .sort_values(["conv_id", "turn_idx"], kind="stable"))
        if not tombstones:
            df = df[~df[SYS_DELETED].fillna(False)]
    if not tombstones:
        df = df.drop(columns=[SYS_LSN, SYS_DELETED])
    return pa.Table.from_pandas(df, schema=_arrow_schema(tombstones),
                                preserve_index=False)


class _BucketFiles(InputPartition):
    def __init__(self, bucket: int, files: list[str]) -> None:
        self.bucket = bucket
        self.files = files


class CowTableDataSource(DataSource):
    """``spark.read.format("cowtable").option("root", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "cowtable"

    def schema(self) -> T.StructType:
        if self.options.get("tombstones", "false").lower() == "true":
            return stored_schema()
        return T.StructType(
            [T.StructField(n, t, True) for n, t in PAYLOAD_FIELDS])

    def reader(self, schema: T.StructType) -> "CowTableReader":
        return CowTableReader(self.options)


class CowTableReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options["root"]
        snap = options.get("snapshot_id")
        self.snapshot_id = int(snap) if snap is not None else None
        self.tombstones = options.get("tombstones", "false").lower() == "true"

    def partitions(self) -> list[_BucketFiles]:
        table = CowTable(self.root)
        snap = table._resolve_snapshot(self.snapshot_id)
        if snap is None:
            return [_BucketFiles(0, [])]
        per_bucket: dict[int, list[str]] = {}
        for key in ("bucket_dirs", "delta_dirs"):
            for b, d in snap.get(key, {}).items():
                dirs = d if isinstance(d, list) else [d]
                for one in dirs:
                    per_bucket.setdefault(int(b), []).extend(sorted(
                        glob.glob(os.path.join(table.root, one, "*.parquet"))))
        if not per_bucket:
            return [_BucketFiles(0, [])]
        return [_BucketFiles(b, fs) for b, fs in sorted(per_bucket.items())]

    def read(self, partition: _BucketFiles) -> Iterator[pa.RecordBatch]:
        stored = _read_stored_arrow(partition.files, with_sys=True)
        yield from _lww_fold(stored, self.tombstones).to_batches()


class _DeltaSlice(InputPartition):
    def __init__(self, files: list[str]) -> None:
        self.files = files


class CowTableChangesDataSource(DataSource):
    """``spark.readStream.format("cowtable_changes")`` — snapshot-id-offset
    change feed (Delta CDF / Iceberg incremental-scan discipline)."""

    @classmethod
    def name(cls) -> str:
        return "cowtable_changes"

    def schema(self) -> T.StructType:
        return stored_schema()

    def streamReader(self, schema: T.StructType) -> "ChangesStreamReader":
        return ChangesStreamReader(self.options)


class ChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.root = options["root"]
        self._start = options.get("start_snapshot_id")

    def _table(self) -> CowTable:
        return CowTable(self.root)

    def initialOffset(self) -> dict:
        if self._start is not None:
            return {"snapshot_id": int(self._start)}
        table = self._table()
        snaps = table.snapshots()
        return {"snapshot_id": snaps[0]["snapshot_id"] if snaps else 0}

    def latestOffset(self) -> dict:
        table = self._table()
        cur = table.current_snapshot()
        return {"snapshot_id": cur["snapshot_id"] if cur else 0}

    def partitions(self, start: dict, end: dict) -> list[_DeltaSlice]:
        lo, hi = start["snapshot_id"], end["snapshot_id"]
        table = self._table()
        table._load_all()
        slices: list[_DeltaSlice] = []
        for s in table.snapshots():
            sid = s["snapshot_id"]
            if sid <= lo or sid > hi:
                continue
            parent = table.snapshot_by_id(s["parent_id"]) or {}
            if s["bucket_dirs"] != parent.get("bucket_dirs", {}):
                raise ValueError(
                    f"snapshot {sid} rewrote base files "
                    f"({s.get('summary', {}).get('commit_type', 'cow')}): "
                    "the change feed cannot cross it — resync from a full "
                    "cowtable scan and restart the stream from here")
            parent_dirs = {
                d for ds in parent.get("delta_dirs", {}).values() for d in ds}
            snap_dirs = {
                d for ds in s.get("delta_dirs", {}).values() for d in ds}
            if not parent_dirs <= snap_dirs:
                raise ValueError(
                    f"snapshot {sid} removed delta layers "
                    f"({s.get('summary', {}).get('commit_type', '?')}): "
                    "the change feed cannot cross a rollback — resync")
            for d in sorted(snap_dirs - parent_dirs):
                files = sorted(glob.glob(
                    os.path.join(table.root, d, "*.parquet")))
                if files:
                    slices.append(_DeltaSlice(files))
        return slices or [_DeltaSlice([])]

    def read(self, partition: _DeltaSlice) -> Iterator[tuple]:
        if not partition.files:
            return
        stored = _read_stored_arrow(partition.files, with_sys=True)
        for row in stored.cast(_arrow_schema(True)).to_pylist():
            yield tuple(row[n] for n in _arrow_schema(True).names)

    def commit(self, end: dict) -> None:
        pass  # offsets are snapshot ids; nothing to reclaim


def register_data_sources(spark) -> None:
    """Idempotently register both formats on a session."""
    spark.dataSource.register(CowTableDataSource)
    spark.dataSource.register(CowTableChangesDataSource)
