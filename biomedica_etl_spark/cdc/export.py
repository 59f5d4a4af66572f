"""Resumable snapshot publication — the engine's twin of the reference's
HF dataset upload (``scripts/Upload/7_upload_wd_dataset.py:14-22``:
``upload_large_folder(..., num_workers=8)``).

What that call actually guarantees operationally — and what this module
reproduces without a network:

- **bulk transfer with worker parallelism**: the copy fans out over
  executors (``mapInPandas`` over the file inventory — on a cluster each
  worker pushes its batch to shared storage);
- **resumability**: a file already present at the destination with the
  expected byte size is skipped, so a killed publish re-run only moves
  what is missing (upload_large_folder's checksum-skip);
- **integrity**: every published file's md5 lands in the manifest; the
  destination is only marked complete when ``MANIFEST.json`` appears, and
  that write is atomic (tmp + rename), so a reader never sees a
  half-published dataset marked done;
- **snapshot pinning**: the inventory comes from one table snapshot
  (``CowTable.files``), so concurrent ingest cannot tear the export.

Scale: the inventory is O(live files) driver-side metadata (same class as
every manifest op); the byte movement is executor-side and embarrassingly
parallel. Nothing here reads row data except the streaming md5 during the
copy itself.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    from .table import CowTable

_MANIFEST = "MANIFEST.json"


def _copy_batches(root: str, dest: str):
    """mapInPandas kernel factory: copy each inventory row's file from
    ``root`` to ``dest`` (tmp + rename, so partially-written files never
    collide with the resume check), skipping files already present with
    the expected size. Streams md5 during the copy; skipped files get a
    read-only hash pass so the manifest is always complete."""
    import hashlib
    import uuid

    import pandas as pd

    def _md5(path: str) -> str:
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def kernel(batches):
        for pdf in batches:
            paths, actions, sizes, hashes = [], [], [], []
            for rel, nbytes in zip(pdf["path"], pdf["file_bytes"]):
                src = os.path.join(root, rel)
                dst = os.path.join(dest, rel)
                if os.path.exists(dst) and os.path.getsize(dst) == int(nbytes):
                    action, digest = "skipped", _md5(dst)
                else:
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    tmp = dst + f".pub-{uuid.uuid4().hex}"
                    h = hashlib.md5()
                    with open(src, "rb") as fi, open(tmp, "wb") as fo:
                        for chunk in iter(lambda: fi.read(1 << 20), b""):
                            h.update(chunk)
                            fo.write(chunk)
                    os.replace(tmp, dst)
                    action, digest = "published", h.hexdigest()
                paths.append(rel)
                actions.append(action)
                sizes.append(int(nbytes))
                hashes.append(digest)
            yield pd.DataFrame({
                "path": paths, "action": actions,
                "file_bytes": sizes, "md5": hashes,
            })

    return kernel


def publish_snapshot(
    spark: SparkSession,
    table: "CowTable",
    dest: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Publish one snapshot's live data files to ``dest``; returns the
    per-file status relation (path, action published|skipped, bytes, md5).

    Idempotent and resumable: re-running after a crash (or after the
    destination lost files) republishes only what is missing or
    size-mismatched; a clean re-run publishes nothing. ``MANIFEST.json``
    is written last, atomically, and records the snapshot id — presence
    of the manifest IS the completion marker, exactly like the
    reference's upload finishing without raising."""
    snap = table._resolve_snapshot(snapshot_id)
    sid = int(snap["snapshot_id"]) if snap else -1
    inventory = table.files(spark, snapshot_id).select("path", "file_bytes")
    status = inventory.mapInPandas(
        _copy_batches(table.root, dest),
        "path string, action string, file_bytes long, md5 string",
    )
    # O(live files) driver-side rows — manifest-scale metadata, not data
    rows = sorted(
        (r["path"], r["action"], r["file_bytes"], r["md5"])
        for r in status.collect()
    )
    os.makedirs(dest, exist_ok=True)
    manifest = {
        "snapshot_id": sid,
        "file_count": len(rows),
        "total_bytes": int(sum(r[2] for r in rows)),
        "files": [
            {"path": p, "file_bytes": b, "md5": m} for p, _a, b, m in rows
        ],
    }
    tmp = os.path.join(dest, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(dest, _MANIFEST))
    return spark.createDataFrame(
        rows, "path string, action string, file_bytes long, md5 string"
    )


def read_manifest(dest: str) -> dict:
    """Load a published dataset's manifest (raises if incomplete)."""
    with open(os.path.join(dest, _MANIFEST)) as f:
        return json.load(f)
