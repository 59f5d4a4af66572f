"""Multi-table atomic commit: all-or-nothing publication across tables.

``TransactionCoordinator`` makes one batch VISIBLE on N independent
``CowTable``s atomically — the missing piece when derived state spans
tables (a conversations table + an annotations table feeding a
``JoinView``; a table and its replica; a fact/dimension pair that must
advance together). Iceberg/Delta only offer this through an external
catalog (Nessie) or not at all; here it is a ~200-line roll-forward
protocol over machinery the engine already has:

- **Prepare** = the existing write-audit-publish stage: each participant
  stages its batch (``wap=True`` apply, or ``CdcRunner.stage_next_batch``)
  — data fully written, invisible to readers, fencing, and snapshot
  chains. Staging is per-table and independently crash-safe (a replayed
  stage overwrites; an abandoned stage is orphan-GC'd).
- **Commit point** = ONE atomic rename: the coordinator validates every
  participant has a live staged snapshot, then writes the transaction
  record (``state='committed'``, the participant list with their
  reserved snapshot ids) via temp + fsync + rename. Before that rename
  the transaction can only abort (presumed abort); after it, it can only
  roll forward.
- **Roll forward** (idempotent): publish each participant's staged
  snapshot. Publication keeps the reserved snapshot id and engages the
  per-table batch fencing, so a crash anywhere in the publish loop is
  healed by ``recover()``: participants whose ``batch_id`` is already
  committed are skipped, the rest are published, then the record is
  marked ``done``. Replaying ``commit_all`` with the same ``txn_id``
  after ``done`` is a structural no-op.

What this gives and does not give: atomic DURABILITY — after a crash at
any point, either every participant's batch is (eventually) visible or
none is; never a mix that stays. It does NOT give cross-table read
ISOLATION during the publish window (a reader racing the roll-forward
can see table A's new snapshot before table B's — the same anomaly
Iceberg multi-table commits have without a catalog-level swap). For a
consistent cross-table view, ``consistent_view(txn_id)`` returns the
snapshot ids the transaction published; reading every table AT those
pinned ids (``table.read(spark, snapshot_id=...)``) is a transactionally
consistent join, regardless of later commits.

Single-writer discipline (the same contract every commit path in this
engine states): participants must not take other commits between their
stage and the transaction's publish. The coordinator detects a violated
stage BEFORE the commit point (a staged snapshot whose parent is no
longer the table head reads as absent → the whole transaction refuses
and nothing published); after the commit point such a violation is
unrecoverable by design and ``recover`` raises loudly rather than
guessing.

Lineage: WAP defers lineage emission to publish; after ``commit_all``,
``CdcRunner.reconcile_lineage()`` backfills the committed batches'
metrics exactly from their layers (already the crash-gap repair path).

Scale: the whole protocol is driver-side metadata — O(participants)
existence checks and one fsync'd rename; the data writes happened at
stage time through the ordinary O(delta) merge plans.

Reference analogue: the reference's multi-output stages (records +
entrez JSON + upload manifest) have no atomicity at all — a crash
between outputs leaves them permanently inconsistent
(``scripts/05_json_to_entrez.py`` writes per-record files, then a
separate pass builds the combined view).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from .table import CowTable


class TransactionCoordinator:
    """Roll-forward transaction log over a directory of JSON records."""

    def __init__(self, log_dir: str) -> None:
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

    # --- record I/O -------------------------------------------------------

    def _path(self, txn_id: str) -> str:
        if not txn_id or "/" in txn_id or txn_id.startswith("."):
            raise ValueError(f"bad txn_id {txn_id!r}")
        return os.path.join(self.log_dir, f"txn-{txn_id}.json")

    def _read(self, txn_id: str) -> dict[str, Any] | None:
        p = self._path(txn_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write(self, rec: dict[str, Any]) -> None:
        p = self._path(rec["txn_id"])
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, p)
        # the record is the linchpin correlating N tables: the RENAME
        # itself must be durable before any participant publishes, or a
        # power loss could erase the committed marker after table A
        # published — and the presumed-abort path would then discard B,
        # a permanent partial publish. fsync the directory entry.
        fd = os.open(self.log_dir, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def transactions(self) -> list[dict[str, Any]]:
        out = []
        for name in sorted(os.listdir(self.log_dir)):
            if name.startswith("txn-") and name.endswith(".json"):
                with open(os.path.join(self.log_dir, name)) as f:
                    out.append(json.load(f))
        return out

    # --- the protocol -----------------------------------------------------

    def commit_all(self, tables: list[CowTable],
                   txn_id: str) -> dict[str, Any]:
        """Atomically publish every table's staged snapshot.

        Raises BEFORE the commit point if any participant has no live
        staged snapshot (nothing published, stages intact for abort or
        restage). Idempotent under ``txn_id``: a replay resumes the
        roll-forward or no-ops if already done.
        """
        rec = self._read(txn_id)
        if rec is not None and rec["state"] == "done":
            return {"txn_id": txn_id, "state": "done", "replayed": True,
                    "published": []}
        if rec is None:
            parts = []
            for t in tables:
                s = t.staged_snapshot()
                if s is None:
                    raise ValueError(
                        f"table {t.root} has no live staged snapshot "
                        "(nothing staged, or another commit moved the "
                        "head) — transaction refused, nothing published")
                parts.append({"root": os.path.abspath(t.root),
                              "batch_id": s["batch_id"],
                              "snapshot_id": s["snapshot_id"]})
            # COMMIT POINT: one atomic rename. Before: presumed abort.
            # After: roll-forward only.
            rec = {"txn_id": txn_id, "state": "committed",
                   "participants": parts}
            self._write(rec)
        by_root = {os.path.abspath(t.root): t for t in tables}
        published = self._roll_forward(rec, by_root)
        rec["state"] = "done"
        self._write(rec)
        return {"txn_id": txn_id, "state": "done", "replayed": False,
                "published": published}

    def _roll_forward(self, rec: dict[str, Any],
                      by_root: dict[str, CowTable]) -> list[dict[str, Any]]:
        published = []
        for p in rec["participants"]:
            t = by_root.get(p["root"]) or CowTable(p["root"])
            t.refresh()
            if t.is_committed(p["batch_id"]):
                continue  # this participant already published
            # verify the live stage IS the transaction's reserved one
            # BEFORE publishing: a concurrent writer may have committed
            # past it and staged something ELSE — publishing that foreign
            # stage as a side effect of the error path would make an
            # unaudited batch visible
            live = t.staged_snapshot()
            if live is None or live["snapshot_id"] != p["snapshot_id"]:
                raise RuntimeError(
                    f"transaction {rec['txn_id']} cannot roll forward: "
                    f"table {p['root']} lost its staged snapshot "
                    f"{p['snapshot_id']} after the commit point (a "
                    "concurrent writer violated the single-writer "
                    "contract); manual remediation required")
            pub = t.publish_staged()
            published.append({"root": p["root"],
                              "snapshot_id": pub["snapshot_id"],
                              "batch_id": p["batch_id"]})
        return published

    def recover(self) -> dict[str, Any]:
        """Heal every transaction the log says is past its commit point
        but not done: publish the remaining participants, mark done.
        Records already done (or never committed — there is no pending
        state on disk) are untouched; abandoned stages belong to no
        record and stay for ``abort_all``/restage."""
        rolled, poisoned = [], []
        for rec in self.transactions():
            if rec["state"] != "committed":
                continue
            # one poisoned transaction (single-writer violation) must not
            # block healing the rest — heal what can heal, report the rest
            try:
                self._roll_forward(rec, {})
            except RuntimeError as e:
                poisoned.append({"txn_id": rec["txn_id"], "error": str(e)})
                continue
            rec["state"] = "done"
            self._write(rec)
            rolled.append(rec["txn_id"])
        if poisoned:
            raise RuntimeError(
                f"recover healed {rolled} but {len(poisoned)} "
                f"transaction(s) cannot roll forward: {poisoned}")
        return {"rolled_forward": rolled}

    @staticmethod
    def abort_all(tables: list[CowTable]) -> dict[str, Any]:
        """Presumed abort (no record written yet): discard every
        participant's staged snapshot and its data dirs."""
        return {"aborted": sum(
            1 for t in tables if t.abort_staged()["aborted"])}

    def consistent_view(self, txn_id: str) -> dict[str, int]:
        """root -> the snapshot id this transaction published there.
        Reading every table pinned at these ids is a transactionally
        consistent cross-table view, immune to later commits."""
        rec = self._read(txn_id)
        if rec is None or rec["state"] != "done":
            raise ValueError(f"transaction {txn_id} is not done")
        return {p["root"]: p["snapshot_id"] for p in rec["participants"]}
