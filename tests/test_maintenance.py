"""Table maintenance: named refs (tags) pin retention, orphan-dir GC with a
grace window is safe alongside ingest, and the ``files`` metadata table
reports live files without scanning data.

Reference analogue: the reference keeps every staged output dir forever and
prunes by hand (``scripts/03_download_batch_ftp.py`` re-lists and skips);
here retention and GC are first-class table operations, Iceberg-style.
"""

from __future__ import annotations

import os

import pytest

from biomedica_etl_spark.cdc.generator import SCENARIOS, generate_change_log
from biomedica_etl_spark.cdc.oracle import replay
from biomedica_etl_spark.cdc.runner import CdcRunner
from biomedica_etl_spark.cdc.table import CowTable


def _state(spark, table, snapshot_id=None):
    return [
        r.asDict()
        for r in table.read(spark, snapshot_id=snapshot_id)
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]


def test_tag_pins_snapshot_through_expiration(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8, mode="cow")
    runner.run()
    table = runner.table
    snaps = table.snapshots()
    assert len(snaps) >= 4

    # tag an EARLY snapshot, well outside the retention window
    audit_id = snaps[1]["snapshot_id"]
    assert table.set_tag("audit", audit_id) == audit_id
    audit_state = _state(spark, table, audit_id)

    stats = table.expire_snapshots(keep_last=2)
    assert stats["snapshots_removed"] == len(snaps) - 2 - 1  # tag pinned one

    # the tagged snapshot still resolves and time-travels bit-for-bit —
    # including from a COLD process (fresh caches, refs read from disk)
    cold = CowTable(table.root)
    assert cold.ref("audit") == audit_id
    assert _state(spark, cold, cold.ref("audit")) == audit_state
    # an untagged expired neighbour is gone
    with pytest.raises(ValueError):
        table.read(spark, snapshot_id=audit_id + 1)
    # live state unaffected
    assert _state(spark, table) == replay(log)

    # untag -> next expiration drops it; fencing still intact cold
    table.remove_tag("audit")
    stats = table.expire_snapshots(keep_last=2)
    assert stats["snapshots_removed"] == 1
    with pytest.raises(ValueError):
        table.read(spark, snapshot_id=audit_id)
    cold2 = CowTable(table.root)
    from biomedica_etl_spark.cdc.checkpoint import pending_batches

    assert pending_batches(spark, log, cold2) == []

    with pytest.raises(ValueError):
        table.ref("audit")
    with pytest.raises(ValueError):
        table.set_tag("nope", snapshot_id=999999)


def test_orphan_gc_respects_grace_and_live_refs(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8, mode="cow")
    runner.run()
    table = runner.table

    # a crashed writer's abandoned staging dir: created but never committed
    orphan = table.new_data_dir()
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"not really parquet")
    n_dirs = len(os.listdir(table.data_dir))

    # inside the grace window: untouched (an in-flight writer looks the same)
    assert table.remove_orphaned_files(grace_seconds=3600)["dirs_removed"] == 0
    assert os.path.exists(orphan)

    # past the grace window: collected; live dirs never touched
    assert table.remove_orphaned_files(grace_seconds=0)["dirs_removed"] == 1
    assert not os.path.exists(orphan)
    assert len(os.listdir(table.data_dir)) == n_dirs - 1
    assert _state(spark, table) == replay(log)
    # idempotent
    assert table.remove_orphaned_files(grace_seconds=0)["dirs_removed"] == 0


def test_files_metadata_table_matches_stored_rows(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    # MOR with auto-compaction disabled, then a PARTIAL compaction of half
    # the buckets: 0-3 gain base files, 4-7 keep only delta layers, so the
    # listing exercises both kinds in one snapshot
    runner = CdcRunner(
        spark, log, str(tmp_path / "t"), n_buckets=8, mode="mor",
        compact_every=10**9,
    )
    runner.run()
    table = runner.table
    from biomedica_etl_spark.cdc.merge import compact

    compact(spark, table, buckets=[0, 1, 2, 3])

    fm = table.files(spark).collect()
    assert fm, "expected live files"
    assert {r.kind for r in fm} == {"base", "delta"}
    for r in fm:
        full = os.path.join(table.root, r.path)
        assert os.path.exists(full)
        assert r.file_bytes == os.path.getsize(full)
        assert 0 <= r.bucket < 8
        assert (r.kind == "base") == (r.layer == 0)

    # footer row counts sum to the stored (unresolved) row count — the
    # metadata view and the data agree without a data scan
    stored = table.read_stored_files(spark).count()
    assert sum(r.num_rows for r in fm) == stored

    # time travel: an older snapshot lists fewer-or-equal rows
    first_commit = table.snapshots()[1]["snapshot_id"]
    fm_old = table.files(spark, snapshot_id=first_commit).collect()
    assert sum(r.num_rows for r in fm_old) <= stored
