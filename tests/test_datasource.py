"""Spark 4 Python Data Source adapters: the table as a native batch source
(per-bucket Arrow LWW fold, no shuffle) and the commit chain as a native
streaming source (snapshot-id offsets), checked against the engine's own
readers and the pure-Python replay oracle."""

from __future__ import annotations

import pytest

from biomedica_etl_spark.cdc.generator import SCENARIOS, generate_change_log
from biomedica_etl_spark.cdc.oracle import replay
from biomedica_etl_spark.cdc.runner import CdcRunner
from biomedica_etl_spark.sources.datasource import (
    ChangesStreamReader,
    register_data_sources,
)


def _rows(df):
    return [r.asDict() for r in df.orderBy("conv_id", "turn_idx").collect()]


def test_batch_cowtable_source_matches_oracle(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    # MOR with mid-stream compaction: the snapshot holds base files AND
    # live delta layers, so the per-bucket fold exercises both kinds
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8,
                       mode="mor", compact_every=3)
    runner.run()
    table = runner.table
    register_data_sources(spark)

    df = spark.read.format("cowtable").option("root", table.root).load()
    assert _rows(df) == replay(log)
    # one planned partition per bucket -> full scan parallelism without
    # any shuffle (buckets are disjoint key spaces)
    assert df.rdd.getNumPartitions() == 8

    # time travel through the same source
    mid = table.snapshots()[2]["snapshot_id"]
    tt = (spark.read.format("cowtable").option("root", table.root)
          .option("snapshot_id", mid).load())
    assert _rows(tt) == _rows(table.read(spark, snapshot_id=mid))

    # unresolved system-column view
    raw = (spark.read.format("cowtable").option("root", table.root)
           .option("tombstones", "true").load())
    assert raw.columns == table.read_raw(spark).columns
    assert raw.count() == table.read_raw(spark).count()


def test_stream_changes_source_tails_commit_chain(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8,
                       mode="mor", compact_every=10**9)
    runner.run()
    table = runner.table
    register_data_sources(spark)
    genesis = table.snapshots()[0]["snapshot_id"]

    q = (spark.readStream.format("cowtable_changes")
         .option("root", table.root)
         .option("start_snapshot_id", genesis).load()
         .writeStream.format("memory").queryName("feed")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _rows(spark.table("feed"))
    want = _rows(table.read_changes_since(spark, genesis))
    # feed rows are the stored change set, order-free; compare as multisets
    key = lambda r: (r["conv_id"], r["turn_idx"], r["_lsn"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    assert any(r["_deleted"] for r in got), "expected tombstones in the feed"

    # starting mid-chain serves only the later commits
    mid = table.snapshots()[2]["snapshot_id"]
    reader = ChangesStreamReader({"root": table.root})
    parts = reader.partitions({"snapshot_id": mid},
                              reader.latestOffset())
    n_files_mid = sum(len(p.files) for p in parts)
    parts_all = reader.partitions({"snapshot_id": genesis},
                                  reader.latestOffset())
    assert 0 < n_files_mid < sum(len(p.files) for p in parts_all)

    # a history-rewriting commit breaks incrementality with the documented
    # resync contract
    from biomedica_etl_spark.cdc.merge import compact

    compact(spark, table)
    with pytest.raises(ValueError, match="resync"):
        reader.partitions({"snapshot_id": genesis}, reader.latestOffset())
