"""Incremental inverted index — cdc.index.TokenIndex.

The index must equal a from-scratch build over the live table after any
sequence of ingest + DML (the IVM correctness bar), rewrite ONLY the
shards the window's tokens touch (the O(changes) bar), prune term
lookups to the terms' shards, survive crash/replay through the atomic
pointer discipline, and fall back to a rebuild exactly when the feed
declares the window unservable.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from biomedica_etl_spark.cdc.index import TokenIndex, postings_of, shard_of
from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
from biomedica_etl_spark.cdc.merge import compact
from biomedica_etl_spark.cdc.runner import CdcRunner

CFG = GeneratorConfig(n_events=3_000, batch_size=500, n_convs=40,
                      zipf_a=1.2, duplicate_frac=0.02, out_of_order=True)


def _scratch(spark, table, n_shards):
    """From-scratch postings of the live table (the oracle)."""
    return sorted(
        (r["token"], r["conv_id"], r["turn_idx"], r["tf"])
        for r in postings_of(table.read(spark, columns=["text"]), n_shards)
        .drop("shard").collect())


def _indexed(spark, idx):
    return sorted(
        (r["token"], r["conv_id"], r["turn_idx"], r["tf"])
        for r in idx.read(spark).collect())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """A table built from the first two batches + a bootstrapped index."""
    tmp = tmp_path_factory.mktemp("tokidx")
    log = str(tmp / "log")
    generate_change_log(log, CFG)
    runner = CdcRunner(spark, log, str(tmp / "t"), n_buckets=8, mode="mor")
    runner.run(max_batches=2)
    idx = TokenIndex(str(tmp / "idx"), n_shards=16)
    res = idx.refresh(spark, runner.table)
    assert res["mode"] == "bootstrap"
    assert _indexed(spark, idx) == _scratch(spark, runner.table, 16)
    return runner, idx


def test_incremental_equals_scratch_across_ingest_and_dml(spark, built):
    runner, idx = built
    runner.run()
    res = idx.refresh(spark, runner.table)
    assert res["mode"] == "incremental"
    assert _indexed(spark, idx) == _scratch(spark, runner.table, 16)

    # DML windows: delete retracts postings, update retracts old tokens
    # and adds new ones — both need the image feed's pre-images
    runner.delete_where("turn_idx % 6 = 1")
    runner.update_where("role = 'tool'",
                        {"text": "concat(text, ' zzqx')"})
    res = idx.refresh(spark, runner.table)
    assert res["mode"] == "incremental"
    assert _indexed(spark, idx) == _scratch(spark, runner.table, 16)
    # idempotent at head
    assert idx.refresh(spark, runner.table) == {
        "refreshed": False, "cursor": runner.table.current_snapshot()["snapshot_id"]}


def test_refresh_rewrites_only_affected_shards(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8,
                       mode="mor")
    runner.run()
    idx = TokenIndex(str(tmp_path / "idx"), n_shards=16)
    idx.refresh(spark, runner.table)
    before = idx.shard_dirs()
    assert len(before) > 1

    # one-key update with a tiny vocabulary: affected shards = shards of
    # the old text's tokens plus the new token's shard — strictly fewer
    # than all 16
    row = (runner.table.read(spark).orderBy("conv_id", "turn_idx")
           .limit(1).collect()[0])
    runner.update_where(
        f"conv_id = '{row['conv_id']}' AND turn_idx = {row['turn_idx']}",
        {"text": "'qqfreshtoken'"})
    res = idx.refresh(spark, runner.table)
    assert res["mode"] == "incremental"
    assert 0 < res["shards_affected"] < 16
    after = idx.shard_dirs()
    # every unaffected shard carried forward BY REFERENCE (same dirs),
    # every affected shard re-pointed to fresh dirs
    aff = {s for s in range(16) if before.get(s) != after.get(s)}
    assert len(aff) == res["shards_affected"]
    assert shard_of("qqfreshtoken", 16) in aff
    # and the content is still exactly the from-scratch build
    assert _indexed(spark, idx) == _scratch(spark, runner.table, 16)
    # the new term is served, the old row's tokens are retracted
    hits = idx.lookup(spark, ["qqfreshtoken"]).collect()
    assert [(h["conv_id"], h["turn_idx"], h["tf"]) for h in hits] == [
        (row["conv_id"], row["turn_idx"], 1)]


def test_lookup_prunes_to_term_shards(spark, built):
    runner, idx = built
    token = idx.read(spark).orderBy(F.desc("tf"), "token").limit(1) \
        .collect()[0]["token"]
    shard = shard_of(token, 16)
    got = idx.lookup(spark, [token])
    # the scan plans over the term's shard dir only
    files = got.inputFiles()
    assert files, "lookup scanned no files"
    assert all(f"shard={shard}" in f for f in files)
    expect = sorted(
        (r["conv_id"], r["turn_idx"], r["tf"])
        for r in idx.read(spark).filter(F.col("token") == token).collect())
    assert sorted((r["conv_id"], r["turn_idx"], r["tf"])
                  for r in got.collect()) == expect


def test_unservable_window_falls_back_to_rebuild(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8,
                       mode="mor")
    runner.run(max_batches=2)
    idx = TokenIndex(str(tmp_path / "idx"), n_shards=16)
    idx.refresh(spark, runner.table)
    runner.run()
    # a major compaction folds delta layers INTO THE BASE — the feed
    # cannot prove the layer drop is replay-equivalent, so the window
    # raises and the index rebuilds at the target snapshot
    compact(spark, runner.table)
    res = idx.refresh(spark, runner.table)
    assert res["mode"] == "rebuild"
    assert _indexed(spark, idx) == _scratch(spark, runner.table, 16)


def test_crash_replay_converges_and_orphans_collected(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8,
                       mode="mor")
    runner.run(max_batches=2)
    idx = TokenIndex(str(tmp_path / "idx"), n_shards=16)
    idx.refresh(spark, runner.table)
    runner.run()

    # simulate a crash AFTER the shard write but BEFORE the pointer flip:
    # the written container is an unreferenced orphan; the previous
    # version still serves, and the replayed refresh converges
    imgs = runner.table.read_changes_with_images(
        spark, idx.cursor(), columns=["text"])
    posts = postings_of(imgs, 16)
    orphan = idx._write_shards(posts, list(range(16)))
    assert orphan  # something was written, nothing referenced
    before = _indexed(spark, idx)
    assert before == _indexed(spark, idx)  # previous version intact

    res = idx.refresh(spark, runner.table)
    assert res["mode"] == "incremental"
    assert _indexed(spark, idx) == _scratch(spark, runner.table, 16)
    # the orphan container was garbage-collected by the flip
    live_dirs = set(idx.shard_dirs().values())
    for rel in orphan.values():
        assert rel not in live_dirs
        assert not os.path.exists(os.path.join(idx.root, rel))
