"""Merge-on-read mode: layer appends, compaction, mixed-mode resume."""

from __future__ import annotations

from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
from biomedica_etl_spark.cdc.merge import mor_apply_batch
from biomedica_etl_spark.cdc.oracle import replay
from biomedica_etl_spark.cdc.runner import CdcRunner, read_batch
from biomedica_etl_spark.cdc.schema import SchemaRegistry

from tests.conftest import run_and_compare

CFG = GeneratorConfig(
    n_events=6_000, batch_size=600, n_convs=80, duplicate_frac=0.03,
    out_of_order=True, absent_key_frac=0.05, zipf_a=1.2,
    schema_epoch_starts=(0.0, 0.3, 0.6),
)


def test_mor_matches_oracle_with_compaction(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    runner, _ = run_and_compare(
        spark, log, str(tmp_path / "t"), mode="mor", compact_every=3
    )
    snaps = runner.table.snapshots()
    assert any(s["summary"].get("commit_type") == "compact" for s in snaps)
    assert any(s["summary"].get("commit_type") == "append-delta" for s in snaps)


def test_mor_layers_capped_by_compaction(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8,
                       mode="mor", compact_every=3)
    runner.run()
    assert runner.table.max_delta_layers() < 3


def test_mor_batch_fencing(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8, mode="mor")
    runner.run(max_batches=1)
    ch = read_batch(spark, log, 0, 0, SchemaRegistry())
    assert mor_apply_batch(spark, runner.table, ch, 0) is None


def test_mixed_mode_resume(spark, tmp_path):
    """Snapshot format is mode-agnostic: MOR writer crashes, COW writer
    resumes the same table, state still equals the oracle."""
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    root = str(tmp_path / "t")
    first = CdcRunner(spark, log, root, n_buckets=8, mode="mor", compact_every=99)
    first.run(max_batches=4)
    second = CdcRunner(spark, log, root, n_buckets=8, mode="cow")
    second.run()
    actual = [r.asDict() for r in second.final_state().collect()]
    assert actual == replay(log)
