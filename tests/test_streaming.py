"""Structured-Streaming front-end: stream apply == oracle, restart no-op."""

from __future__ import annotations

from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
from biomedica_etl_spark.cdc.oracle import replay
from biomedica_etl_spark.cdc.table import CowTable
from biomedica_etl_spark.streaming import stream_apply

CFG = GeneratorConfig(
    n_events=6_000, batch_size=600, n_convs=80, duplicate_frac=0.03,
    out_of_order=True, zipf_a=1.2, schema_epoch_starts=(0.0, 0.3, 0.6),
)


def test_stream_apply_matches_oracle_and_restart_is_noop(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    table_root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")

    q = stream_apply(spark, log, table_root, ckpt, n_buckets=8,
                     mode="mor", compact_every=3, max_files_per_trigger=4)
    assert q.awaitTermination(300), "stream did not drain in time"

    table = CowTable(table_root)
    actual = [
        r.asDict()
        for r in table.read(spark).orderBy("conv_id", "turn_idx").collect()
    ]
    assert actual == replay(log)
    n_snaps = len(table.snapshots())

    # restart on the same checkpoint: no new input -> no new commits
    q2 = stream_apply(spark, log, table_root, ckpt, n_buckets=8, mode="mor")
    assert q2.awaitTermination(120)
    assert len(table.snapshots()) == n_snaps
