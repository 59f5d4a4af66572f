"""Quarantine path: corrupt events (unknown op, negative turn_idx) are
routed to the _quarantine sink, never applied and never fatal — and the
final table still equals the oracle (which skips them identically).
Reference analogue: error-row logs instead of batch abort
(``src/pmc_oa/download_batch.py:123-139``)."""

from __future__ import annotations

import os

import pytest

from biomedica_etl_spark.cdc.generator import SCENARIOS, generate_change_log

from tests.conftest import run_and_compare


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_corrupt_events_quarantined_and_state_matches_oracle(spark, tmp_path, mode):
    log = str(tmp_path / "log")
    meta = generate_change_log(log, SCENARIOS["corrupt"])
    runner, _ = run_and_compare(spark, log, str(tmp_path / "t"), mode=mode)

    q = spark.read.parquet(runner.quarantine_dir)
    n_q = q.count()
    expected_bad = int(meta.n_events * 0.05)
    assert n_q == expected_bad, (n_q, expected_bad)
    # every quarantined row really is invalid
    from pyspark.sql import functions as F

    bad = q.filter(
        F.col("op").isin("I", "U", "D") & (F.col("turn_idx") >= 0)
        & F.col("conv_id").isNotNull()
    ).count()
    assert bad == 0
    # summaries account for them
    total = sum(
        s["summary"].get("rows_quarantined", 0) for s in runner.table.snapshots()
    )
    assert total == expected_bad


def test_clean_batch_writes_no_quarantine(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    runner, _ = run_and_compare(spark, log, str(tmp_path / "t"))
    assert not os.path.exists(runner.quarantine_dir)
