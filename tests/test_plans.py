"""Physical-plan guarantees of the merge paths.

The 100 TB design hinges on specific plan shapes (SURVEY.md §7.3, merge.py
module docstring): the aligned LWW reduce must cost exactly ONE exchange
with its output pre-partitioned by bucket, both merge plans must produce
identical table state, and the bucket-partitioned write must emit one file
per bucket. These tests pin those properties so a refactor can't silently
reintroduce a shuffle.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from biomedica_etl_spark.cdc.generator import SCENARIOS, generate_change_log
from biomedica_etl_spark.cdc.merge import _with_bucket
from biomedica_etl_spark.cdc.reduce import lww_reduce, lww_reduce_aligned
from biomedica_etl_spark.cdc.runner import CdcRunner, read_batch
from biomedica_etl_spark.cdc.schema import SchemaRegistry
from biomedica_etl_spark.cdc.table import BUCKET_COL

from tests.conftest import run_and_compare


def _gen(tmp_path, scenario="everything"):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS[scenario])
    return log


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aligned_reduce_is_single_exchange(spark, tmp_path):
    log = _gen(tmp_path)
    changes = read_batch(spark, log, 0, 0, SchemaRegistry())
    aligned = lww_reduce_aligned(_with_bucket(changes, 16), BUCKET_COL, 16)
    plan = _physical(aligned)
    assert plan.count("Exchange") == 1, plan
    # the classic groupBy-then-repartition pair costs two
    classic = lww_reduce(changes).withColumn(BUCKET_COL, F.lit(0)).repartition(
        16, F.col(BUCKET_COL)
    )
    assert _physical(classic).count("Exchange") == 2


def test_cow_plans_equivalent(spark, tmp_path):
    """aligned union-reduce COW merge == classic full-outer-join merge ==
    oracle, on the adversarial 'everything' log."""
    log = _gen(tmp_path)
    r_aligned, _ = run_and_compare(
        spark, log, str(tmp_path / "t_aligned"), mode="cow", plan="aligned"
    )
    r_classic, _ = run_and_compare(
        spark, log, str(tmp_path / "t_classic"), mode="cow", plan="classic"
    )
    a = [r.asDict() for r in r_aligned.final_state().collect()]
    c = [r.asDict() for r in r_classic.final_state().collect()]
    assert a == c


def test_mor_aligned_matches_oracle(spark, tmp_path):
    log = _gen(tmp_path)
    run_and_compare(
        spark, log, str(tmp_path / "t_mor"), mode="mor", plan="aligned",
        compact_every=3,
    )


def test_aligned_write_bounded_files_per_bucket(spark, tmp_path):
    """The aligned write emits at most ``shuffle_salts`` files per bucket
    straight from the reduce — no extra repartition, no file explosion."""
    log = _gen(tmp_path, "insert_only")
    runner = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8, mode="mor")
    runner.run(max_batches=1)
    snap = runner.table.current_snapshot()
    assert snap["delta_dirs"], "expected a delta layer"
    for dirs in snap["delta_dirs"].values():
        for d in dirs:
            files = glob.glob(os.path.join(runner.table.root, d, "*.parquet"))
            assert 1 <= len(files) <= 4, files


def test_salted_runner_matches_oracle(spark, tmp_path):
    log = _gen(tmp_path, "skew_hot")
    run_and_compare(spark, log, str(tmp_path / "t_salt"), salted=True, n_salts=4)
