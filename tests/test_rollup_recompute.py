"""RollupTable(track_max_ts=True): non-retractable continuous aggregate
maintained by affected-group recompute.

The case a diff-fold cannot handle: deleting a conversation's NEWEST turn
must LOWER its max_ts — only recomputing the group can produce that. The
recompute is pruned to the affected buckets + groups, pinned here by the
reported buckets_scanned being a strict subset when few groups change.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biomedica_etl_spark.cdc.generator import SCENARIOS, generate_change_log
from biomedica_etl_spark.cdc.rollup import RollupTable
from biomedica_etl_spark.cdc.runner import CdcRunner


def _canon(df):
    return sorted((x["conv_id"], x["n_turns"], x["max_ts"])
                  for x in df.collect())


def _expected(spark, table):
    return table.read(spark).groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"), F.max("ts").alias("max_ts"))


def test_rollup_max_ts_matches_full_recompute(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    r = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8, mode="mor",
                  compact_every=10_000)
    roll = RollupTable(str(tmp_path / "rollup"), track_max_ts=True)

    r.run(max_batches=2)
    assert roll.refresh(spark, r.table)["mode"] == "bootstrap"
    r.run()
    res = roll.refresh(spark, r.table)
    assert res["mode"] == "incremental-recompute"
    assert _canon(roll.read(spark)) == _canon(_expected(spark, r.table))
    # idempotent at head
    assert roll.refresh(spark, r.table)["refreshed"] is False


def test_rollup_max_ts_lowers_on_newest_turn_delete(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    r = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8, mode="mor",
                  compact_every=10_000)
    r.run()
    roll = RollupTable(str(tmp_path / "rollup"), track_max_ts=True)
    roll.refresh(spark, r.table)

    # pick a conversation with >=2 live turns and delete its NEWEST turn
    victim = (r.table.read(spark)
              .groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
              .filter("n >= 2").orderBy("conv_id").first()["conv_id"])
    newest = (r.table.read(spark).filter(F.col("conv_id") == victim)
              .orderBy(F.col("ts").desc_nulls_last()).first())
    old_max = newest["ts"]
    r.delete_where(f"conv_id = '{victim}' AND turn_idx = {newest['turn_idx']}")

    res = roll.refresh(spark, r.table)
    assert res["mode"] == "incremental-recompute"
    # only the victim's bucket was scanned
    assert res["buckets_scanned"] == 1
    assert _canon(roll.read(spark)) == _canon(_expected(spark, r.table))
    # the view's max_ts equals the surviving turns' true max (which a
    # diff-fold could never lower; ties on ts keep it equal, else lower)
    new_row = next(x for x in roll.read(spark).collect()
                   if x["conv_id"] == victim)
    true_max = (r.table.read(spark).filter(F.col("conv_id") == victim)
                .agg(F.max("ts").alias("m")).first()["m"])
    assert new_row["max_ts"] == true_max
    if old_max is not None and true_max is not None:
        assert true_max <= old_max


def test_rollup_group_vanishes_when_fully_deleted(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    r = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8, mode="mor",
                  compact_every=10_000)
    r.run()
    roll = RollupTable(str(tmp_path / "rollup"), track_max_ts=True)
    roll.refresh(spark, r.table)

    victim = r.table.read(spark).orderBy("conv_id").first()["conv_id"]
    r.delete_where(f"conv_id = '{victim}'")
    roll.refresh(spark, r.table)
    assert all(x["conv_id"] != victim for x in roll.read(spark).collect())
    assert _canon(roll.read(spark)) == _canon(_expected(spark, r.table))


def test_rollup_rides_feed_and_falls_back_across_compaction(spark, tmp_path):
    """Steady-state refreshes consume the O(changes) image feed (keys +
    change type only); a major compaction inside the window trips the
    feed's resync contract and the refresh transparently falls back to
    the semantic diff — same state either way."""
    from biomedica_etl_spark.cdc.merge import compact

    log = str(tmp_path / "log")
    generate_change_log(log, SCENARIOS["update_delete_mix"])
    r = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=8, mode="mor",
                  compact_every=10_000)
    def canon(df):
        return sorted((x["conv_id"], x["n_turns"]) for x in df.collect())

    def truth():
        return canon(r.table.read(spark).groupBy("conv_id")
                     .agg(F.count(F.lit(1)).alias("n_turns")))

    r.run(max_batches=1)
    roll = RollupTable(str(tmp_path / "rollup"))
    roll.refresh(spark, r.table)  # bootstrap

    r.run(max_batches=1)
    res = roll.refresh(spark, r.table)
    assert res["mode"] == "incremental"
    assert res["source"] == "feed"
    assert canon(roll.read(spark)) == truth()

    r.run()
    compact(spark, r.table)  # base rewrite inside the next window
    res = roll.refresh(spark, r.table)
    assert res["source"] == "diff"
    assert canon(roll.read(spark)) == truth()
