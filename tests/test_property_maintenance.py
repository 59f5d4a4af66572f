"""Property-based maintenance interleaving: engine == oracle under ANY
sequence of maintenance ops between micro-batches.

Hypothesis draws a generator config AND an arbitrary interleaving of
maintenance operations (minor fold — local or shuffle plan — size-tiered
subset fold, major fold, bin-pack rewrite, or nothing) to run between consecutive batch applies. Whatever the
sequence, the final resolved table must equal the pure-Python replay
oracle — i.e. maintenance commits are invisible to readers by
construction, not just in the hand-picked unit scenarios. Examples are
capped small; each spins real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
from biomedica_etl_spark.cdc.merge import compact, compact_layers, rewrite_small_files
from biomedica_etl_spark.cdc.oracle import replay
from biomedica_etl_spark.cdc.runner import CdcRunner

configs = st.fixed_dictionaries(
    {
        "seed": st.integers(0, 2**31 - 1),
        "n_events": st.integers(1_000, 2_500),
        "n_convs": st.integers(10, 80),
        "update_frac": st.floats(0.0, 0.4),
        "delete_frac": st.floats(0.0, 0.25),
        "duplicate_frac": st.floats(0.0, 0.1),
        "batch_size": st.integers(600, 1_200),
        "zipf_a": st.sampled_from([0.0, 1.2]),
        "out_of_order": st.booleans(),
    }
)

OPS = st.lists(
    st.sampled_from(["none", "minor", "minor-shuffle", "tiered", "major",
                     "binpack"]),
    min_size=2, max_size=5,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cfg=configs, ops=OPS)
def test_any_maintenance_interleaving_preserves_state(
    spark, tmp_path_factory, cfg, ops
):
    d = tmp_path_factory.mktemp("propm")
    log = str(d / "log")
    generate_change_log(log, GeneratorConfig(**cfg))
    runner = CdcRunner(spark, log, str(d / "t"), n_buckets=8, mode="mor",
                       compact_every=10**9)
    i = 0
    while True:
        res = runner.run(max_batches=1)
        if not res.batches_applied:
            break
        op = ops[i % len(ops)]
        i += 1
        if op == "minor":
            compact_layers(spark, runner.table, min_layers=1)
        elif op == "minor-shuffle":
            compact_layers(spark, runner.table, min_layers=1,
                           plan="shuffle")
        elif op == "tiered":
            # tier cut INSIDE the live layer-size range so some folds
            # select true subsets; collapse bound occasionally triggers
            compact_layers(spark, runner.table, min_layers=1,
                           tier_max_bytes=8 << 10, tier_collapse_at=4)
        elif op == "major":
            compact(spark, runner.table)
        elif op == "binpack":
            rewrite_small_files(spark, runner.table,
                                target_file_bytes=1 << 20)
    actual = [r.asDict() for r in runner.final_state().collect()]
    assert actual == replay(log)
