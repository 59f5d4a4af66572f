"""Mid-stream schema evolution: 'tool' column added, turn_idx widened.

Reference analogue: Entrez enrichment adds fields to already-written records
(``scripts/05_json_to_entrez.py:324-328``)."""

from __future__ import annotations

from pyspark.sql import types as T

from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
from biomedica_etl_spark.cdc.runner import read_batch
from biomedica_etl_spark.cdc.schema import CHANGE_COLS, SchemaRegistry, align_to_target

from tests.conftest import run_and_compare

CFG = GeneratorConfig(
    n_events=6_000, batch_size=600, n_convs=80, schema_epoch_starts=(0.0, 0.3, 0.6)
)


def test_aligned_read_has_target_schema(spark, tmp_path):
    log = str(tmp_path / "log")
    meta = generate_change_log(log, CFG)
    reg = SchemaRegistry()
    frames = {
        epoch: read_batch(spark, log, b, epoch, reg)
        for b, epoch in meta.batch_schema.items()
    }
    assert set(frames) == {0, 1, 2}, "all three epochs present"
    schemas = {e: f.select(*CHANGE_COLS).schema for e, f in frames.items()}
    assert len({str(s) for s in schemas.values()}) == 1, "aligned schemas identical"
    s = schemas[0]
    assert s["turn_idx"].dataType == T.LongType()
    assert s["tool"].dataType == T.StringType()


def test_epoch0_tool_is_null_epoch1_populated(spark, tmp_path):
    log = str(tmp_path / "log")
    meta = generate_change_log(log, CFG)
    reg = SchemaRegistry()
    e0_batches = [b for b, e in meta.batch_schema.items() if e == 0]
    e1_batches = [b for b, e in meta.batch_schema.items() if e == 1]
    df0 = read_batch(spark, log, e0_batches[0], 0, reg)
    assert df0.filter(df0.tool.isNotNull()).count() == 0
    df1 = read_batch(spark, log, e1_batches[-1], 1, reg)
    assert df1.filter(df1.tool.isNotNull()).count() > 0


def test_evolution_end_to_end(spark, tmp_path):
    log = str(tmp_path / "log")
    generate_change_log(log, CFG)
    runner, _ = run_and_compare(spark, log, str(tmp_path / "table"))
    final = runner.final_state()
    assert final.schema["turn_idx"].dataType == T.LongType()
    # rows whose winning event predates the tool epoch must have NULL tool,
    # later winners may carry one
    assert final.filter(final.tool.isNotNull()).count() > 0


def test_align_passthrough_of_extra_columns(spark):
    df = spark.createDataFrame(
        [(1, "I", "c", 5, "user", "t", None)],
        "lsn long, op string, conv_id string, turn_idx int, role string, text string, extra string",
    )
    out = align_to_target(df)
    assert out.columns == [*CHANGE_COLS, "extra"]
    assert out.schema["turn_idx"].dataType == T.LongType()
