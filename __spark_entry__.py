"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC LWW apply on sf0.001.
``queries()`` exposes every implemented operator (SURVEY.md §2 + the
training-data ops); ``oracle_sql()`` gives the DuckDB twin for each —
column names/aliases match exactly on both sides. Non-SQL-expressible
entries (the full CDC engine run) have no oracle and get the driver's
rows-only check.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from biomedica_etl_spark.functions import text as _text
from biomedica_etl_spark.operators import dedup as _dedup
from biomedica_etl_spark.operators import multimodal as _multimodal
from biomedica_etl_spark.operators import relational as _relational
from biomedica_etl_spark.operators import similarity as _similarity

_ALL_MODULES = (_relational, _text, _dedup, _similarity, _multimodal)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: max-LSN last-writer-wins apply on the events change stream."""
    return _relational.lww_latest_event_per_user(spark, "/root/testdata/sf0.001")


def _cdc_apply_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full engine as a query: synthesize a deterministic change log,
    apply it in micro-batches (LWW reduce -> COW merge -> exactly-once
    commits), return the final transcripts table. No SQL oracle — the
    pure-Python replay oracle asserts equality in tests/."""
    from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
    from biomedica_etl_spark.cdc.runner import CdcRunner

    work = tempfile.mkdtemp(prefix="cdc-entry-")
    log = os.path.join(work, "log")
    generate_change_log(
        log,
        GeneratorConfig(n_events=5_000, batch_size=1_000, n_convs=50, zipf_a=1.2,
                        duplicate_frac=0.02, out_of_order=True),
    )
    runner = CdcRunner(spark, log, os.path.join(work, "table"), n_buckets=8)
    runner.run()
    return runner.final_state()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _ALL_MODULES:
        for name, (fn, _sql) in mod.QUERIES.items():
            out[name] = fn
    out["cdc_apply_end_to_end"] = _cdc_apply_end_to_end
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _ALL_MODULES:
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
