from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biomedica_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="biomedica-etl-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


def run_and_compare(spark, log_dir: str, table_root: str, n_buckets: int = 8, **runner_kw):
    """Apply the full log with CdcRunner and assert equality vs the oracle."""
    from biomedica_etl_spark.cdc.oracle import replay
    from biomedica_etl_spark.cdc.runner import CdcRunner

    runner = CdcRunner(spark, log_dir, table_root, n_buckets=n_buckets, **runner_kw)
    result = runner.run()
    actual = [r.asDict() for r in runner.final_state().collect()]
    expected = replay(log_dir)
    assert len(actual) == len(expected), (len(actual), len(expected))
    for a, e in zip(actual, expected):
        assert a == e, f"row mismatch:\nactual:   {a}\nexpected: {e}"
    return runner, result
