"""Driver-contract checks: entry() smoke + a DuckDB-oracle sample.

The full oracle sweep lives in scripts/selfcheck.py (all queries at
sf0.01); this test pins the contract shape and spot-checks a
representative query per module at sf0.001 so `pytest -x -q` stays fast.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from biomedica_etl_spark.sources.registry import TABLES

SF_DIR = "/root/testdata/sf0.001"

SAMPLE = [
    "lww_latest_event_per_user",
    "q1_pricing_summary",
    "quality_scores",
    "minhash_lsh_candidates",
    "cosine_topk",
    "multimodal_decode",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "user_id"


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # round 2: EVERY query has a DuckDB oracle, including the full CDC run
    # (its change log generates deterministically at a fixed path so the
    # SQL replay reads the same bytes)
    assert set(qs) == set(oracles)
    assert len(qs) >= 40


def _norm(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    return "NULL" if v is None else (repr(v) if isinstance(v, float) else str(v))


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_duckdb_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)

    def canon(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(_norm(r[i]) for i in order) for r in rows)

    assert canon(scols, srows) == canon(dcols, drows)
