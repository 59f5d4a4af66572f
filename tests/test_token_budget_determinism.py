"""Regression pins for the round-4 driver hash mismatch on
``token_budget_shards`` (VERDICT r4, What's wrong #1): the query's result
must be a pure function of the input table — bit-identical across
shuffle-partition settings, across repeated runs in one session, and
unaffected by unrelated CDC work having run first in the same session
(the only environmental difference the round-4 driver had). The in-query
self-audit (two independent prefix-sum decompositions, assert-equal)
additionally turns any future divergence into a loud row-level diff."""

import hashlib
import os

import duckdb
import pytest

from biomedica_etl_spark.operators.sampling import (TOKEN_BUDGET_SQL,
                                                    token_budget_shards)

SF_DIR = "/root/testdata/sf0.001"


def _result_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.fixture(scope="module")
def oracle_hash():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF_DIR, 'documents.parquet')}')")
    rows = con.execute(TOKEN_BUDGET_SQL).fetchall()
    cols = [d[0] for d in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(str(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def test_invariant_across_shuffle_partitions(spark, oracle_hash):
    """Same hash at shuffle.partitions 3, 8, 32 — the physical partition
    count must never leak into the cumsum."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = set()
    try:
        for n in ("3", "8", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            hashes.add(_result_hash(token_budget_shards(spark, SF_DIR)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert hashes == {oracle_hash}


def test_stable_after_cdc_work_in_same_session(spark, tmp_path, oracle_hash):
    """The round-4 driver ran the 20-query CDC battery before this query
    in one session. Replicate the shape at unit scale: a full
    generate→apply→read CDC cycle first, then the sampling query — the
    hash must still equal the DuckDB oracle's."""
    from biomedica_etl_spark.cdc.generator import (GeneratorConfig,
                                                   generate_change_log)
    from biomedica_etl_spark.cdc.runner import CdcRunner

    log = str(tmp_path / "log")
    generate_change_log(log, GeneratorConfig(
        n_events=4_000, batch_size=1_000, duplicate_frac=0.05,
        out_of_order=True, zipf_a=1.2, n_convs=50))
    r = CdcRunner(spark, log, str(tmp_path / "t"), n_buckets=4,
                  mode="mor", compact_every=2)
    r.run()
    r.final_state().collect()  # actually execute the CDC read
    assert _result_hash(token_budget_shards(spark, SF_DIR)) == oracle_hash
