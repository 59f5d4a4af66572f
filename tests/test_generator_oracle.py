"""Generator + oracle invariants (no Spark needed)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
from biomedica_etl_spark.cdc.oracle import replay

SMALL = GeneratorConfig(n_events=3_000, batch_size=500, n_convs=50)


def test_generator_deterministic(tmp_path):
    m1 = generate_change_log(str(tmp_path / "a"), SMALL)
    m2 = generate_change_log(str(tmp_path / "b"), SMALL)
    assert m1.n_batches == m2.n_batches
    assert replay(str(tmp_path / "a")) == replay(str(tmp_path / "b"))


def test_schema_epochs_on_disk(tmp_path):
    cfg = GeneratorConfig(
        n_events=4_000, batch_size=400, schema_epoch_starts=(0.0, 0.3, 0.6)
    )
    generate_change_log(str(tmp_path / "log"), cfg)
    epoch_dirs = sorted(glob.glob(str(tmp_path / "log" / "schema_id=*")))
    assert [os.path.basename(d) for d in epoch_dirs] == [
        "schema_id=0", "schema_id=1", "schema_id=2",
    ]
    f0 = glob.glob(str(tmp_path / "log" / "schema_id=0" / "batch_id=*" / "*.parquet"))[0]
    f1 = glob.glob(str(tmp_path / "log" / "schema_id=1" / "batch_id=*" / "*.parquet"))[0]
    f2 = glob.glob(str(tmp_path / "log" / "schema_id=2" / "batch_id=*" / "*.parquet"))[0]
    s0, s1, s2 = (pq.read_schema(f) for f in (f0, f1, f2))
    assert "tool" not in s0.names and "tool" in s1.names and "tool" in s2.names
    assert str(s1.field("turn_idx").type) == "int32"
    assert str(s2.field("turn_idx").type) == "int64"  # widened


def test_oracle_lww_semantics(tmp_path):
    cfg = GeneratorConfig(n_events=3_000, batch_size=500, update_frac=0.4, delete_frac=0.1)
    generate_change_log(str(tmp_path / "log"), cfg)
    rows = replay(str(tmp_path / "log"))
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys), "oracle output must be (conv_id, turn_idx)-ordered"
    assert len(keys) == len(set(keys)), "one row per key"


def test_duplicates_are_verbatim(tmp_path):
    cfg = GeneratorConfig(n_events=3_000, batch_size=300, duplicate_frac=0.1,
                          schema_epoch_starts=(0.0, 0.3, 0.6))
    generate_change_log(str(tmp_path / "log"), cfg)
    from biomedica_etl_spark.cdc.oracle import _read_all_events

    rows = _read_all_events(str(tmp_path / "log"))
    by_lsn: dict[int, set] = {}
    for r in rows:
        frozen = tuple(sorted((k, str(v)) for k, v in r.items() if k != "batch_id"))
        by_lsn.setdefault(r["lsn"], set()).add(frozen)
    dup_lsns = [l for l, s in by_lsn.items() if len(s) > 1]
    assert dup_lsns == [], f"same lsn with differing payloads: {dup_lsns[:3]}"
    assert len(rows) > len(by_lsn), "duplicates should exist"
