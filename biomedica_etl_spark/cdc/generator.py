"""Deterministic synthetic change-log generator.

Plays the role of the reference's driving manifest: the batched file list
that every stage iterates over (reference ``scripts/01_download_filelists.py:34-46``,
``src/pmc_oa/download_batch.py:320-369`` — contiguous-range batching). Here
the "manifest" is a WAL/binlog tail: one parquet directory per
``(schema_id, batch_id)`` so Spark's partition discovery gives free
batch/epoch pruning when the apply loop reads one micro-batch.

Everything is seeded numpy — no wall clock, no per-row Python in the hot
path — so the same config always produces a byte-identical log and the
pure-Python oracle (oracle.py) can define expected final state.

Layout::

    out_dir/
      _meta.json
      schema_id=0/batch_id=0/part-00000.parquet
      schema_id=0/batch_id=1/part-00000.parquet
      schema_id=1/batch_id=2/...          # 'tool' column appears
      schema_id=2/batch_id=5/...          # turn_idx widened int32->int64
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"])
TS_BASE_US = np.datetime64("2025-01-01T00:00:00", "us").astype("int64")


@dataclass(frozen=True)
class GeneratorConfig:
    seed: int = 42
    n_events: int = 100_000
    n_convs: int = 1_000
    update_frac: float = 0.25
    delete_frac: float = 0.05
    # fraction of updates/deletes that target keys never inserted
    absent_key_frac: float = 0.0
    # fraction of events duplicated verbatim (same (conv,turn,lsn))
    duplicate_frac: float = 0.0
    batch_size: int = 20_000
    # 0 = uniform conversation popularity; >0 = zipf-ish skew exponent
    zipf_a: float = 0.0
    # permute row order within batches + move ~2% of rows to adjacent batch
    out_of_order: bool = False
    # tail of batch k replayed inside batch k+1 (same lsns)
    overlap_batches: bool = False
    # fraction of events corrupted in-flight (bad op code / negative
    # turn_idx) — must be quarantined, never applied and never fatal
    corrupt_frac: float = 0.0
    # fractions of the batch axis where schema epochs 0/1/2 begin
    schema_epoch_starts: tuple[float, ...] = (0.0, 0.4, 0.7)
    avg_text_len: int = 120
    filler_word: str = " lorem"
    # WAL-segment file sizing: a batch is many small-ish files (like real
    # binlog segments), so Spark gets file-level scan parallelism; row
    # groups sized so one file never collapses into a single split
    rows_per_file: int = 50_000
    row_group_size: int = 25_000


@dataclass
class GeneratedLog:
    out_dir: str
    n_events: int
    n_rows_written: int
    n_batches: int
    batch_schema: dict[int, int] = field(default_factory=dict)  # batch_id -> schema_id


def _conv_weights(cfg: GeneratorConfig) -> np.ndarray | None:
    if cfg.zipf_a <= 0:
        return None
    w = 1.0 / np.power(np.arange(1, cfg.n_convs + 1, dtype="float64"), cfg.zipf_a)
    return w / w.sum()


def _cumcount(values: np.ndarray) -> np.ndarray:
    """Per-element running count of prior occurrences of the same value."""
    order = np.argsort(values, kind="stable")
    sorted_v = values[order]
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype="int64")
    starts = np.r_[0, np.flatnonzero(sorted_v[1:] != sorted_v[:-1]) + 1]
    lens = np.diff(np.r_[starts, n])
    cum_sorted = np.arange(n, dtype="int64") - np.repeat(starts, lens)
    out = np.empty(n, dtype="int64")
    out[order] = cum_sorted
    return out


def generate_change_log(out_dir: str, cfg: GeneratorConfig) -> GeneratedLog:
    rng = np.random.default_rng(cfg.seed)
    n_upd = int(cfg.n_events * cfg.update_frac)
    n_del = int(cfg.n_events * cfg.delete_frac)
    n_ins = cfg.n_events - n_upd - n_del
    if n_ins <= 0:
        raise ValueError("update_frac + delete_frac must leave room for inserts")

    weights = _conv_weights(cfg)
    conv_ins = rng.choice(cfg.n_convs, size=n_ins, p=weights).astype("int64")
    turn_ins = _cumcount(conv_ins)
    key_ins = np.arange(n_ins, dtype="float64")  # stream position of each insert

    def _targets(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        idx = rng.integers(0, n_ins, size=n)
        conv, turn = conv_ins[idx].copy(), turn_ins[idx].copy()
        key = idx + (n_ins - idx) * rng.random(n)  # strictly after the insert
        if cfg.absent_key_frac > 0 and n > 0:
            m = rng.random(n) < cfg.absent_key_frac
            turn[m] = turn[m] + 1_000_000  # key space never inserted
        return conv, turn, key

    conv_u, turn_u, key_u = _targets(n_upd)
    conv_d, turn_d, key_d = _targets(n_del)

    op = np.concatenate(
        [np.zeros(n_ins, "int8"), np.ones(n_upd, "int8"), np.full(n_del, 2, "int8")]
    )
    conv = np.concatenate([conv_ins, conv_u, conv_d])
    turn = np.concatenate([turn_ins, turn_u, turn_d])
    key = np.concatenate([key_ins, key_u, key_d])

    order = np.argsort(key, kind="stable")
    op, conv, turn = op[order], conv[order], turn[order]
    n = len(op)
    if cfg.corrupt_frac > 0:
        m = rng.choice(n, size=int(n * cfg.corrupt_frac), replace=False)
        half = len(m) // 2
        op = op.copy(); turn = turn.copy()
        op[m[:half]] = 3                      # unknown op code 'X'
        turn[m[half:]] = -turn[m[half:]] - 1  # impossible turn index
    lsn = np.arange(n, dtype="int64")
    batch_id = lsn // cfg.batch_size

    # role / tool / ts / text — all payload fields are deterministic in
    # (conv, turn, lsn) so the oracle and the engine agree byte-for-byte.
    role_idx = rng.integers(0, len(ROLES), size=n)
    is_del = op == 2

    n_batches = int(batch_id.max()) + 1
    epoch_start_batches = np.array(
        [math.floor(fr * n_batches) for fr in cfg.schema_epoch_starts], dtype="int64"
    )
    schema_of_batch = np.searchsorted(epoch_start_batches, np.arange(n_batches), side="right") - 1
    schema_id = schema_of_batch[batch_id]

    tool_roll = rng.random(n)
    has_tool = (schema_id >= 1) & (role_idx == 1) & (tool_roll < 0.5) & ~is_del
    tool_num = rng.integers(0, 20, size=n)

    text_pad = np.maximum(
        0,
        rng.normal(cfg.avg_text_len, cfg.avg_text_len / 3, size=n).astype("int64")
        // max(len(cfg.filler_word), 1),
    )
    ts_us = TS_BASE_US + lsn * 1_000_000

    # duplicates: verbatim copies, same lsn; half land in the same batch,
    # half in the next (cross-batch duplicate => idempotence must hold).
    extra_idx = np.zeros(0, dtype="int64")
    extra_batch = np.zeros(0, dtype="int64")
    if cfg.duplicate_frac > 0:
        m = int(n * cfg.duplicate_frac)
        extra_idx = rng.choice(n, size=m, replace=False)
        bump = (rng.random(m) < 0.5).astype("int64")
        extra_batch = np.minimum(batch_id[extra_idx] + bump, n_batches - 1)
    if cfg.overlap_batches and n_batches > 1:
        tail = max(1, cfg.batch_size // 100)
        for b in range(n_batches - 1):
            rows = np.flatnonzero(batch_id == b)[-tail:]
            extra_idx = np.concatenate([extra_idx, rows])
            extra_batch = np.concatenate([extra_batch, np.full(len(rows), b + 1, "int64")])
    if len(extra_idx) > 0:
        # a duplicated event must be verbatim — keep it inside its original
        # schema epoch so the same lsn never appears with two payload shapes
        cross_epoch = schema_of_batch[extra_batch] != schema_of_batch[batch_id[extra_idx]]
        extra_batch = np.where(cross_epoch, batch_id[extra_idx], extra_batch)

    if cfg.out_of_order and n_batches > 1:
        m = rng.random(n) < 0.02
        shift = rng.choice(np.array([-1, 1]), size=int(m.sum()))
        moved = np.clip(batch_id[m] + shift, 0, n_batches - 1)
        # only move within the same schema epoch (a moved event must stay
        # verbatim; see the duplicate-placement rule above)
        same_epoch = schema_of_batch[moved] == schema_of_batch[batch_id[m]]
        batch_id = batch_id.copy()
        batch_id[np.flatnonzero(m)[same_epoch]] = moved[same_epoch]
        schema_id = schema_of_batch[batch_id]

    all_idx = np.concatenate([np.arange(n), extra_idx])
    all_batch = np.concatenate([batch_id, extra_batch])
    all_schema = schema_of_batch[all_batch]

    filler = cfg.filler_word
    meta = GeneratedLog(
        out_dir=out_dir, n_events=n, n_rows_written=len(all_idx), n_batches=n_batches
    )
    os.makedirs(out_dir, exist_ok=True)

    # small lookup tables so per-row formatting never runs Python per event
    conv_pad = np.array([f"{i:06d}" for i in range(cfg.n_convs)])
    tool_names = np.array([f"tool-{i}" for i in range(20)])
    null_str = pa.scalar(None, pa.string())

    for b in range(n_batches):
        rows = np.flatnonzero(all_batch == b)
        if cfg.out_of_order:
            rows = rng.permutation(rows)
        src = all_idx[rows]
        epoch = int(schema_of_batch[b])
        meta.batch_schema[b] = epoch

        del_mask = pa.array(is_del[src])
        conv_str = pa.array(conv_pad[conv[src]])
        b_turn = turn[src]
        turn_str = pc.cast(pa.array(b_turn), pa.string())
        lsn_str = pc.cast(pa.array(lsn[src]), pa.string())
        head = pc.binary_join_element_wise(
            "c", conv_str, "-t", turn_str, "-l", lsn_str, ":", ""
        )
        pad = pc.binary_repeat(
            pa.array(np.full(len(src), filler)), pa.array(text_pad[src], pa.int32())
        )
        b_text = pc.if_else(
            del_mask, null_str, pc.binary_join_element_wise(head, pad, "")
        )
        b_role = pc.if_else(del_mask, null_str, pa.array(ROLES[role_idx[src]]))
        arrays: dict[str, pa.Array] = {
            "lsn": pa.array(lsn[src], pa.int64()),
            "op": pa.array(np.take(np.array(["I", "U", "D", "X"]), op[src])),
            "conv_id": pc.binary_join_element_wise("conv-", conv_str, ""),
            "turn_idx": pa.array(b_turn, pa.int64() if epoch >= 2 else pa.int32()),
            "role": b_role,
            "text": b_text,
        }
        if epoch >= 1:
            arrays["tool"] = pc.if_else(
                pa.array(has_tool[src]), pa.array(tool_names[tool_num[src]]), null_str
            )
        arrays["ts"] = pa.array(ts_us[src], pa.timestamp("us"))
        table = pa.table(arrays)
        d = os.path.join(out_dir, f"schema_id={epoch}", f"batch_id={b}")
        os.makedirs(d, exist_ok=True)
        for fi, lo in enumerate(range(0, max(table.num_rows, 1), cfg.rows_per_file)):
            chunk = table.slice(lo, cfg.rows_per_file)
            pq.write_table(
                chunk,
                os.path.join(d, f"part-{fi:05d}.parquet"),
                row_group_size=cfg.row_group_size,
            )

    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump(
            {
                "config": asdict(cfg),
                "n_events": meta.n_events,
                "n_rows_written": meta.n_rows_written,
                "n_batches": meta.n_batches,
                "batch_schema": meta.batch_schema,
            },
            f,
            indent=2,
            default=str,
        )
    return meta


SCENARIOS: dict[str, GeneratorConfig] = {
    "insert_only": GeneratorConfig(n_events=20_000, update_frac=0.0, delete_frac=0.0,
                                   batch_size=5_000),
    "update_delete_mix": GeneratorConfig(n_events=20_000, batch_size=5_000),
    "duplicates": GeneratorConfig(n_events=20_000, batch_size=5_000, duplicate_frac=0.05),
    "out_of_order": GeneratorConfig(n_events=20_000, batch_size=5_000, out_of_order=True),
    "absent_keys": GeneratorConfig(n_events=20_000, batch_size=5_000, absent_key_frac=0.2),
    "schema_evolution": GeneratorConfig(n_events=20_000, batch_size=2_000,
                                        schema_epoch_starts=(0.0, 0.3, 0.6)),
    "replay_overlap": GeneratorConfig(n_events=20_000, batch_size=5_000, overlap_batches=True),
    "skew_hot": GeneratorConfig(n_events=40_000, batch_size=10_000, zipf_a=1.4, n_convs=200),
    "corrupt": GeneratorConfig(n_events=20_000, batch_size=5_000, corrupt_frac=0.05),
    "everything": GeneratorConfig(n_events=50_000, batch_size=5_000, duplicate_frac=0.03,
                                  out_of_order=True, absent_key_frac=0.05,
                                  overlap_batches=True, zipf_a=1.2),
}
