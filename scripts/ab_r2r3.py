"""Pinned interleaved A/B: round-2 code vs round-3+ code, same host phase.

Adjudicates the r2->r3 driver-bench regression on the LSH/nested/json
queries (VERDICT r3 "What's wrong" #5): BENCH_r03.json showed
minhash_lsh_candidates +50% and minhash_lsh_full +34% vs BENCH_r02.json,
while same-host measurements during round 3 showed the restructured
single-shuffle LSH ~40% FASTER. The driver's rounds run days apart on a
host whose deliverable CPU swings several-fold (hypervisor steal), so the
two numbers may both be honest measurements of different host weather.
This script removes the weather variable: both code versions run
INTERLEAVED (A,B,A,B,...) in ONE process/JVM within one host phase,
best-of-N per query per version, steal%% sampled per attempt.

Method notes:
- The four queries are pure JVM-expression plans (no pandas UDF / Python
  worker), so hot-swapping the `biomedica_etl_spark` modules between
  attempts cannot desynchronize driver and executor code.
- One SparkSession for the whole run: both versions share JIT/codegen
  warm-up state symmetrically (each version gets an untimed warm pass).
- The r2 tree comes from `git worktree add --detach <dir> <r2-commit>`;
  pass it as argv[1] (default /tmp/ab_r2).

Writes BENCH/AB_R2R3.md and prints one JSON line.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

R3 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R2 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_r2"
QUERIES = ["minhash_lsh_candidates", "minhash_lsh_full",
           "nested_assemble", "json_roundtrip"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "4"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
HOST_CPUS = os.cpu_count() or 32


def _steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _purge() -> None:
    for m in list(sys.modules):
        if m.startswith("biomedica_etl_spark") or m == "__spark_entry__":
            del sys.modules[m]


def _load(root: str):
    _purge()
    sys.path[:] = [p for p in sys.path if p not in (R2, R3)]
    sys.path.insert(0, root)
    entry = importlib.import_module("__spark_entry__")
    got = os.path.realpath(entry.__file__)
    want = os.path.realpath(root)
    assert got.startswith(want + os.sep), (got, want)
    return entry


def main() -> None:
    sys.path.insert(0, R3)
    from biomedica_etl_spark.session import get_spark

    spark = get_spark(app_name="ab-r2r3", cores=CPUS,
                      shuffle_partitions=CPUS)
    versions = {"r3": R3, "r2": R2}
    # untimed warm pass per version (JIT/codegen compile per plan shape)
    for tag, root in versions.items():
        qs = _load(root).queries()
        for q in QUERIES:
            qs[q](spark, SF_DIR).collect()
        # r2's LSH plan persist()s its signature frame; a cache surviving
        # across attempts would flatter whichever version caches. Every
        # sweep starts cold on the Spark cache (OS page cache on the
        # parquet inputs stays warm for both versions symmetrically).
        spark.catalog.clearCache()
    results: dict[str, dict[str, list[float]]] = {
        t: {q: [] for q in QUERIES} for t in versions
    }
    steals: list[dict[str, float]] = []
    for rep in range(REPEATS):
        rec: dict[str, float] = {}
        for tag, root in versions.items():
            qs = _load(root).queries()
            s0, t0 = _steal_ticks(), time.time()
            for q in QUERIES:
                q0 = time.time()
                qs[q](spark, SF_DIR).collect()
                results[tag][q].append(round(time.time() - q0, 3))
            rec[tag] = round((_steal_ticks() - s0) / max(
                (time.time() - t0) * 100 * HOST_CPUS, 1) * 100, 1)
            spark.catalog.clearCache()  # see warm-pass note
        steals.append(rec)
        print(f"rep {rep}: " + " ".join(
            f"{t}={sum(results[t][q][-1] for q in QUERIES):.2f}s"
            f"(steal {rec[t]}%)" for t in versions), file=sys.stderr)
    best = {t: {q: min(v) for q, v in results[t].items()} for t in versions}
    ratio = {q: round(best["r3"][q] / best["r2"][q], 3) for q in QUERIES}
    out = {"metric": "ab_r2_vs_r3_best_of_n", "unit": "sec", "sf": SF_DIR,
           "repeats": REPEATS, "cpus": CPUS, "best": best, "ratio_r3_over_r2": ratio,
           "attempts": results, "steal_pct": steals}
    print(json.dumps(out))
    _write_md(out)
    spark.stop()


def _write_md(out: dict) -> None:
    lines = [
        "# A/B: round-2 code vs round-3+ code (same host phase)",
        "",
        "Adjudication of VERDICT r3 'What's wrong' #5 — the driver bench",
        "showed the common LSH/nested/json queries regressing r2->r3 while",
        "same-host measurements showed the opposite. Both code versions run",
        "interleaved in ONE JVM within one host phase (method in",
        "`scripts/ab_r2r3.py`), so host weather cancels.",
        "",
        f"sf dir `{out['sf']}`, local[{out['cpus']}], "
        f"best of {out['repeats']} interleaved reps.",
        "",
        "| query | r2 best (s) | r3 best (s) | r3/r2 |",
        "|---|---|---|---|",
    ]
    for q in QUERIES:
        lines.append(f"| {q} | {out['best']['r2'][q]} | {out['best']['r3'][q]} "
                     f"| {out['ratio_r3_over_r2'][q]} |")
    lines += ["", "Attempt lists (nothing discarded):", "```json",
              json.dumps({"attempts": out["attempts"],
                          "steal_pct": out["steal_pct"]}, indent=1),
              "```", ""]
    with open(os.path.join(R3, "BENCH", "AB_R2R3.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
