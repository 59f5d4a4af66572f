"""Real multi-executor scaling evidence: N vs 4N EXECUTORS on a local
Spark standalone cluster, driven end-to-end via ``spark-submit --py-files``.

The north rule asks for the same ingest job at two cluster sizes (N and 4N
executors) with throughput scaling efficiency >= 0.8. ``bench.py
--scaling`` evidences this with local[4] vs local[16] *threads in one JVM*;
this script closes the remaining distance to the literal criterion inside
the sandbox: a standalone master plus four 4-core worker JVMs run on this
host, and the SAME packaged application (``dist/biomedica_etl_spark.zip``)
is submitted at ``spark.cores.max=4`` (ONE 4-core executor) and ``=16``
(FOUR 4-core executors, one per worker). Executors are separate JVMs with
real serialized shuffle over the network stack — everything short of
physically separate machines.

Method mirrors ``bench.scaling_main``: attempts at the two sizes are
INTERLEAVED to decorrelate the sandbox host's CPU-delivery drift, the best
wall per size is kept with all attempts published, steal%% is sampled from
/proc/stat per attempt, and an inline pure-CPU microbenchmark pins the
hardware's own 4->16-proc scaling ceiling for normalization. Warm-up and
timing happen INSIDE the submitted job (``cluster_apply_job.py``), so
spark-submit/JVM startup is excluded.

Caveat stated on the tin: all worker JVMs share one overcommitted VM, so
4x executors does NOT bring 4x hardware here the way 4x cluster nodes
would — the normalized efficiency (vs the measured hardware ceiling) is
the number that transfers to a real fleet.

Usage: python scripts/cluster_scaling.py  (manages the cluster lifecycle
itself; REPEATS/EVENTS/BATCHES env-tunable; appends to BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER = "spark://127.0.0.1:7077"
REPEATS = int(os.environ.get("REPEATS", "4"))
EVENTS = int(os.environ.get("SPARK_GRAFT_SCALING_EVENTS", "32000000"))
BATCHES = int(os.environ.get("SPARK_GRAFT_SCALING_BATCHES", "2"))
N_WORKERS = 4
WORKER_CORES = 4
LO, HI = WORKER_CORES, N_WORKERS * WORKER_CORES  # cores.max per level


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        return s.connect_ex(("127.0.0.1", port)) == 0


def _sbin(script: str, *args: str, ident: str | None = None) -> None:
    env = dict(os.environ,
               SPARK_MASTER_HOST="127.0.0.1",
               SPARK_LOG_DIR="/tmp/spark-logs",
               SPARK_PID_DIR="/tmp/spark-pids",
               SPARK_WORKER_DIR="/tmp/spark-worker",
               SPARK_LOCAL_DIRS="/dev/shm/spark-graft-local")
    if ident:
        env["SPARK_IDENT_STRING"] = ident
    subprocess.run([os.path.join(SPARK_HOME, "sbin", script), *args],
                   check=True, env=env, capture_output=True)


def start_cluster() -> bool:
    """Start master + N_WORKERS 4-core workers; no-op if already up.
    Returns True if this process started the cluster (and should stop it)."""
    if _port_open(7077):
        return False
    os.makedirs("/dev/shm/spark-graft-local", exist_ok=True)
    _sbin("start-master.sh", "--host", "127.0.0.1", "--port", "7077",
          "--webui-port", "8090")
    for i in range(1, N_WORKERS + 1):
        _sbin("start-worker.sh", MASTER, "--host", "127.0.0.1",
              "--cores", str(WORKER_CORES), "--memory", "12g",
              "--webui-port", str(8100 + i), ident=f"w{i}")
    deadline = time.time() + 30
    while time.time() < deadline and not _port_open(7077):
        time.sleep(0.5)
    time.sleep(3)  # worker registration
    return True


def stop_cluster() -> None:
    for i in range(1, N_WORKERS + 1):
        try:
            _sbin("stop-worker.sh", ident=f"w{i}")
        except subprocess.CalledProcessError:
            pass
    try:
        _sbin("stop-master.sh")
    except subprocess.CalledProcessError:
        pass


def submit_attempt(cores_max: int, log: str, warm_log: str,
                   table_root: str) -> dict:
    cmd = [
        os.path.join(SPARK_HOME, "bin", "spark-submit"),
        "--master", MASTER,
        "--deploy-mode", "client",
        "--driver-memory", "10g",
        "--conf", f"spark.cores.max={cores_max}",
        "--conf", f"spark.executor.cores={WORKER_CORES}",
        "--conf", "spark.executor.memory=8g",
        "--conf", "spark.local.dir=/dev/shm/spark-graft-local",
        "--py-files", os.path.join(REPO, "dist", "biomedica_etl_spark.zip"),
        os.path.join(REPO, "scripts", "cluster_apply_job.py"),
        "--log-dir", log, "--warm-log-dir", warm_log,
        "--table-root", table_root,
        "--total-cores", str(cores_max),
        "--expect-executors", str(cores_max // WORKER_CORES),
        "--n-buckets", str(bench.N_BUCKETS),
        "--shuffle-salts", str(bench.SHUFFLE_SALTS),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"spark-submit failed at cores.max={cores_max}")
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("no JSON result line in job stdout")


def main() -> None:
    started = start_cluster()
    zip_path = os.path.join(REPO, "dist", "biomedica_etl_spark.zip")
    if not os.path.exists(zip_path):
        subprocess.run([os.path.join(REPO, "scripts", "package.sh")],
                       check=True, capture_output=True, cwd=REPO)
    # logs cached/deterministic; generation excluded from timing
    log = bench._bench_log_dir(EVENTS, BATCHES)
    warm_log = bench._bench_log_dir(bench.WARMUP_EVENTS, BATCHES)
    workdir = tempfile.mkdtemp(prefix="cluster-scaling-", dir="/dev/shm")
    attempts: dict[int, list] = {LO: [], HI: []}
    ceiling: dict[int, list] = {LO: [], HI: []}
    events = 0
    try:
        for i in range(REPEATS):
            for cores in (LO, HI):
                s0 = bench._steal_ticks()
                t0 = time.time()
                res = submit_attempt(
                    cores, log, warm_log,
                    os.path.join(workdir, f"t-{cores}-{i}"))
                steal = (bench._steal_ticks() - s0) / max(
                    (time.time() - t0) * 100 * bench.HOST_CPUS, 1) * 100
                events = res["events"]
                attempts[cores].append({
                    "sec": res["apply_sec"], "steal_pct": round(steal, 1),
                    "executors": res["executors"]})
                ceiling[cores].append(
                    bench._cpu_ceiling_hashes_per_sec(cores))
                print(f"{res['executors']} executor(s) x {WORKER_CORES} "
                      f"cores try{i}: {res['apply_sec']:.1f}s "
                      f"steal={steal:.1f}% "
                      f"hw={ceiling[cores][-1] / 1e6:.1f}Mh/s",
                      file=sys.stderr)
                shutil.rmtree(os.path.join(workdir, f"t-{cores}-{i}"),
                              ignore_errors=True)
                shutil.rmtree(os.path.join(workdir, f"t-{cores}-{i}-warm"),
                              ignore_errors=True)
    finally:
        if started:
            stop_cluster()
        shutil.rmtree(workdir, ignore_errors=True)

    best = {c: min(a["sec"] for a in attempts[c]) for c in (LO, HI)}
    factor = HI / LO
    speedup = best[LO] / best[HI]
    eff = speedup / factor
    hw_speedup = max(ceiling[HI]) / max(ceiling[LO])
    norm_eff = min(speedup / hw_speedup, 1.0)
    out = {
        "metric": "cluster_scaling_efficiency",
        "executors_lo": 1, "executors_hi": N_WORKERS,
        "cores_per_executor": WORKER_CORES,
        "events": events,
        "sec_lo": best[LO], "sec_hi": best[HI],
        "events_per_sec_hi": round(events / best[HI], 1),
        "speedup": round(speedup, 2),
        "raw_efficiency": round(eff, 2),
        "hw_ceiling_speedup": round(hw_speedup, 2),
        "normalized_efficiency": round(norm_eff, 2),
        "attempts_lo": attempts[LO], "attempts_hi": attempts[HI],
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Real multi-executor cluster: 1 vs {N_WORKERS} executors "
            f"(standalone, spark-submit --py-files)\n\n"
            f"Same packaged app, same {events:,}-event log, submitted to a "
            f"local standalone cluster ({N_WORKERS} x {WORKER_CORES}-core "
            f"worker JVMs) at `spark.cores.max={LO}` (ONE executor) and "
            f"`={HI}` ({N_WORKERS} executors, separate JVMs, real "
            f"serialized network shuffle). Interleaved best-of-{REPEATS}, "
            f"warm-up inside the job, submit/startup excluded.\n\n"
            f"- 1 executor: {best[LO]:.1f} s; {N_WORKERS} executors: "
            f"{best[HI]:.1f} s -> speedup **{speedup:.2f}x**, raw "
            f"efficiency **{eff:.2f}**\n"
            f"- hardware ceiling (pure-CPU {LO}->{HI} procs): "
            f"{hw_speedup:.2f}x -> normalized efficiency "
            f"**{norm_eff:.2f}**\n"
            f"- {events / best[HI]:,.0f} ev/s at {N_WORKERS} executors\n"
            f"- attempts (1 exec): {attempts[LO]}\n"
            f"- attempts ({N_WORKERS} exec): {attempts[HI]}\n"
        )


if __name__ == "__main__":
    main()
