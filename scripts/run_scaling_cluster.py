"""Multi-JVM N-vs-4N scaling evidence: a REAL Spark standalone cluster
on this host — one master JVM plus k single-core worker JVMs, each
worker (and therefore its executor JVM and python workers) taskset-
pinned to its own core — running the identical CDC apply job at
2 workers ("N executors") and 8 workers ("4N executors").

This is the measurement the single-JVM local[N] proxy cannot make:
local[16+] shares ONE heap whose GC safepoints stall all executor
threads together (the thread wall measured in BENCH/BASELINE_4_16.md),
while real clusters scale out by multiplying executor JVMs with
separate heaps and separate GCs. Here each worker leg is separate
JVMs with separate heaps — the same resource topology as adding
executors — so the 2->8 ratio is a faithful executor-scale-out proxy.

Constant across legs: the driver (pinned to its own disjoint core set,
identical both legs), the master JVM, the shuffle partitioning
(SCALING_SHUFFLE, default 32 — a real deployment sizes partitions to
the data, not the fleet), the pre-materialized envelope on tmpfs, and
the per-executor heap. Only the number of worker JVMs changes.

Usage: PYTHONPATH=/root/repo python scripts/run_scaling_cluster.py [n_events]
Env: SCALING_CLUSTER_LEVELS=2,8  SCALING_CLUSTER_ROUNDS=3
     SCALING_SHUFFLE=32  SCALING_CLUSTER_OUT=BENCH/BASELINE_CLUSTER.md
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_scaling import (  # noqa: E402
    ENV_CACHE,
    QUIET_EFF_FLOOR,
    _SHM_LOCAL,
    _SHM_WORK,
    pregenerate,
    wait_for_quiet,
)

import pyspark  # noqa: E402

SPARK_PKG = os.path.dirname(os.path.abspath(pyspark.__file__))
SPARK_CLASS = os.path.join(SPARK_PKG, "bin", "spark-class")
MASTER_PORT = int(os.environ.get("SCALING_MASTER_PORT", "7177"))
MASTER_URL = f"spark://127.0.0.1:{MASTER_PORT}"
LEVELS = tuple(
    int(x)
    for x in os.environ.get("SCALING_CLUSTER_LEVELS", "2,8").split(",")
)
#: cores reserved for the DRIVER python+JVM, identical at both levels
#: and disjoint from every worker pin — driver work (scheduling,
#: manifest bookkeeping) must not contend with the measured executors.
DRIVER_CORES = os.environ.get("SCALING_DRIVER_CORES", "24-31")
WORKER_MEM = os.environ.get("SCALING_WORKER_MEM", "4g")
EXEC_MEM = os.environ.get("SCALING_EXEC_MEM", "3g")


def _spark_env() -> dict:
    return dict(
        os.environ,
        SPARK_HOME=SPARK_PKG,
        SPARK_LOCAL_IP="127.0.0.1",
        SPARK_NO_DAEMONIZE="1",
        PYTHONPATH=REPO,
        PYSPARK_PYTHON=sys.executable,
    )


def start_master(log_dir: str) -> subprocess.Popen:
    log = open(os.path.join(log_dir, "master.log"), "w")
    p = subprocess.Popen(
        [
            SPARK_CLASS, "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", str(MASTER_PORT),
            "--webui-port", str(MASTER_PORT + 1),
        ],
        env=_spark_env(), stdout=log, stderr=subprocess.STDOUT,
    )
    _wait_in_log(
        os.path.join(log_dir, "master.log"),
        f"started service 'sparkMaster' on port {MASTER_PORT}",
        timeout_s=60,
    )
    return p


def start_workers(k: int, log_dir: str) -> list[subprocess.Popen]:
    """k worker JVMs, worker i pinned to core i — separate heaps,
    separate GCs, one core each (the executor-count axis, isolated)."""
    procs = []
    for i in range(k):
        env = _spark_env()
        env["SPARK_WORKER_DIR"] = os.path.join(log_dir, f"worker{i}")
        log = open(os.path.join(log_dir, f"worker{i}.log"), "w")
        procs.append(
            subprocess.Popen(
                [
                    "taskset", "-c", str(i),
                    SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                    MASTER_URL, "--cores", "1", "--memory", WORKER_MEM,
                    "--webui-port", str(MASTER_PORT + 10 + i),
                ],
                env=env, stdout=log, stderr=subprocess.STDOUT,
            )
        )
    for i in range(k):
        _wait_in_log(
            os.path.join(log_dir, f"worker{i}.log"),
            "Successfully registered with master",
            timeout_s=90,
        )
    return procs


def _wait_in_log(path: str, needle: str, timeout_s: int) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        try:
            with open(path) as f:
                if needle in f.read():
                    return
        except FileNotFoundError:
            pass
        time.sleep(0.5)
    raise TimeoutError(f"'{needle}' not seen in {path} within {timeout_s}s")


def stop(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGTERM)
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()


def run_leg(workers: int, n_events: int, log_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=MASTER_URL,
        SPARK_EXECUTOR_MEM=EXEC_MEM,
        SPARK_EXECUTOR_CORES="1",
        SPARK_GRAFT_CPUS=str(workers),  # shuffle default sizing only
        SPARK_GRAFT_CDC_EVENTS=str(n_events),
        SPARK_GRAFT_CDC_ENV_PATH=f"{ENV_CACHE}-{n_events}",
        SPARK_GRAFT_CDC_BATCHES=os.environ.get("SCALING_BATCHES", "1"),
        SPARK_GRAFT_CDC_REPS=os.environ.get("SCALING_REPS", "3"),
        SPARK_GRAFT_SHUFFLE_PARTITIONS=os.environ.get("SCALING_SHUFFLE", "32"),
        SPARK_GRAFT_WORK_DIR=_SHM_WORK,
        SPARK_LOCAL_DIRS=_SHM_LOCAL,
        SPARK_DRIVER_MEM=os.environ.get("SCALING_HEAP", "8g"),
        PYTHONPATH=REPO,
    )
    procs = start_workers(workers, log_dir)
    try:
        out = subprocess.run(
            [
                "taskset", "-c", DRIVER_CORES,
                sys.executable, os.path.join(REPO, "bench.py"), "--cdc-only",
            ],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            raise RuntimeError(
                f"leg failed: {out.stdout[-2000:]}\n{out.stderr[-2000:]}"
            )
        return json.loads(out.stdout.strip().splitlines()[-1])["cdc"]
    finally:
        stop(procs)


def main(n_events: int = 8_000_000) -> None:
    rounds = int(os.environ.get("SCALING_CLUSTER_ROUNDS", "3"))
    log_dir = os.environ.get("SCALING_CLUSTER_LOGS", "/tmp/sa-cluster")
    os.makedirs(log_dir, exist_ok=True)
    print("pre-generating shared envelope ...", flush=True)
    pregenerate(n_events)
    master = start_master(log_dir)
    samples: dict[int, list[dict]] = {k: [] for k in LEVELS}
    calibrations = []
    try:
        for r in range(rounds):
            for k in LEVELS:
                cal = wait_for_quiet()
                calibrations.append({"round": r, "workers": k, **cal})
                t0 = time.monotonic()
                res = run_leg(k, n_events, log_dir)
                samples[k].append(res)
                print(
                    f"round {r} {k} workers (cal {cal}): "
                    f"{res['events_per_sec']:,} ev/s "
                    f"({time.monotonic() - t0:.0f}s total)",
                    flush=True,
                )
    finally:
        stop([master])
    lo, hi = min(LEVELS), max(LEVELS)
    best = {k: max(s, key=lambda x: x["events_per_sec"]) for k, s in samples.items()}
    all_rates = {k: [x["events_per_sec"] for x in s] for k, s in samples.items()}
    eff = (best[hi]["events_per_sec"] / best[lo]["events_per_sec"]) / (hi / lo)
    print("all samples:", all_rates, flush=True)
    print(f"cluster scaling efficiency {lo}->{hi} workers: {eff:.3f}", flush=True)

    md = f"""# BENCH — multi-JVM standalone-cluster scaling ({lo} vs {hi} executors)

A real Spark standalone cluster on this host: one master JVM + k
single-core worker JVMs, each worker taskset-pinned to its own core so
its executor JVM and python workers own exactly one core. Executor
count is the ONLY variable: driver (pinned to cores {DRIVER_CORES},
disjoint from all workers, identical both legs), master, per-executor
heap ({EXEC_MEM}), shuffle partitioning
({os.environ.get('SCALING_SHUFFLE', '32')}), and the pre-materialized
tmpfs envelope are constant. Unlike the local[N] proxy, each executor
here has its OWN heap and GC — the resource topology of real executor
scale-out, which retires the single-JVM-GC-wall caveat on the 4->16
local pair (BENCH/BASELINE_4_16.md).

Job: identical seeded CDC apply (bench.py --cdc-only): LWW dedup ->
vectorized normalize -> bucketed LWW MERGE into a fresh LakeTable,
{os.environ.get('SCALING_BATCHES', '1')} batch x
{os.environ.get('SCALING_REPS', '3')} reps per leg (best kept), legs
interleaved over {rounds} rounds, each leg gated on a pure-CPU
quiet-window calibration (plat_eff >= {QUIET_EFF_FLOOR}).

| executors (1-core worker JVMs) | events | wall sec (best) | events/sec (best) |
|---|---|---|---|
| {lo} ("N")  | {best[lo]['events']:,} | {best[lo]['wall_sec']} | {best[lo]['events_per_sec']:,} |
| {hi} ("4N") | {best[hi]['events']:,} | {best[hi]['wall_sec']} | {best[hi]['events_per_sec']:,} |

All samples (events/sec): {all_rates}.
Calibrations: {calibrations}.

**Scaling efficiency ({hi}/{lo} executors) = {eff:.3f}** (north-rule
target >= 0.8; executors grown N -> 4N as separate JVMs).
"""
    out_path = os.environ.get(
        "SCALING_CLUSTER_OUT", os.path.join(REPO, "BENCH", "BASELINE_CLUSTER.md")
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)
    print(f"wrote {out_path}", flush=True)
    print(
        json.dumps(
            {
                "levels": {str(k): best[k]["events_per_sec"] for k in LEVELS},
                "efficiency": round(eff, 3),
                "samples": all_rates,
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000)
