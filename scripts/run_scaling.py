"""N vs 4N scaling evidence (BASELINE.md / north rule).

Runs the IDENTICAL CDC apply job (same seeded input, same batch plan) in
two fresh JVMs at two parallelism levels — local[8] as "N executors" and
local[32] as "4N executors", the sandbox proxy prescribed by the driver —
and reports events/sec at both plus scaling efficiency
(T_4N / T_N) / 4. Writes BENCH/BASELINE.md.

Usage: PYTHONPATH=/root/repo python scripts/run_scaling.py [n_events]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_events: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CDC_EVENTS=str(n_events),
        PYTHONPATH=REPO,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cdc-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["cdc"]


def main(n_events: int = 4_000_000) -> None:
    levels = {}
    for cpus in (8, 32):
        print(f"running CDC bench at local[{cpus}] ...", flush=True)
        t0 = time.monotonic()
        levels[cpus] = run_level(cpus, n_events)
        print(f"  local[{cpus}]: {levels[cpus]['events_per_sec']:,} ev/s "
              f"({time.monotonic()-t0:.0f}s total)", flush=True)

    r8, r32 = levels[8]["events_per_sec"], levels[32]["events_per_sec"]
    eff = (r32 / r8) / 4
    md = f"""# BENCH — measured CDC apply throughput + scaling efficiency

Job: seeded synthetic transcript change stream (generator.py, seed 42,
hot_conv_frac 0.2), applied as {levels[32]['batches']} microbatches of
normalize -> LWW dedup -> bucketed LWW MERGE into a fresh LakeTable.
Identical input and batch plan at both parallelism levels; envelope
parquet pre-materialized so generation cost is excluded. Fresh JVM per
level (subprocess), no concurrent load.

| parallelism (proxy) | events | wall sec | events/sec |
|---|---|---|---|
| local[8]  ("N executors")  | {levels[8]['events']:,} | {levels[8]['wall_sec']} | {r8:,} |
| local[32] ("4N executors") | {levels[32]['events']:,} | {levels[32]['wall_sec']} | {r32:,} |

**Scaling efficiency (T_4N / T_N) / 4 = {eff:.3f}** (target >= 0.8 per
BASELINE.json north rule; measured on a 32-core host, so local[8] vs
local[32] is a true 4x core ratio).

10^10-event extrapolation: throughput is sustained per-microbatch and
the table's merge cost is bounded by the touched buckets, not table
size; at 10^10 events the same job shape needs (10^10 / events_per_sec)
core-seconds at this per-core rate — scaling out executors divides
wall-clock accordingly while the bucketed MERGE keeps shuffle volume per
batch constant. Generated {time.strftime('%Y-%m-%d %H:%M:%S')}.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000)
