#!/usr/bin/env python
"""Benchmark driver. Prints ONE JSON line:

{"metric": "...", "value": <total headline sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>,
 "cdc": {"events": N, "wall_sec": s, "events_per_sec": r,
          "parallelism": P, "batches": B}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_CDC_EVENTS (default 1,000,000).
Flags: --cdc-only (skip headline queries — used by the N-vs-4N scaling
runner, scripts/run_scaling.py), --queries-only.

The CDC bench is the north metric (BASELINE.md): generate a seeded
change stream, apply it through normalize -> LWW dedup -> bucketed MERGE
into a fresh LakeTable, report sustained events/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_headline_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    # untimed warm-up: a fresh JVM's first query pays one-time init (JIT
    # of scan/agg internals, python/Arrow worker spawn) that otherwise
    # lands on whichever query runs first and makes per-query numbers
    # unattributable. Touch a scan+agg AND a pandas-UDF path once.
    from pyspark.sql import functions as _F

    from etl_rs_spark.functions.coercion import bool_flex

    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10000)
    warm.select(
        _F.sum("l_quantity"), _F.count("*")
    ).collect()
    warm.select(bool_flex(_F.col("l_returnflag"))).collect()

    # two passes, min per query = steady-state. The first execution of
    # each heavy path (broadcast join codegen, python-worker pool
    # scale-up, streaming machinery, window codegen) pays one-time JIT
    # that a long-lived engine amortizes to zero, and this shared
    # sandbox VM adds 2-4x external-load swings (see BENCH/BASELINE.md);
    # measured: identical queries at 40s cold / 7s warm. min-of-2 is
    # the same best-of-N discipline the N-vs-4N scaling harness uses.
    # heavy entries (real merges / streaming drains inside one timed
    # query) get a THIRD pass and a per-stage breakdown: on load-noisy
    # days two samples cannot separate engine regression from host
    # weather (round 3's change_data_feed 2.4x swing took an
    # instrumented rerun to attribute — now the attribution ships in
    # the bench JSON itself).
    HEAVY = {
        "change_data_feed", "verified_pairs", "ngram_jaccard_capped",
        "stateful_user_stats", "stateful_user_stats_approx",
        "cdc_schema_promotion", "cdc_rename_drop", "cdc_bucket_evolution",
        "cdc_apply_mor",
    }
    from etl_rs_spark import telemetry

    out: dict[str, float] = {}
    stages: dict[str, dict[str, int]] = {}
    qs = entrymod.queries()
    for _pass in range(3):
        for name, fn in qs.items():
            if _pass == 2 and name not in HEAVY:
                continue
            telemetry.enable()
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = round(time.monotonic() - t0, 3)
            recs = telemetry.drain()
            if dt <= out.get(name, float("inf")) and recs:
                # stage breakdown of the BEST pass: sum stage timers
                # across the query's merge calls
                agg: dict[str, int] = {}
                for r in recs:
                    for k, v in r.get("stage_ms", {}).items():
                        agg[k] = agg.get(k, 0) + v
                    agg["merge_total"] = (
                        agg.get("merge_total", 0) + r.get("wall_ms", 0)
                    )
                stages[name] = agg
            out[name] = min(out.get(name, dt), dt)
            _ = n
    telemetry.disable()
    out["__stages__"] = stages  # popped by main()
    return out


def run_cdc_bench(
    spark, n_events: int, parallelism: int, batches: int = 4, reps: int = 1
) -> dict:
    from pyspark.sql import functions as F

    from etl_rs_spark.cdc.apply import apply_batch
    from etl_rs_spark.config import CdcConfig
    from etl_rs_spark.generator import gen_change_stream, to_envelope
    from etl_rs_spark.sinks.lake import LakeTable

    # SPARK_GRAFT_WORK_DIR: where the table + any generated envelope
    # live. The scaling runner points this at /dev/shm: a real cluster's
    # executors bring their own NVMe (an I/O resource that GROWS with
    # executor count), while this sandbox has ONE shared ext4 disk — a
    # non-scaling resource a 4N cluster would not have, so tmpfs is the
    # faithful proxy for per-executor local storage.
    work = tempfile.mkdtemp(
        prefix="cdc-bench-", dir=os.environ.get("SPARK_GRAFT_WORK_DIR")
    )
    try:
        # materialize the envelope stream first so generation cost is NOT
        # counted in apply throughput (in production the binlog already
        # exists); seeded => identical input at every parallelism level.
        # SPARK_GRAFT_CDC_ENV_PATH shares one pre-generated envelope
        # across benchmark legs (the N-vs-4N runner uses this so each
        # timed leg is only JVM start + apply).
        shared = os.environ.get("SPARK_GRAFT_CDC_ENV_PATH")
        env_path = shared or os.path.join(work, "envelope")
        if not (shared and os.path.exists(os.path.join(env_path, "_SUCCESS"))):
            ev = gen_change_stream(
                spark,
                n_events=n_events,
                n_convs=max(n_events // 1000, 100),
                turns_per_conv=32,
                seed=42,
                hot_conv_frac=0.2,
                partitions=max(parallelism * 2, 8),
            )
            to_envelope(ev).write.mode("overwrite").parquet(env_path)
        envelope = spark.read.parquet(env_path)
        if "--gen-only" in sys.argv:
            print(json.dumps({"generated": env_path, "events": n_events}))
            sys.exit(0)

        # num_buckets is a TABLE property — identical at every
        # parallelism level so the N-vs-4N comparison runs the same job.
        ddl = (
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        table = LakeTable.create(
            spark, os.path.join(work, "table"), ddl, num_buckets=32
        )
        cfg = CdcConfig()

        # Untimed warmup: apply a small slice to a THROWAWAY table first.
        # A fresh JVM's first batch pays ~10-15s of one-time init (JIT of
        # Spark internals, parquet reader classes, python/Arrow workers)
        # that a long-running stream amortizes to zero; sustained
        # throughput — the north metric — is the steady state. The
        # measured table still sees every event.
        warm = int(os.environ.get("SPARK_GRAFT_CDC_WARMUP", "200000"))
        if warm > 0:
            wtab = LakeTable.create(
                spark, os.path.join(work, "warmtable"), ddl, num_buckets=32
            )
            apply_batch(
                wtab,
                envelope.where(F.col("lsn") < warm),
                batch_id=0,
                run_id="warmup",
                cfg=cfg,
            )
            shutil.rmtree(os.path.join(work, "warmtable"), ignore_errors=True)

        # reps > 1: repeat the identical batch plan against a fresh table
        # and keep the best wall — the sandbox VM carries 2-4x external
        # load swings, and the north metric is the engine's sustained
        # steady-state rate, which the quietest repetition estimates.
        # Process-tree CPU per rep (cpu.py: python driver + JVM + UDF
        # workers via /proc): external host load stretches wall-clock
        # but not the engine's own cpu-seconds, so the cpu of the
        # best-wall rep is noise-robust evidence that the SAME total
        # work runs at every parallelism level — wall differences
        # beyond it are slot count and platform contention, not extra
        # work scheduled at higher parallelism.
        from etl_rs_spark.cpu import spark_cpu_ms

        per = (n_events + batches - 1) // batches
        best = None
        best_cpu = None
        for rep in range(max(reps, 1)):
            if rep > 0:
                shutil.rmtree(os.path.join(work, "table"), ignore_errors=True)
                table = LakeTable.create(
                    spark, os.path.join(work, "table"), ddl, num_buckets=32
                )
            c0 = spark_cpu_ms(spark)
            t0 = time.monotonic()
            for i in range(batches):
                chunk = envelope.where(
                    (F.col("lsn") >= i * per) & (F.col("lsn") < (i + 1) * per)
                )
                apply_batch(table, chunk, batch_id=i, run_id=f"bench{rep}", cfg=cfg)
            wall = time.monotonic() - t0
            c1 = spark_cpu_ms(spark)
            if best is None or wall < best:
                best = wall
                if c0 is not None and c1 is not None:
                    best_cpu = round((c1 - c0) / 1000, 1)
        out = {
            "events": n_events,
            "wall_sec": round(best, 3),
            "events_per_sec": round(n_events / best, 1),
            "cpu_sec_best_rep": best_cpu,
            "parallelism": parallelism,
            "batches": batches,
            "reps": max(reps, 1),
            "final_rows": table.read().count(),
        }

        # merge-on-read leg (SPARK_GRAFT_CDC_MOR=0 to skip): identical
        # batch plan with write.merge.mode=merge-on-read — the apply
        # phase appends per-bucket delta files instead of rewriting
        # bucket state, then ONE compaction folds the chains (the cost
        # copy-on-write pays on every batch, paid once). Reported
        # separately so the write-amplification trade is a measurement:
        # apply-only rate (the streaming steady state) and the rate
        # with compaction amortized in.
        if os.environ.get("SPARK_GRAFT_CDC_MOR", "1") != "0":
            mcfg = CdcConfig(merge_mode="merge-on-read")
            mtab = LakeTable.create(
                spark, os.path.join(work, "mor-table"), ddl, num_buckets=32
            )
            t0 = time.monotonic()
            for i in range(batches):
                chunk = envelope.where(
                    (F.col("lsn") >= i * per) & (F.col("lsn") < (i + 1) * per)
                )
                apply_batch(mtab, chunk, batch_id=i, run_id="benchmor", cfg=mcfg)
            apply_wall = time.monotonic() - t0
            t1 = time.monotonic()
            mtab.compact()
            compact_wall = time.monotonic() - t1
            mor_rows = mtab.read().count()
            assert mor_rows == out["final_rows"], (
                f"merge-on-read state diverged: {mor_rows} vs "
                f"{out['final_rows']} rows"
            )
            out["mor"] = {
                "apply_wall_sec": round(apply_wall, 3),
                "events_per_sec_apply": round(n_events / apply_wall, 1),
                "compact_wall_sec": round(compact_wall, 3),
                "events_per_sec_with_compaction": round(
                    n_events / (apply_wall + compact_wall), 1
                ),
            }
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    from etl_rs_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "4000000"))
    n_batches = int(os.environ.get("SPARK_GRAFT_CDC_BATCHES", "4"))
    # default 2 reps, best kept: same steady-state discipline as the
    # query passes (the scaling runner overrides to its own schedule)
    n_reps = int(os.environ.get("SPARK_GRAFT_CDC_REPS", "2"))
    # default the bench working set to tmpfs when present: the CDC bench
    # measures the ENGINE's sustained rate, and each real executor has
    # local NVMe; the sandbox's one shared ext4 disk is not part of the
    # thing being measured.
    if "SPARK_GRAFT_WORK_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        os.environ["SPARK_GRAFT_WORK_DIR"] = "/dev/shm"
    # shuffle partitions: overridable so the N-vs-4N scaling runner can
    # pin an IDENTICAL physical plan at both parallelism levels (a real
    # deployment sizes partitions to the data, not to the current
    # executor count); default stays core-sized for interactive runs.
    shuffle_p = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus)))
    cdc_only = "--cdc-only" in sys.argv
    queries_only = "--queries-only" in sys.argv

    spark = get_spark("bench", parallelism=cpus, shuffle_partitions=shuffle_p)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    stages: dict = {}
    if not cdc_only:
        queries = run_headline_queries(spark, sf_dir)
        stages = queries.pop("__stages__", {})
    cdc = None
    if not queries_only:
        cdc = run_cdc_bench(spark, n_events, cpus, batches=n_batches, reps=n_reps)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline query wall time + CDC apply throughput",
        "value": round(sum(queries.values()), 3) if queries else (cdc or {}).get("wall_sec"),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if stages:
        # per-stage wall (ms) of each heavy query's best pass: which
        # stage moved when a headline number moves between rounds
        result["stages"] = stages
    if cdc is not None:
        result["cdc"] = cdc

    # Full detail (per-stage breakdowns, full CDC sub-metrics) goes to a
    # side file: the driver captures only the TAIL of stdout, and round
    # 4's artifact proved a multi-KB line gets head-truncated into
    # unparseable JSON ("parsed": null). The printed line stays compact
    # — headline value, per-query seconds (2dp), CDC headline rate.
    # CDC-only legs (scripts/run_scaling*.py) must not clobber the
    # committed full-bench artifact: everything they need is on stdout.
    detail_name = "bench_detail_cdc.json" if cdc_only else "bench_detail.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", detail_name
    )
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as fh:
            json.dump(result, fh, indent=1)
    except OSError:
        detail_path = None

    compact = {
        "metric": "headline query wall time + CDC apply throughput",
        "value": result["value"],
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in queries.items()},
        "sf": result["sf"],
    }
    if cdc is not None:
        # wall_sec/parallelism/batches stay: scripts/run_scaling*.py
        # parse them for the legs and the report
        compact["cdc"] = {
            "events": cdc["events"],
            "wall_sec": cdc["wall_sec"],
            "events_per_sec": cdc["events_per_sec"],
            "cpu_sec_best_rep": cdc.get("cpu_sec_best_rep"),
            "parallelism": cdc["parallelism"],
            "batches": cdc["batches"],
        }
        if "mor" in cdc:
            compact["cdc"]["mor_events_per_sec"] = cdc["mor"][
                "events_per_sec_apply"
            ]
    if detail_path:
        compact["detail"] = "BENCH/" + detail_name
    line = json.dumps(compact, separators=(",", ":"))
    # hard guard: the driver's tail capture is ~2 KB; if the compact
    # line ever outgrows it, drop per-query detail rather than ship an
    # unparseable artifact (full numbers remain in the detail file).
    if len(line) > 1900:
        compact["queries"] = {
            k: round(v, 2)
            for k, v in sorted(queries.items(), key=lambda kv: -kv[1])[:40]
        }
        compact["queries_truncated_to"] = 40
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
