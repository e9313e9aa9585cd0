#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds.

NOT the driver bench (bench.py is frozen): this one isolates single
queries so a change can be attributed — same methodology (build the
DataFrame, run .count(), min over passes), plus:

  --plan DIR   write .explain("formatted") for each query to DIR/<q>.txt
  --noop       time a noop-sink write (guide §1.4) instead of count()
  --passes N   passes per query (default 2, min kept)
  --queries a,b,c   subset (default: all)

Env mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      --queries ngram_jaccard,verified_pairs --plan plans/r06 --passes 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--plan", default="")
    ap.add_argument("--plan-suffix", default="")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from etl_rs_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", parallelism=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    wanted = [q for q in args.queries.split(",") if q] or list(qs)

    # same warm-up as bench.py so first-query JIT doesn't pollute
    from pyspark.sql import functions as F

    from etl_rs_spark.functions.coercion import bool_flex

    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10000)
    warm.select(F.sum("l_quantity"), F.count("*")).collect()
    warm.select(bool_flex(F.col("l_returnflag"))).collect()

    out: dict[str, float] = {}
    for name in wanted:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        for p in range(args.passes):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = round(time.monotonic() - t0, 3)
            out[name] = min(out.get(name, dt), dt)
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plan, f"{name}{args.plan_suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))


if __name__ == "__main__":
    main()
