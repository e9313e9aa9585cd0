"""Incremental downstream pipeline off the change data feed.

The consumer story for ``LakeTable.changes()``: tail the table's net
row-level changes from a version cursor into a DOWNSTREAM LakeTable of
derived per-turn rows. Each pull reads only the files the manifest's
per-file LSN range says changed (metadata pruning) and applies them
with the same bucketed LWW merge the ingest path uses — O(changed
data) egress, O(touched buckets) downstream write.

Exactly-once without a side cursor file: the pull merges with
``run_id=<consumer id>, batch_id=<source version read>``, so the
cursor IS the downstream table's (run_id, batch_id) idempotence log —
state and cursor commit in one atomic snapshot swing, and a crashed or
replayed pull of the same source version is skipped outright.

Net-semantics mapping: the feed emits each changed key once with final
state — ``upsert`` rows become LWW upserts of the derived row,
``delete`` rows become tombstones (they keep their (ts, _lsn), so a
late out-of-order pull cannot resurrect a deleted key).

spark-submit:

    cd /root/repo && zip -r /tmp/etl_rs_spark.zip etl_rs_spark
    spark-submit --py-files /tmp/etl_rs_spark.zip \
        jobs/cdf_consumer_job.py \
        --table /data/transcripts --downstream /data/turn_features \
        [--run-id cdf-consumer] [--loop-seconds 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

RUN_ID_DEFAULT = "cdf-consumer"

#: derived schema the consumer materializes (per turn)
DOWNSTREAM_DDL = (
    "conv_id string, turn_idx int, role string, text_len int, ts timestamp"
)


def ensure_downstream(spark, path: str, num_buckets: int = 16):
    from etl_rs_spark.sinks.lake import LakeTable

    return LakeTable.create(
        spark,
        path,
        DOWNSTREAM_DDL,
        key_cols=("conv_id", "turn_idx"),
        order_cols=("ts", "lsn"),
        bucket_col="conv_id",
        num_buckets=num_buckets,
        exist_ok=True,
    )


def cursor(downstream, run_id: str = RUN_ID_DEFAULT) -> int:
    """Last source version applied downstream (-1 = never pulled)."""
    return downstream.current().applied.get(run_id, -1)


def pull_increment(src, dst, run_id: str = RUN_ID_DEFAULT) -> dict:
    """One incremental pull: metadata-pruned feed since the cursor ->
    derived columns -> bucketed LWW merge downstream. Idempotent per
    source version (re-pulls are skipped by the merge's applied log)."""
    from pyspark.sql import functions as F

    frm = cursor(dst, run_id)
    head = src.current().version
    if head <= frm:
        return {"from": frm, "to": head, "skipped": True}
    feed = src.changes(max(frm, 0), to_version=head)
    delta = feed.select(
        "conv_id",
        "turn_idx",
        "role",
        F.length("text").cast("int").alias("text_len"),
        "ts",
        F.when(F.col("_change_type") == "delete", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("_lsn").alias("lsn"),
    )
    stats = dst.merge(delta, run_id=run_id, batch_id=head)
    return {
        "from": frm,
        "to": head,
        "skipped": bool(stats.get("skipped")),
        "buckets_touched": stats.get("buckets_touched", []),
        "downstream_version": stats.get("version"),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="CDF incremental consumer")
    ap.add_argument("--table", required=True, help="source LakeTable path")
    ap.add_argument("--branch", default=None,
                    help="tail this branch's change feed instead of main "
                         "(e.g. audit a staged ingest before it publishes)")
    ap.add_argument("--downstream", required=True, help="derived LakeTable path")
    ap.add_argument("--run-id", default=RUN_ID_DEFAULT)
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument(
        "--loop-seconds",
        type=float,
        default=None,
        help="poll interval; omit for a single pull",
    )
    args = ap.parse_args(argv)

    from etl_rs_spark import get_spark
    from etl_rs_spark.sinks.lake import LakeTable

    spark = get_spark("cdf-consumer")
    src = LakeTable.load(spark, args.table)
    if args.branch:
        src = src.on_branch(args.branch)
    dst = ensure_downstream(spark, args.downstream, args.num_buckets)
    while True:
        stats = pull_increment(src, dst, args.run_id)
        print(json.dumps(stats), flush=True)
        if args.loop_seconds is None:
            return 0
        time.sleep(args.loop_seconds)


if __name__ == "__main__":
    sys.exit(main())
