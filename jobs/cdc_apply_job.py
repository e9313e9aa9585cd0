"""spark-submit entrypoint for the CDC apply stream (north_star: "launched
via spark-submit --py-files on a multi-executor cluster").

Package the engine and submit:

    cd /root/repo && zip -r /tmp/etl_rs_spark.zip etl_rs_spark
    spark-submit --py-files /tmp/etl_rs_spark.zip \
        jobs/cdc_apply_job.py \
        --events-dir /data/binlog --table /data/transcripts \
        --checkpoint /data/ckpt --lineage /data/lineage \
        [--create-table] [--num-buckets 64] [--trigger "10 seconds"] \
        [--max-files-per-trigger 100] [--salt-buckets 0]
        [--dead-letter /data/dlq]

On a cluster the session comes from spark-submit (get_spark passes a
non-local session through untouched); locally it builds local[N].
Replay mode (default) drains all available binlog files and exits;
--trigger tails the directory continuously.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="CDC apply stream")
    p.add_argument("--events-dir", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--lineage", default=None)
    p.add_argument("--create-table", action="store_true")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--salt-buckets", type=int, default=None,
                   help="override [cdc].salt_buckets; pass 0 to disable "
                        "salting even when the config file enables it")
    p.add_argument("--dead-letter", default=None,
                   help="quarantine dir for unmergeable envelope rows; "
                        "pass '' to disable a config file's DLQ")
    p.add_argument("--column-map", default=None,
                   help="source->table column renames applied to each "
                        "batch's winners, e.g. 'text=body,tool=agent' — "
                        "the stream-side pair of table rename-column "
                        "(jobs/table_admin_job.py) for sources that "
                        "keep emitting the old payload key")
    p.add_argument("--merge-mode", default=None,
                   choices=["copy-on-write", "merge-on-read"],
                   help="override [cdc].merge_mode / the table's "
                        "write.merge.mode property: merge-on-read "
                        "appends per-bucket delta files (write cost "
                        "O(batch)) with LWW resolution at read/compaction")
    p.add_argument("--branch", default=None,
                   help="apply onto this table branch instead of main "
                        "(write-audit-publish: audit the branch, then "
                        "table_admin_job fast-forward publishes it); "
                        "pass '' to disable a config file's branch")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--trigger", default=None, help="processingTime, e.g. '10 seconds'; omit for availableNow replay")
    p.add_argument("--config", default=None,
                   help="TOML EngineConfig file ([pipeline]/[cdc]/[features]/"
                        "[observability]); feature flags gate DLQ, lineage and "
                        "the compaction cadence; CLI flags override")
    p.add_argument("--schema", default=(
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    ))
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from dataclasses import replace

    from etl_rs_spark.cdc.stream import StreamDriver
    from etl_rs_spark.config import CdcConfig, EngineConfig
    from etl_rs_spark.session import get_spark
    from etl_rs_spark.sinks.lake import LakeTable

    engine = EngineConfig.from_file(args.config) if args.config else None

    spark = get_spark("cdc-apply")
    if args.create_table:
        table = LakeTable.create(
            spark, args.table, args.schema,
            num_buckets=args.num_buckets, exist_ok=True,
        )
    else:
        table = LakeTable.load(spark, args.table)

    # CLI flags override the config file's [cdc] section
    base_cdc = engine.effective_cdc() if engine else CdcConfig()
    cdc = replace(
        base_cdc,
        salt_buckets=(args.salt_buckets if args.salt_buckets is not None
                      else base_cdc.salt_buckets),
        dead_letter_dir=(args.dead_letter if args.dead_letter is not None
                         else base_cdc.dead_letter_dir),
        merge_mode=(args.merge_mode if args.merge_mode is not None
                    else base_cdc.merge_mode),
        column_map=(
            dict(kv.split("=", 1) for kv in args.column_map.split(","))
            if args.column_map
            else base_cdc.column_map
        ),
        branch=(args.branch if args.branch is not None
                else base_cdc.branch),
    )
    if cdc.branch:
        if cdc.branch not in table.branches():
            table.create_branch(cdc.branch)
        table = table.on_branch(cdc.branch)
    driver = StreamDriver(
        spark,
        table,
        args.events_dir,
        args.checkpoint,
        cfg=cdc,
        max_files_per_trigger=args.max_files_per_trigger,
        lineage_dir=args.lineage,
        engine=engine,
    )
    if args.trigger:
        q = driver.start(processing_time=args.trigger)
        q.awaitTermination()
        return 0
    stats = driver.run_available_now()
    for s in stats:
        print(json.dumps(s, default=str))
    print(json.dumps({
        "batches_applied": len(stats),
        "table_version": table.current().version,
        "watermark_lsn": table.current().watermark_lsn,
        # binlog integrity at drain: covered LSN ranges + holes (a hole
        # that persists here is a lost binlog segment, not lateness)
        "lsn_coverage": driver.lsn_coverage(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
