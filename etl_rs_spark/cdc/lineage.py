"""Per-microbatch, per-partition lineage + throughput metrics.

Generalizes the reference's BatchProcessed{batch_number, rows_count}
event (/root/reference/src/types.rs:413-418) and PipelineMetrics
accumulation (/root/reference/src/pipeline/mod.rs:289-315) into a
queryable table: one row per (run, batch, bucket) with event counts and
the LSN range applied, plus batch-level wall time and commit version.
Appended as parquet per microbatch; reading it back answers "which
partition applied which LSN range in which commit" — the audit trail
for exactly-once claims.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, batch_id long, bucket int, n_events long, "
    "n_winners long, min_lsn long, max_lsn long, table_version long, "
    "wall_ms long, committed_at timestamp"
)


def bucket_lineage(
    events: DataFrame, winners: DataFrame, bucket: F.Column
) -> DataFrame:
    """Per-bucket event/winner counts + lsn range, one aggregation each."""
    ev = (
        events.withColumn("__b", bucket)
        .groupBy("__b")
        .agg(
            F.count("*").alias("n_events"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
    )
    wn = winners.withColumn("__b", bucket).groupBy("__b").agg(
        F.count("*").alias("n_winners")
    )
    return ev.join(wn, "__b", "left").withColumnsRenamed({"__b": "bucket"})


def write_lineage(
    lineage_dir: str,
    per_bucket: DataFrame,
    run_id: str,
    batch_id: int,
    table_version: int,
    wall_ms: int,
) -> None:
    os.makedirs(lineage_dir, exist_ok=True)
    out = per_bucket.select(
        F.lit(run_id).alias("run_id"),
        F.lit(batch_id).cast("long").alias("batch_id"),
        F.col("bucket").cast("int"),
        F.col("n_events").cast("long"),
        F.col("n_winners").cast("long"),
        F.col("min_lsn").cast("long"),
        F.col("max_lsn").cast("long"),
        F.lit(table_version).cast("long").alias("table_version"),
        F.lit(wall_ms).cast("long").alias("wall_ms"),
        F.timestamp_seconds(F.lit(int(time.time()))).alias("committed_at"),
    )
    out.coalesce(1).write.mode("append").parquet(
        os.path.join(lineage_dir, f"batch-{batch_id}-{uuid.uuid4().hex[:8]}")
    )


def read_lineage(spark, lineage_dir: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).parquet(
        os.path.join(lineage_dir, "*")
    )
