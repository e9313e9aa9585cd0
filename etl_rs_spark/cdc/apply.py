"""The batch-apply core: normalize -> LWW dedup -> MERGE.

This is the pure function at the center of the engine — the Spark
rendition of the reference's extract->transform->load pipeline body
(/root/reference/src/pipeline/mod.rs:89-212), shaped so it is equally
callable from a batch job and from Structured Streaming's foreachBatch.
Everything is declarative DataFrame work; the only driver-side data are
the affected bucket ids and the commit metadata.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame

from etl_rs_spark.cdc.lineage import bucket_lineage, write_lineage
from etl_rs_spark.cdc.normalize import coerce_columns, normalize_events
from etl_rs_spark.config import CdcConfig
from etl_rs_spark.operators.dedup import lww_dedup
from etl_rs_spark.sinks.lake import LakeTable, bucket_expr


def apply_batch(
    table: LakeTable,
    envelope: DataFrame,
    batch_id: int,
    run_id: str,
    cfg: CdcConfig | None = None,
    coerce_spec: dict[str, str] | None = None,
    lineage_dir: str | None = None,
) -> dict[str, Any]:
    """Apply one microbatch of CDC envelope events to the table.

    Idempotent: re-applying the same (run_id, batch_id) is skipped by the
    table's commit log; re-applying the same *events* under any other id
    is absorbed by the LWW merge. Either way state converges — that is
    the exactly-once story under foreachBatch's at-least-once replay.
    """
    t0 = time.monotonic()
    cfg = cfg or CdcConfig()

    # parse + type the envelope, but defer the pandas-UDF dirty-value
    # coercion until after dedup: the UDF then processes one row per key
    # (the winners) instead of every duplicate event.
    events = normalize_events(envelope, coerce_spec, coerce=False)
    winners = lww_dedup(
        events,
        keys=list(cfg.merge_keys),
        order_cols=list(cfg.order_cols),
        salt_buckets=cfg.salt_buckets,
    )
    winners = coerce_columns(winners, coerce_spec)

    stats = table.merge(winners, run_id=run_id, batch_id=batch_id)
    stats["batch_id"] = batch_id
    stats["run_id"] = run_id
    wall_ms = int((time.monotonic() - t0) * 1000)
    stats["apply_wall_ms"] = wall_ms

    if lineage_dir is not None and not stats.get("skipped"):
        snap = table.current()
        b = bucket_expr(snap.bucket_col, snap.num_buckets)
        write_lineage(
            lineage_dir,
            bucket_lineage(events, winners, b),
            run_id=run_id,
            batch_id=batch_id,
            table_version=stats["version"],
            wall_ms=wall_ms,
        )
    return stats
