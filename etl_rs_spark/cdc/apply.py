"""The batch-apply core: prescan -> normalize -> LWW dedup -> MERGE.

This is the pure function at the center of the engine — the Spark
rendition of the reference's extract->transform->load pipeline body
(/root/reference/src/pipeline/mod.rs:89-212), shaped so it is equally
callable from a batch job and from Structured Streaming's foreachBatch.
Everything is declarative DataFrame work; the only driver-side data are
the prescan's O(num_buckets) stats rows and the commit metadata.

Per-microbatch execution shape (the scaling-efficiency budget):

1. **prescan job** — one cheap aggregation over the raw envelope
   (payload-key union + per-bucket counts + LSN range, see
   cdc/normalize.prescan_batch). Reads the batch once, no from_json,
   no dedup shuffle; collects at most num_buckets rows.
2. **write job** — the only full pass: from_json parse -> LWW dedup
   (map-side-combined max(struct)) -> union with the touched buckets'
   current rows -> LWW merge agg -> skew-aware bucketed write.
3. driver bookkeeping — threaded footer reads, one manifest JSON, and
   a driver-side (pyarrow) lineage append. No further Spark jobs.

Round 1 ran two extra full recomputations per batch (a separate key
discovery scan and a bucket-stats pass that re-ran the dedup); those are
what held N->4N scaling efficiency at 0.659.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame

from etl_rs_spark.cdc.lineage import write_lineage
from etl_rs_spark.cdc.normalize import (
    coerce_columns,
    discover_payload_keys,
    normalize_events,
    prescan_batch,
)
from etl_rs_spark.config import CdcConfig
from etl_rs_spark.operators.dedup import lww_dedup, lww_dedup_narrow
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

    # exactly-once fast path: an already-committed (run_id, batch_id)
    # is skipped before any job is launched.
    snap = table.current()
    if snap.applied.get(run_id, -1) >= batch_id:
        return {
            "version": snap.version,
            "skipped": True,
            "reason": f"batch {batch_id} already applied for {run_id}",
            "batch_id": batch_id,
            "run_id": run_id,
            "apply_wall_ms": int((time.monotonic() - t0) * 1000),
        }

    # one cheap pass over the typed envelope columns only (conv_id,
    # lsn — no JSON): per-bucket counts + lsn range for the merge's
    # partition pruning, skew plan and lineage.
    import os as _os

    debug = _os.environ.get("ETL_DEBUG_MERGE")
    t_pre = time.monotonic()
    pre = prescan_batch(
        envelope, bucket_expr(snap.bucket_col, snap.num_buckets), with_keys=False
    )
    if debug:
        print(f"[apply] prescan: {time.monotonic()-t_pre:.1f}s")
    if pre.n_events == 0:
        return {
            "version": snap.version,
            "skipped": True,
            "reason": "empty batch",
            "batch_id": batch_id,
            "run_id": run_id,
            "apply_wall_ms": int((time.monotonic() - t0) * 1000),
        }

    # LWW-dedup the OPAQUE envelope first: winner selection needs only
    # the typed key/order columns, so the JSON payload rides the dedup
    # shuffle as an unparsed string and every payload-parsing step below
    # (key discovery, from_json, pandas-UDF coercion) runs on one row
    # per key — typically 10-100x fewer rows than events. The winners
    # are persisted (they are the batch's smallest representation) so
    # key discovery and the merge's write job share one dedup run.
    #
    # Schema-evolution consequence, by design: a payload key widens the
    # table when it appears on a WINNING event. A key carried only by
    # events that lose their batch's LWW race contributes no value to
    # state and does not widen the schema (it widens later, when a
    # winner first carries it) — state content is identical either way.
    dedup = lww_dedup_narrow if cfg.dedup_strategy == "narrow" else lww_dedup
    raw_winners = dedup(
        envelope,
        keys=list(cfg.merge_keys),
        order_cols=list(cfg.order_cols),
        salt_buckets=cfg.salt_buckets,
    ).persist()
    try:
        t_k = time.monotonic()
        keys = discover_payload_keys(raw_winners)
        if debug:
            print(f"[apply] dedup+keys: {time.monotonic()-t_k:.1f}s")
        winners = normalize_events(
            raw_winners, coerce_spec, coerce=False, keys=keys
        )
        winners = coerce_columns(winners, coerce_spec)

        stats = table.merge(
            winners,
            run_id=run_id,
            batch_id=batch_id,
            batch_stats={"bucket_counts": pre.bucket_counts, "hi_lsn": pre.hi_lsn},
        )
    finally:
        raw_winners.unpersist()
    stats["batch_id"] = batch_id
    stats["run_id"] = run_id
    stats["n_events"] = pre.n_events
    wall_ms = int((time.monotonic() - t0) * 1000)
    stats["apply_wall_ms"] = wall_ms

    if lineage_dir is not None and not stats.get("skipped"):
        write_lineage(
            lineage_dir,
            pre.per_bucket,
            stats.get("rows_per_bucket", {}),
            run_id=run_id,
            batch_id=batch_id,
            table_version=stats["version"],
            wall_ms=wall_ms,
        )
    return stats
