"""Structured Streaming driver: tail the file-based binlog, apply each
microbatch through apply_batch, checkpoint offsets.

This is the real implementation of what the reference only sketches:
its execute_batch loop (/root/reference/src/pipeline/mod.rs:215-269)
relies on extractor offset bookkeeping that is never advanced
(/root/reference/src/extract/csv.rs:192-211), and its checkpoint/
recovery manager is docs-only (/root/reference/docs/architecture.md:250-268).
Here the offsets are Spark's file-source log inside checkpointLocation:
kill the process anywhere, restart with the same checkpoint, and the
stream resumes at the first uncommitted batch; the table's (run_id,
batch_id) commit log plus LWW merge absorb the one batch that may be
replayed — exactly-once end-to-end.

Triggers: availableNow=True drains everything then stops (replay mode);
processingTime tails a growing directory (tail mode) — mirroring the
reference's execute_streaming alias (/root/reference/src/pipeline/mod.rs:273-276).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from etl_rs_spark.config import CdcConfig, EngineConfig
from etl_rs_spark.cdc.apply import apply_batch
from etl_rs_spark.generator import ENVELOPE_SCHEMA
from etl_rs_spark.retry import RetryConfig, with_retry
from etl_rs_spark.sinks.lake import LakeTable


class StreamDriver:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        events_dir: str,
        checkpoint_dir: str,
        cfg: CdcConfig | None = None,
        fmt: str = "parquet",
        source_options: dict[str, str] | None = None,
        max_files_per_trigger: int | None = None,
        coerce_spec: dict[str, str] | None = None,
        lineage_dir: str | None = None,
        retry: RetryConfig | None = None,
        compact_every: int | None = None,
        retention_every: int | None = None,
        retention_keep_last: int | None = None,
        engine: "EngineConfig | None" = None,
    ):
        """``engine``: an EngineConfig whose feature flags gate real
        driver behavior — enable_dead_letter off strips the quarantine
        dir, enable_lineage off disables lineage records, cdc.
        compact_every fills the maintenance cadence, and the [pipeline]
        retry knobs build the RetryConfig — all overridable by the
        explicit keyword arguments."""
        if engine is not None:
            cfg = cfg or engine.effective_cdc()
            if not engine.features.enable_lineage:
                lineage_dir = None
            if compact_every is None:
                compact_every = engine.cdc.compact_every
            if retention_every is None:
                retention_every = engine.cdc.retention_every
            if retention_keep_last is None:
                retention_keep_last = engine.cdc.retention_keep_last
            if retry is None:
                p = engine.pipeline
                retry = RetryConfig(
                    max_attempts=max(p.retry_attempts, 1),
                    delay_ms=p.retry_delay_ms,
                    backoff_multiplier=p.retry_backoff_multiplier,
                )
            if coerce_spec is None:
                coerce_spec = engine.cdc.coerce_spec
        self.spark = spark
        self.table = table
        self.events_dir = events_dir
        self.checkpoint_dir = checkpoint_dir
        self.cfg = cfg or CdcConfig()
        self.fmt = fmt
        #: passed through to the stream reader — file-source tuning, or
        #: the full bus config for fmt="kafka" (kafka.bootstrap.servers,
        #: subscribe, startingOffsets...). With fmt="kafka" the reader
        #: decodes each record's JSON value into the CDC envelope
        #: (cdc/bus.decode_bus_frame) and events_dir is ignored;
        #: requires spark-sql-kafka-0-10 on the classpath.
        self.source_options = dict(source_options or {})
        self.max_files_per_trigger = max_files_per_trigger
        self.coerce_spec = coerce_spec
        self.lineage_dir = lineage_dir
        self.retry = retry or RetryConfig()
        #: table maintenance under sustained ingest: every N batches
        #: (keyed on the checkpoint's GLOBAL batch_id, so the cadence
        #: survives driver restarts — see _foreach_batch), compact()
        #: rewrites each bucket to one file, keeping both the file
        #: count and the manifest O(buckets) over a 10^10-event run
        #: instead of O(batches x buckets).
        self.compact_every = compact_every
        #: retention under sustained ingest: every N batches,
        #: expire old snapshots (keeping retention_keep_last — enough
        #: history for CDF consumers and rollback) and sweep orphans,
        #: both as DISTRIBUTED Spark actions (the driver never holds
        #: the file list). Vacuum keeps its default in-flight grace, so
        #: this stream's own just-written files are never raced. Bounds
        #: snapshot count, manifest bytes and dead data bytes over a
        #: 10^10-event run with no external scheduler.
        self.retention_every = retention_every
        self.retention_keep_last = (
            10 if retention_keep_last is None else retention_keep_last
        )
        # run identity = the checkpoint: replays within one checkpoint
        # lineage share it, so the table's commit log can skip them.
        self.run_id = os.path.abspath(checkpoint_dir)
        self.batch_stats: list[dict[str, Any]] = []
        #: merged [lo, hi] LSN spans applied this run (cfg.
        #: track_lsn_gaps); O(holes) entries, not O(batches)
        self._lsn_ranges: list[list[int]] = []

    def _fold_lsn_span(self, span: dict[str, Any] | None) -> None:
        if not span:
            return
        lo, hi = int(span["lo"]), int(span["hi"])
        merged: list[list[int]] = []
        for a, b in sorted(self._lsn_ranges + [[lo, hi]]):
            if merged and a <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        self._lsn_ranges = merged

    def lsn_coverage(self) -> dict[str, Any]:
        """Run-level binlog integrity: the merged LSN spans this run
        applied, and the HOLES between them — ranges the stream never
        delivered (a lost/skipped binlog segment). Batch-boundary
        out-of-order delivery is fine (spans merge once the late file
        arrives); a hole that persists at stream drain is data loss.
        Per-batch intra-range holes ride each batch's ``lsn_span``
        stat (cdc/apply.py, observed on the dedup scan — no extra
        job)."""
        holes = [
            [a[1] + 1, b[0] - 1]
            for a, b in zip(self._lsn_ranges, self._lsn_ranges[1:])
        ]
        missing_in_batches = sum(
            s["lsn_span"]["missing_in_range"]
            for s in self.batch_stats
            if s.get("lsn_span")
        )
        return {
            "covered": [list(r) for r in self._lsn_ranges],
            "holes": holes,
            "missing_in_batch_ranges": missing_in_batches,
        }

    def _foreach_batch(self, batch_df, batch_id: int) -> None:
        # retry recoverable failures with backoff (reference RetryConfig,
        # /root/reference/src/traits.rs:186-201, wired for real): safe
        # because apply_batch is idempotent — a partial merge never
        # commits (snapshot swing is atomic), so a retry re-runs cleanly.
        stats = with_retry(
            lambda: apply_batch(
                self.table,
                batch_df,
                batch_id=batch_id,
                run_id=self.run_id,
                cfg=self.cfg,
                coerce_spec=self.coerce_spec,
                lineage_dir=self.lineage_dir,
            ),
            self.retry,
        )
        self.batch_stats.append(stats)
        self._fold_lsn_span(stats.get("lsn_span"))
        # Maintenance cadence is keyed on the GLOBAL batch_id (assigned
        # by the streaming checkpoint, monotone across driver restarts),
        # not an in-memory counter: a driver that restarts every K < N
        # batches — rolling deploys, spot-instance churn, or the
        # endurance harness's per-wave resume — would reset a counter
        # forever and NEVER run maintenance (observed: 2x10^8-event run
        # with retention_every=20 and 5-batch driver lifetimes grew
        # snapshots linearly). Modulo on batch_id is stateless and
        # exact under steady batch cadence; a cycle whose trigger batch
        # is an exactly-once replay skip just defers to the next cycle.
        if self.compact_every and not stats.get("skipped"):
            if (batch_id + 1) % self.compact_every == 0:
                # files-only compaction: tombstones are NOT dropped here
                # because binlog files may deliver LSNs out of order
                # across batches, so no watermark proves an old delete
                # unreachable; tombstone expiry stays an explicit
                # operator call with a caller-supplied horizon.
                self.table.compact()
        if self.retention_every and not stats.get("skipped"):
            if (batch_id + 1) % self.retention_every == 0:
                self.table.expire_snapshots(
                    keep_last=self.retention_keep_last, distributed=True
                )
                self.table.vacuum_orphans(distributed=True)

    def _reader(self):
        if self.fmt == "kafka":
            from etl_rs_spark.cdc.bus import decode_bus_frame

            reader = self.spark.readStream.format("kafka")
            for k, v in self.source_options.items():
                reader = reader.option(k, v)
            return decode_bus_frame(reader.load())
        reader = (
            self.spark.readStream.schema(ENVELOPE_SCHEMA)
            .option("latestFirst", "false")
            .option("maxFilesPerTrigger", self.max_files_per_trigger or 1000)
        )
        for k, v in self.source_options.items():
            reader = reader.option(k, v)
        return reader.format(self.fmt).load(self.events_dir)

    def start(self, processing_time: str | None = None) -> StreamingQuery:
        """Start the stream. processing_time=None -> availableNow (drain
        and stop); otherwise a continuous tail at that trigger interval."""
        writer = (
            self._reader()
            .writeStream.foreachBatch(self._foreach_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName("cdc-apply")
        )
        if processing_time is None:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_available_now(self, timeout_s: int | None = None) -> list[dict[str, Any]]:
        """Drain all currently-available files, block until done, return
        per-batch stats. Raises TimeoutError if timeout_s elapses before
        the drain completes — a partial drain must not masquerade as a
        full one."""
        q = self.start(processing_time=None)
        finished = q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
        if q.exception() is not None:
            raise q.exception()
        if timeout_s is not None and not finished:
            raise TimeoutError(
                f"stream did not drain within {timeout_s}s; "
                f"{len(self.batch_stats)} batches applied before stop"
            )
        return self.batch_stats
