"""Pipeline builder API — the reference's primary entry point
(/root/reference/src/pipeline/mod.rs:41-467), Spark-native.

Pipeline.builder().extract(src).transform(fn).load(sink).build().execute(spark)

Build time assembles a lazy DataFrame plan (the reference materializes
Vec<DataRow> at every stage boundary; here extract->transform->load
collapses into ONE Catalyst-optimized DAG and a single action). Events
and metrics mirror the reference's lifecycle (state machine at
/root/reference/src/pipeline/mod.rs:68-86, execution at :89-212).
Transform may be any DataFrame->DataFrame callable (compose with
operators.transforms.composite).
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_rs_spark.config import EngineConfig
from etl_rs_spark.errors import ETLError, ExtractError, LoadError, TransformError
from etl_rs_spark.events import (
    LoggingEventEmitter,
    PipelineEvent,
    PipelineMetrics,
)
from etl_rs_spark.retry import RetryConfig, with_retry


@dataclass
class PipelineResult:
    """(/root/reference/src/types.rs:335-341)"""

    rows_processed: int
    rows_successful: int
    rows_failed: int
    execution_time_ms: int
    errors: list[str] = field(default_factory=list)


class _NullEmitter:
    def emit(self, event: PipelineEvent) -> None:  # pragma: no cover
        pass


class Pipeline:
    def __init__(
        self, extractor, transform, loader, config, emitter, pipeline_id,
        plugins=None, validator=None, validation_policy: str = "warn",
    ):
        self.extractor = extractor
        self.transform = transform
        self.loader = loader
        self.config = config
        # features.enable_logging gates event emission for real (the
        # reference stores the flag and never reads it)
        if not config.features.enable_logging:
            emitter = _NullEmitter()
        self.emitter = emitter
        self.pipeline_id = pipeline_id
        self.plugins = plugins
        #: Validator analogue (ref src/traits.rs:77-86): anything with
        #: validate(df) -> list[str]. policy: "fail" aborts the run on
        #: violations, "warn" emits a validation event and continues.
        self.validator = validator
        self.validation_policy = validation_policy
        self.metrics = PipelineMetrics()
        self.state = "idle"

    def _fire(self, when: str, stage: str, df=None):
        if self.plugins is None:
            return df
        ctx = {"pipeline_id": self.pipeline_id, "state": self.state}
        return self.plugins.fire(when, stage, ctx, df)

    @staticmethod
    def builder() -> "PipelineBuilder":
        return PipelineBuilder()

    def _set_state(self, state: str) -> None:
        self.emitter.emit(
            PipelineEvent(
                "state_changed",
                self.pipeline_id,
                data={"from": self.state, "to": state},
            )
        )
        self.state = state

    def _retry_cfg(self) -> RetryConfig:
        p = self.config.pipeline
        return RetryConfig(
            max_attempts=max(p.retry_attempts, 1),
            delay_ms=p.retry_delay_ms,
            backoff_multiplier=p.retry_backoff_multiplier,
        )

    def _on_retry(self, stage: str):
        def _cb(attempt: int, exc: BaseException, delay: float) -> None:
            self.emitter.emit(
                PipelineEvent(
                    "retrying",
                    self.pipeline_id,
                    data={
                        "stage": stage,
                        "attempt": attempt,
                        "error": str(exc),
                        "next_delay_s": delay,
                    },
                )
            )

        return _cb

    def execute(self, spark: SparkSession) -> PipelineResult:
        """(/root/reference/src/pipeline/mod.rs:89-212): extract ->
        transform -> load with state transitions, events, metrics. One
        Spark action at the load. Recoverable extract/load failures are
        retried with exponential backoff (retry.with_retry, the
        reference's never-wired RetryConfig executed for real); the
        loader's health_check gates the whole run
        (/root/reference/src/pipeline/mod.rs:106-111) so a dead sink
        fails fast before any extraction work."""
        t0 = time.monotonic()
        self.emitter.emit(PipelineEvent("started", self.pipeline_id))
        rcfg = self._retry_cfg()
        try:
            # -- loader health gate, before any work
            health = getattr(self.loader, "health_check", None)
            if health is not None:
                try:
                    ok = health()
                except Exception as exc:
                    raise LoadError(f"loader health check raised: {exc}") from exc
                if ok is False:
                    raise LoadError("loader health check failed")

            self._set_state("extracting")

            def _extract():
                try:
                    self._fire("before", "extract")
                    d = self.extractor.extract(spark)
                    return self._fire("after", "extract", d)
                except ETLError:
                    raise
                except Exception as exc:  # classify per reference taxonomy
                    raise ExtractError(str(exc)) from exc

            df = with_retry(_extract, rcfg, on_retry=self._on_retry("extract"))

            self._set_state("transforming")
            try:
                df = self._fire("before", "transform", df)
                if self.transform is not None:
                    df = self.transform(df)
                df = self._fire("after", "transform", df)
            except ETLError:
                raise
            except Exception as exc:
                raise TransformError(str(exc)) from exc

            if self.validator is not None and self.config.features.enable_validation:
                self._set_state("validating")
                violations = self.validator.validate(df)
                if violations:
                    self.emitter.emit(
                        PipelineEvent(
                            "validation_failed",
                            self.pipeline_id,
                            data={"violations": violations},
                        )
                    )
                    if self.validation_policy == "fail":
                        raise TransformError(
                            "validation failed: " + "; ".join(violations)
                        )

            self._set_state("loading")
            df = self._fire("before", "load", df)

            def _load():
                try:
                    return self.loader.load(df)
                except ETLError:
                    raise
                except Exception as exc:
                    raise LoadError(str(exc)) from exc

            result = with_retry(_load, rcfg, on_retry=self._on_retry("load"))
            self._fire("after", "load", df)
            rows = result.get("rows_loaded", -1)
            if rows < 0:
                rows = df.count()

            ms = int((time.monotonic() - t0) * 1000)
            self._set_state("completed")
            self.emitter.emit(
                PipelineEvent(
                    "completed", self.pipeline_id, data={"rows": rows, "ms": ms}
                )
            )
            if self.config.features.enable_metrics:
                self.metrics.record(rows, ms, True)
            return PipelineResult(rows, rows, 0, ms)
        except ETLError as exc:
            ms = int((time.monotonic() - t0) * 1000)
            self._set_state("failed")
            self.emitter.emit(
                PipelineEvent("error", self.pipeline_id, data={"error": str(exc)})
            )
            if self.config.features.enable_metrics:
                self.metrics.record(0, ms, False)
            raise

    def execute_streaming(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        processing_time: str | None = None,
        timeout_s: int | None = None,
    ):
        """(/root/reference/src/pipeline/mod.rs:273-276) done for real:
        extract_stream -> transform -> foreachBatch(load) with offsets in
        the checkpoint. Loader is invoked per microbatch."""

        def fb(batch_df: DataFrame, batch_id: int) -> None:
            out = batch_df if self.transform is None else self.transform(batch_df)
            self.loader.load(out)
            self.emitter.emit(
                PipelineEvent(
                    "batch_processed",
                    self.pipeline_id,
                    data={"batch_number": batch_id},
                )
            )

        stream = self.extractor.extract_stream(spark)
        writer = stream.writeStream.foreachBatch(fb).option(
            "checkpointLocation", checkpoint_dir
        )
        if processing_time is None:
            writer = writer.trigger(availableNow=True)
            q = writer.start()
            q.awaitTermination(timeout_s)
            if q.exception() is not None:
                raise q.exception()
            return q
        return writer.trigger(processingTime=processing_time).start()


class PipelineBuilder:
    """Type-state builder (/root/reference/src/pipeline/mod.rs:319-447) —
    in Python, validated at build()."""

    def __init__(self) -> None:
        self._extractor = None
        self._transform: Callable[[DataFrame], DataFrame] | None = None
        self._loader = None
        self._config: EngineConfig | None = None
        self._emitter = None
        self._plugins = None
        self._validator = None
        self._validation_policy = "warn"

    def plugins(self, registry) -> "PipelineBuilder":
        self._plugins = registry
        return self

    def validate(self, validator, policy: str = "warn") -> "PipelineBuilder":
        self._validator = validator
        self._validation_policy = policy
        return self

    def extract(self, extractor) -> "PipelineBuilder":
        self._extractor = extractor
        return self

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "PipelineBuilder":
        self._transform = fn
        return self

    def load(self, loader) -> "PipelineBuilder":
        self._loader = loader
        return self

    def config(self, cfg: EngineConfig) -> "PipelineBuilder":
        self._config = cfg
        return self

    def emitter(self, emitter) -> "PipelineBuilder":
        self._emitter = emitter
        return self

    def build(self) -> Pipeline:
        if self._extractor is None or self._loader is None:
            raise ETLError("pipeline requires an extractor and a loader")
        cfg = (self._config or EngineConfig()).validate()
        # pipeline-{pid}-{epoch_ms} (/root/reference/src/pipeline/mod.rs:465)
        pid = f"pipeline-{os.getpid()}-{int(time.time()*1000)}-{uuid.uuid4().hex[:6]}"
        return Pipeline(
            self._extractor,
            self._transform,
            self._loader,
            cfg,
            self._emitter
            or LoggingEventEmitter(cfg.observability.log_format),
            pid,
            plugins=self._plugins,
            validator=self._validator,
            validation_policy=self._validation_policy,
        )
