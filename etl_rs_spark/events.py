"""Pipeline events + metrics — reference parity.

PipelineEvent Started/StateChanged/BatchProcessed/Error/Completed
(/root/reference/src/types.rs:399-431), LoggingEventEmitter
(/root/reference/src/events.rs:10-82), InMemoryEventEmitter for tests
(/root/reference/src/events.rs:85-119), PipelineMetrics accumulation
(/root/reference/src/pipeline/mod.rs:23-29,289-315). For streaming
queries the same role is played by Spark's StreamingQueryListener; these
classes cover the batch Pipeline API.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any

log = logging.getLogger("etl_rs_spark")


@dataclass
class PipelineEvent:
    kind: str  # started | state_changed | batch_processed | error | completed
    pipeline_id: str
    at_ms: int = field(default_factory=lambda: int(time.time() * 1000))
    data: dict[str, Any] = field(default_factory=dict)


class LoggingEventEmitter:
    """``fmt`` mirrors the reference's LogFormat enum
    (/root/reference/src/config.rs:52-57): pretty (default), json
    (one JSON object per event), compact (id+kind only)."""

    def __init__(self, fmt: str = "pretty") -> None:
        if fmt not in ("pretty", "json", "compact"):
            raise ValueError(f"unknown log format {fmt!r}")
        self.fmt = fmt

    def emit(self, event: PipelineEvent) -> None:
        if self.fmt == "json":
            import json

            log.info(
                "%s",
                json.dumps(
                    {
                        "pipeline_id": event.pipeline_id,
                        "kind": event.kind,
                        "at_ms": event.at_ms,
                        "data": event.data,
                    },
                    default=str,
                ),
            )
        elif self.fmt == "compact":
            log.info("%s %s", event.pipeline_id, event.kind)
        else:
            log.info("%s %s %s", event.pipeline_id, event.kind, event.data)


class InMemoryEventEmitter:
    """Test capture (/root/reference/src/events.rs:85-119)."""

    def __init__(self) -> None:
        self.events: list[PipelineEvent] = []

    def emit(self, event: PipelineEvent) -> None:
        self.events.append(event)

    def of_kind(self, kind: str) -> list[PipelineEvent]:
        return [e for e in self.events if e.kind == kind]


@dataclass
class PipelineMetrics:
    """(/root/reference/src/pipeline/mod.rs:23-29)"""

    executions: int = 0
    total_rows_processed: int = 0
    total_execution_time_ms: int = 0
    successes: int = 0

    @property
    def success_rate(self) -> float:
        return self.successes / self.executions if self.executions else 0.0

    def record(self, rows: int, ms: int, ok: bool) -> None:
        self.executions += 1
        self.total_rows_processed += max(rows, 0)
        self.total_execution_time_ms += ms
        if ok:
            self.successes += 1
