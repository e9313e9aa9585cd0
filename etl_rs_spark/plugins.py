"""Plugin lifecycle hooks — reference parity, actually wired in.

The reference defines before/after hooks per stage with a
PluginRegistry (/root/reference/src/plugins.rs:10-64,96-191) but never
calls it from Pipeline::execute (/root/reference/src/pipeline/mod.rs:89-212
has no plugin invocations). Here the registry is honored: Pipeline
accepts a registry and fires before/after extract/transform/load with a
context dict; a plugin's before_transform/before_load may also REWRITE
the DataFrame (returning a new one), which is the Spark-idiomatic shape
of an interceptor — still one Catalyst plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

Hook = Callable[[dict[str, Any], DataFrame | None], DataFrame | None]

STAGES = ("extract", "transform", "load")


@dataclass
class PluginRegistry:
    before: dict[str, list[Hook]] = field(
        default_factory=lambda: {s: [] for s in STAGES}
    )
    after: dict[str, list[Hook]] = field(
        default_factory=lambda: {s: [] for s in STAGES}
    )

    def register_before(self, stage: str, hook: Hook) -> "PluginRegistry":
        self._check(stage)
        self.before[stage].append(hook)
        return self

    def register_after(self, stage: str, hook: Hook) -> "PluginRegistry":
        self._check(stage)
        self.after[stage].append(hook)
        return self

    @staticmethod
    def _check(stage: str) -> None:
        if stage not in STAGES:
            raise ValueError(f"unknown stage {stage!r}; valid: {STAGES}")

    def fire(
        self, when: str, stage: str, ctx: dict[str, Any], df: DataFrame | None
    ) -> DataFrame | None:
        hooks = (self.before if when == "before" else self.after).get(stage, [])
        for h in hooks:
            out = h(ctx, df)
            if out is not None:
                df = out
        return df
