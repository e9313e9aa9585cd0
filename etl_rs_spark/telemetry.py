"""In-process stage-timing collector for attributable benchmarks.

A bench entry like change_data_feed runs two real MERGEs plus a CDF
read inside one timed query; when its wall time moves between rounds,
the bench JSON alone cannot say WHICH stage moved (round 3's 2.4x
swing on that entry took an instrumented rerun to attribute). The
engine therefore always returns per-stage wall times in its stats
dicts, and — when a collector is enabled — also appends them here so
the bench can publish a per-query stage breakdown without threading
stats through every return path.

Driver-side only, microseconds of overhead, disabled by default.
"""

from __future__ import annotations

from typing import Any

_RECORDS: list[dict[str, Any]] = []
_ENABLED = False


def enable() -> None:
    global _ENABLED
    _ENABLED = True
    _RECORDS.clear()


def disable() -> None:
    global _ENABLED
    _ENABLED = False
    _RECORDS.clear()


def record(kind: str, payload: dict[str, Any]) -> None:
    if _ENABLED:
        _RECORDS.append({"kind": kind, **payload})


def drain() -> list[dict[str, Any]]:
    out = list(_RECORDS)
    _RECORDS.clear()
    return out
