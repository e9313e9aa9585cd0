"""Retry executor — exponential backoff over recoverable failures.

The reference ships the full retry *surface* — RetryConfig{max_attempts,
delay_ms, backoff_multiplier} + the Retryable trait
(/root/reference/src/traits.rs:173-201), config knobs
(/root/reference/src/config.rs:74-78) and the recoverability
classification (/root/reference/src/error.rs:110-121) — but nothing in
its pipeline ever invokes it. This module wires it for real: transient
(recoverable) extract/load failures back off and retry; non-recoverable
errors (Transform/Config/Serialization) propagate immediately.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any, TypeVar

from etl_rs_spark.errors import is_recoverable

T = TypeVar("T")


@dataclass(frozen=True)
class RetryConfig:
    """(/root/reference/src/traits.rs:186-201)"""

    max_attempts: int = 3
    delay_ms: int = 1000
    backoff_multiplier: float = 2.0


def with_retry(
    fn: Callable[[], T],
    cfg: RetryConfig | None = None,
    classify: Callable[[BaseException], bool] = is_recoverable,
    on_retry: Callable[[int, BaseException, float], Any] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run fn; on a recoverable failure sleep delay_ms * multiplier^k and
    try again, up to max_attempts total attempts. Non-recoverable
    failures and the final attempt's failure propagate unchanged."""
    cfg = cfg or RetryConfig()
    delay = cfg.delay_ms / 1000.0
    attempt = 1
    while True:
        try:
            return fn()
        except BaseException as exc:
            if attempt >= cfg.max_attempts or not classify(exc):
                raise
            if on_retry is not None:
                on_retry(attempt, exc, delay)
            sleep(delay)
            delay *= cfg.backoff_multiplier
            attempt += 1
