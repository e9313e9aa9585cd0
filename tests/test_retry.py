"""Retry executor + loader health gate — the reference's RetryConfig /
Retryable / health_check surface (/root/reference/src/traits.rs:66,173-201,
src/pipeline/mod.rs:106-111), which it defines but never wires, working
for real here."""

from __future__ import annotations

import pytest

from etl_rs_spark.errors import ConfigError, LoadError, TransformError
from etl_rs_spark.pipeline import Pipeline
from etl_rs_spark.retry import RetryConfig, with_retry
from etl_rs_spark.sources import MemorySource


def _no_sleep(_):  # keep tests instant
    pass


class FlakySink:
    """Fails with a recoverable LoadError n_failures times, then loads."""

    def __init__(self, n_failures: int):
        self.n_failures = n_failures
        self.attempts = 0
        self.loaded_rows = -1

    def load(self, df):
        self.attempts += 1
        if self.attempts <= self.n_failures:
            raise LoadError(f"transient outage #{self.attempts}")
        self.loaded_rows = df.count()
        return {"rows_loaded": self.loaded_rows, "success": True}


class UnhealthySink:
    def health_check(self) -> bool:
        return False

    def load(self, df):  # pragma: no cover — must never be reached
        raise AssertionError("load must not run when health_check fails")


# ----------------------------------------------------------- with_retry --
def test_with_retry_recovers_on_second_attempt():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise LoadError("transient")
        return "ok"

    out = with_retry(flaky, RetryConfig(max_attempts=3, delay_ms=1), sleep=_no_sleep)
    assert out == "ok" and len(calls) == 2


def test_with_retry_nonrecoverable_never_retries():
    calls = []

    def bad():
        calls.append(1)
        raise ConfigError("broken config")

    with pytest.raises(ConfigError):
        with_retry(bad, RetryConfig(max_attempts=5, delay_ms=1), sleep=_no_sleep)
    assert len(calls) == 1


def test_with_retry_exhausts_attempts_and_backs_off():
    delays = []

    def always():
        raise LoadError("still down")

    with pytest.raises(LoadError):
        with_retry(
            always,
            RetryConfig(max_attempts=3, delay_ms=100, backoff_multiplier=3.0),
            sleep=delays.append,
        )
    assert delays == [0.1, pytest.approx(0.3)]  # 2 sleeps for 3 attempts


# ------------------------------------------------------------- pipeline --
def test_pipeline_flaky_sink_succeeds_on_retry(spark):
    rows = [{"a": 1}, {"a": 2}, {"a": 3}]
    sink = FlakySink(n_failures=1)
    p = (
        Pipeline.builder()
        .extract(MemorySource(rows, schema="a int"))
        .load(sink)
        .build()
    )
    # shrink the real backoff so the test stays fast
    object.__setattr__(p.config.pipeline, "retry_delay_ms", 1)
    result = p.execute(spark)
    assert sink.attempts == 2
    assert result.rows_processed == 3


def test_pipeline_unhealthy_sink_fails_fast(spark):
    sink = UnhealthySink()
    p = (
        Pipeline.builder()
        .extract(MemorySource([{"a": 1}], schema="a int"))
        .load(sink)
        .build()
    )
    with pytest.raises(LoadError, match="health check"):
        p.execute(spark)
    assert p.state == "failed"


def test_pipeline_transform_error_not_retried(spark):
    attempts = []

    def bad_transform(df):
        attempts.append(1)
        raise ValueError("bug in transform")

    sink = FlakySink(n_failures=0)
    p = (
        Pipeline.builder()
        .extract(MemorySource([{"a": 1}], schema="a int"))
        .transform(bad_transform)
        .load(sink)
        .build()
    )
    with pytest.raises(TransformError):
        p.execute(spark)
    assert len(attempts) == 1  # non-recoverable: single attempt
    assert sink.attempts == 0
