"""Reference API parity: TOML config loading, JSON scalar-element
wrapping, canonical temporal renderings in the JSON sinks."""

from __future__ import annotations

import datetime
import json

import pytest

from etl_rs_spark.config import EngineConfig
from etl_rs_spark.errors import ConfigError
from etl_rs_spark.sinks import JsonSink
from etl_rs_spark.sources import JsonLinesSource, JsonSource


# ----------------------------------------------------------------- TOML --
def test_from_toml_overrides_and_defaults():
    cfg = EngineConfig.from_toml(
        """
        [pipeline]
        batch_size = 42
        retry_attempts = 7

        [performance]
        memory_limit_mb = 2048

        [cdc]
        num_buckets = 64
        """
    )
    assert cfg.pipeline.batch_size == 42
    assert cfg.pipeline.retry_attempts == 7
    assert cfg.pipeline.timeout_seconds == 300  # default preserved
    assert cfg.performance.memory_limit_mb == 2048
    assert cfg.cdc.num_buckets == 64


def test_from_toml_reference_full_shape():
    """The reference's complete ETLConfig TOML — [pipeline], [features],
    [observability], [performance] with its exact field names
    (/root/reference/src/config.rs:6-115) — parses into the matching
    sections instead of being silently dropped."""
    cfg = EngineConfig.from_toml(
        """
        [pipeline]
        batch_size = 500
        parallel_workers = 4
        timeout_seconds = 120
        retry_attempts = 5
        retry_delay_ms = 250

        [features]
        enable_metrics = false
        enable_logging = false
        enable_tracing = true
        enable_validation = false
        enable_caching = true

        [observability]
        log_level = "debug"
        metrics_endpoint = "http://localhost:9090/metrics"
        log_format = "json"

        [performance]
        memory_limit_mb = 4096
        disk_cache_size_mb = 1024
        connection_pool_size = 20
        connection_timeout_seconds = 60
        """
    )
    assert cfg.pipeline.batch_size == 500
    f = cfg.features
    assert (f.enable_metrics, f.enable_logging, f.enable_validation) == (
        False,
        False,
        False,
    )
    assert f.enable_tracing and f.enable_caching
    assert f.enable_dead_letter and f.enable_lineage  # engine defaults
    o = cfg.observability
    assert o.log_level == "debug"
    assert o.metrics_endpoint == "http://localhost:9090/metrics"
    assert o.tracing_endpoint is None
    assert o.log_format == "json"
    p = cfg.performance
    assert (p.disk_cache_size_mb, p.connection_pool_size) == (1024, 20)
    assert p.connection_timeout_seconds == 60


def test_from_toml_bad_log_format_and_non_bool_flag():
    with pytest.raises(ConfigError):
        EngineConfig.from_toml('[observability]\nlog_format = "xml"\n')
    with pytest.raises(ConfigError):
        EngineConfig.from_toml('[features]\nenable_metrics = "yes"\n')


def test_feature_flags_gate_real_behavior(spark):
    """enable_logging/enable_metrics/enable_validation change what the
    Pipeline actually does; enable_dead_letter strips the quarantine
    dir via effective_cdc."""
    from dataclasses import replace

    from etl_rs_spark.config import CdcConfig, FeatureFlags
    from etl_rs_spark.events import InMemoryEventEmitter
    from etl_rs_spark.pipeline import Pipeline
    from pyspark.sql import functions as F

    from etl_rs_spark.sinks import MemorySink
    from etl_rs_spark.validate import RuleValidator

    class _Src:
        def extract(self, s):
            return s.createDataFrame([(1,), (2,)], "v int")

    def run(cfg):
        em = InMemoryEventEmitter()
        sink = MemorySink()
        # validator that always flags, policy=fail -> raises iff run
        val = RuleValidator({"v_negative": F.col("v") < 0})
        p = Pipeline(
            _Src(), lambda df: df, sink, cfg, em, "t",
            validator=val, validation_policy="fail",
        )
        return p, em

    base = EngineConfig()
    p, em = run(base)
    with pytest.raises(Exception):
        p.execute(spark)  # validation active by default

    off = replace(
        base,
        features=FeatureFlags(
            enable_validation=False, enable_logging=False, enable_metrics=False
        ),
    )
    p2, em2 = run(off)
    p2.execute(spark)  # validator skipped
    assert em2.events == []  # logging gated
    assert p2.metrics.executions == 0  # metrics gated

    cdc = CdcConfig(dead_letter_dir="/tmp/dlq")
    on = replace(base, cdc=cdc)
    assert on.effective_cdc().dead_letter_dir == "/tmp/dlq"
    gated = replace(
        base, cdc=cdc, features=FeatureFlags(enable_dead_letter=False)
    )
    assert gated.effective_cdc().dead_letter_dir is None


def test_logging_emitter_formats(caplog):
    import logging

    from etl_rs_spark.events import LoggingEventEmitter, PipelineEvent

    ev = PipelineEvent("started", "p1", data={"k": 1})
    with caplog.at_level(logging.INFO, logger="etl_rs_spark"):
        LoggingEventEmitter("json").emit(ev)
        LoggingEventEmitter("compact").emit(ev)
        LoggingEventEmitter().emit(ev)
    js, compact, pretty = [r.getMessage() for r in caplog.records]
    parsed = json.loads(js)
    assert parsed["pipeline_id"] == "p1" and parsed["kind"] == "started"
    assert compact == "p1 started"
    assert "{'k': 1}" in pretty
    with pytest.raises(ValueError):
        LoggingEventEmitter("xml")


def test_from_toml_rejects_invalid_values():
    with pytest.raises(ConfigError):
        EngineConfig.from_toml("[pipeline]\nbatch_size = 0\n")
    with pytest.raises(ConfigError):
        EngineConfig.from_toml("not [ valid toml")


def test_from_file_roundtrip(tmp_path):
    p = tmp_path / "etl.toml"
    p.write_text("[pipeline]\nparallel_workers = 3\n")
    assert EngineConfig.from_file(str(p)).pipeline.parallel_workers == 3
    with pytest.raises(ConfigError):
        EngineConfig.from_file(str(tmp_path / "missing.toml"))


# ---------------------------------------------------- JSON scalar wrap --
def test_json_source_scalar_array_wraps_value(spark, tmp_path):
    """(/root/reference/src/extract/json.rs:113-139): array of scalars
    becomes rows with a single 'value' column."""
    p = tmp_path / "scalars.json"
    p.write_text("[1, 2, 3]")
    df = JsonSource(str(p)).extract(spark)
    assert df.columns == ["value"]
    assert sorted(r["value"] for r in df.collect()) == [1, 2, 3]


def test_json_source_array_path_scalar_elements(spark, tmp_path):
    p = tmp_path / "nested.json"
    p.write_text(json.dumps({"data": {"ids": [10, 20]}}))
    df = JsonSource(str(p), array_path="data.ids").extract(spark)
    assert df.columns == ["value"]
    assert sorted(r["value"] for r in df.collect()) == [10, 20]


def test_jsonl_source_scalar_lines_wrap_value(spark, tmp_path):
    """(/root/reference/src/extract/json.rs:222-230)"""
    p = tmp_path / "scalars.jsonl"
    p.write_text('"a"\n\n"b"\n')
    df = JsonLinesSource(str(p)).extract(spark)
    assert df.columns == ["value"]
    assert sorted(r["value"] for r in df.collect()) == ["a", "b"]


# ------------------------------------------------- canonical renderings --
def test_json_sink_canonical_temporal_rendering(spark, tmp_path):
    """(/root/reference/src/load/common.rs:16-41, src/load/json.rs:94-103):
    Date %Y-%m-%d, naive DateTime '%Y-%m-%d %H:%M:%S', Timestamp RFC-3339."""
    df = spark.createDataFrame(
        [
            (
                datetime.date(2024, 3, 5),
                datetime.datetime(2024, 3, 5, 7, 8, 9),
                datetime.datetime(2024, 3, 5, 7, 8, 9),
            )
        ],
        "d date, dt timestamp_ntz, ts timestamp",
    )
    out = tmp_path / "out.json"
    JsonSink(str(out)).load(df)
    [row] = json.loads(out.read_text())
    assert row["d"] == "2024-03-05"
    assert row["dt"] == "2024-03-05 07:08:09"
    assert row["ts"] == "2024-03-05T07:08:09+00:00"
