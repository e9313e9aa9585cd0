"""Pipeline API end-to-end (reference tests
/root/reference/src/pipeline/mod.rs:477-556) + config/events parity."""

import os

import pytest

from etl_rs_spark import sinks, sources
from etl_rs_spark.config import EngineConfig
from etl_rs_spark.errors import ConfigError, ETLError, ExtractError
from etl_rs_spark.events import InMemoryEventEmitter
from etl_rs_spark.operators import transforms as tr
from etl_rs_spark.pipeline import Pipeline


@pytest.fixture()
def users_csv(tmp_path):
    p = tmp_path / "users.csv"
    p.write_text(
        "id,name,age,active\n"
        "1,Alice,30,true\n2,Bob,17,true\n3,Carol,25,false\n4,Dan,42,true\n"
    )
    return str(p)


def test_pipeline_csv_filter_memory(spark, users_csv):
    """CSV -> filter(active AND age>=18) -> memory; golden row count
    (reference E2E test /root/reference/src/pipeline/mod.rs:486-510)."""
    sink = sinks.MemorySink()
    emitter = InMemoryEventEmitter()
    p = (
        Pipeline.builder()
        .extract(sources.CsvSource(users_csv))
        .transform(lambda df: tr.filter_rows(df, "active AND age >= 18"))
        .load(sink)
        .emitter(emitter)
        .build()
    )
    result = p.execute(spark)
    assert result.rows_processed == 2
    assert sorted(r["id"] for r in sink.get_data()) == [1, 4]
    kinds = [e.kind for e in emitter.events]
    assert kinds[0] == "started" and kinds[-1] == "completed"
    assert "state_changed" in kinds


def test_pipeline_metrics_accumulate(spark, users_csv):
    # metrics accumulate across runs (/root/reference/src/pipeline/mod.rs:289-315)
    p = (
        Pipeline.builder()
        .extract(sources.CsvSource(users_csv))
        .load(sinks.MemorySink())
        .build()
    )
    p.execute(spark)
    p.execute(spark)
    assert p.metrics.executions == 2
    assert p.metrics.total_rows_processed == 8
    assert p.metrics.success_rate == 1.0


def test_pipeline_failure_emits_error_and_records(spark):
    emitter = InMemoryEventEmitter()
    p = (
        Pipeline.builder()
        .extract(sources.CsvSource("/nonexistent/nope.csv"))
        .load(sinks.MemorySink())
        .emitter(emitter)
        .build()
    )
    with pytest.raises(ExtractError):
        p.execute(spark)
    assert p.state == "failed"
    assert emitter.of_kind("error")
    assert p.metrics.executions == 1 and p.metrics.success_rate == 0.0


def test_builder_requires_extractor_and_loader():
    with pytest.raises(ETLError):
        Pipeline.builder().build()


def test_pipeline_streaming_csv(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.csv").write_text("1,Alice\n2,Bob\n")
    (d / "b.csv").write_text("3,Carol\n")
    sink = sinks.MemorySink()
    p = (
        Pipeline.builder()
        .extract(
            sources.CsvSource(str(d), headers=False, schema="id int, name string")
        )
        .load(sink)
        .build()
    )
    p.execute_streaming(spark, str(tmp_path / "ckpt"), timeout_s=120)
    assert len(sink) == 3


# ------------------------------------------------------------- config --
def test_config_validation_rejects_zero():
    # (/root/reference/src/config.rs:195-220)
    from dataclasses import replace

    cfg = EngineConfig()
    bad = replace(cfg, pipeline=replace(cfg.pipeline, batch_size=0))
    with pytest.raises(ConfigError):
        bad.validate()


def test_config_env_overrides(monkeypatch):
    # ETL_* env names (/root/reference/src/config.rs:124-174)
    monkeypatch.setenv("ETL_BATCH_SIZE", "77")
    monkeypatch.setenv("ETL_RETRY_ATTEMPTS", "9")
    cfg = EngineConfig.from_env()
    assert cfg.pipeline.batch_size == 77
    assert cfg.pipeline.retry_attempts == 9
    monkeypatch.setenv("ETL_BATCH_SIZE", "zero")
    with pytest.raises(ConfigError):
        EngineConfig.from_env()


def test_plugin_hooks_fire_and_rewrite(spark, users_csv):
    """PluginRegistry parity — the reference declares these hooks but
    never wires them into execute (/root/reference/src/plugins.rs:96-191
    vs /root/reference/src/pipeline/mod.rs:89-212); here they fire and
    may rewrite the frame."""
    from etl_rs_spark.plugins import PluginRegistry

    calls = []
    reg = PluginRegistry()
    reg.register_before("extract", lambda ctx, df: calls.append("be") or None)
    reg.register_after(
        "extract", lambda ctx, df: calls.append("ae") or df.limit(3)
    )
    reg.register_before("load", lambda ctx, df: calls.append("bl") or None)
    reg.register_after("load", lambda ctx, df: calls.append("al") or None)

    sink = sinks.MemorySink()
    p = (
        Pipeline.builder()
        .extract(sources.CsvSource(users_csv))
        .load(sink)
        .plugins(reg)
        .build()
    )
    res = p.execute(spark)
    assert calls == ["be", "ae", "bl", "al"]
    assert res.rows_processed == 3  # after_extract rewrote to limit(3)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        reg.register_before("nope", lambda c, d: None)


def test_validator_warn_and_fail_policies(spark, users_csv):
    """Validator trait analogue (ref src/traits.rs:77-86, declared-only
    there): one-scan declarative rule evaluation; warn emits the
    violation event and continues, fail aborts as TransformError."""
    from pyspark.sql import functions as F

    from etl_rs_spark.errors import TransformError
    from etl_rs_spark.validate import RuleValidator

    v = RuleValidator(
        {"adult": F.col("age") >= 18, "has_name": F.col("name").isNotNull()}
    )
    emitter = InMemoryEventEmitter()
    sink = sinks.MemorySink()
    p = (
        Pipeline.builder()
        .extract(sources.CsvSource(users_csv))
        .load(sink)
        .emitter(emitter)
        .validate(v, policy="warn")
        .build()
    )
    result = p.execute(spark)
    assert result.rows_processed == 4  # warn: load still happens
    ev = [e for e in emitter.events if e.kind == "validation_failed"]
    assert len(ev) == 1
    assert ev[0].data["violations"] == ["adult: 1 rows violate"]

    strict = (
        Pipeline.builder()
        .extract(sources.CsvSource(users_csv))
        .load(sinks.MemorySink())
        .emitter(InMemoryEventEmitter())
        .validate(v, policy="fail")
        .build()
    )
    with pytest.raises(TransformError, match="adult"):
        strict.execute(spark)

    # clean data passes silently
    ok = RuleValidator({"id_present": F.col("id").isNotNull()})
    assert ok.validate(spark.read.option("header", True).csv(users_csv)) == []
