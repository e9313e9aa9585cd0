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
