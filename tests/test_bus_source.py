"""Message-bus source support: the Kafka-record -> CDC-envelope decode
is a pure DataFrame transform, tested here without any Kafka jar; a
JSONL binlog through StreamDriver(fmt="json") proves the reader's
format/source_options plumbing end-to-end on a second source format.
"""

from __future__ import annotations

import json

import pytest

from etl_rs_spark.cdc.bus import decode_bus_frame
from etl_rs_spark.generator import ENVELOPE_SCHEMA


def _kafka_frame(spark, values):
    """A frame shaped like spark-sql-kafka's output (binary value +
    broker metadata)."""
    rows = [
        (b"k", v.encode("utf-8"), "topic", 0, i, None) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )


def test_decode_bus_frame_roundtrip(spark):
    env = {
        "lsn": 7, "op": "U", "conv_id": "c1", "turn_idx": 3,
        "ts": "2024-01-01T00:00:00.000Z",
        "payload": json.dumps({"text": "hello"}),
    }
    import pyspark.sql.types as T

    out = decode_bus_frame(_kafka_frame(spark, [json.dumps(env)]))
    assert out.schema == T.StructType.fromDDL(ENVELOPE_SCHEMA)
    r = out.collect()[0]
    assert (r.lsn, r.op, r.conv_id, r.turn_idx) == (7, "U", "c1", 3)
    assert json.loads(r.payload)["text"] == "hello"
    # broker metadata must not leak into the envelope
    assert "offset" not in out.columns and "topic" not in out.columns


def test_decode_bus_frame_malformed_value_yields_null_keys(spark):
    """Garbage payloads become null-keyed rows — exactly what the
    dead-letter gate quarantines — rather than failing the batch."""
    out = decode_bus_frame(
        _kafka_frame(spark, ["{not json", '{"lsn": 1, "conv_id": "ok", "op": "U", "turn_idx": 0}'])
    ).collect()
    assert len(out) == 2
    bad = [r for r in out if r.conv_id is None]
    ok = [r for r in out if r.conv_id == "ok"]
    assert len(bad) == 1 and len(ok) == 1


def test_stream_driver_jsonl_source(spark, tmp_path):
    """StreamDriver's source plumbing is format-agnostic: the same
    binlog as JSONL files through fmt='json' applies identically."""
    import datetime

    from etl_rs_spark.cdc.stream import StreamDriver
    from etl_rs_spark.config import CdcConfig
    from etl_rs_spark.sinks.lake import LakeTable

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    ts = "2024-01-01T00:00:00.000Z"
    for i, (lsn, conv, text) in enumerate(
        [(1, "a", "x"), (2, "b", "y"), (3, "a", "x2")]
    ):
        with open(binlog / f"part-{i}.jsonl", "w") as f:
            f.write(json.dumps({
                "lsn": lsn, "op": "U", "conv_id": conv, "turn_idx": 0,
                "ts": ts, "payload": json.dumps({"text": text}),
            }) + "\n")

    table = LakeTable.create(
        spark, str(tmp_path / "t"),
        "conv_id string, turn_idx int, text string, ts timestamp",
        num_buckets=2,
    )
    stats = StreamDriver(
        spark, table, str(binlog), str(tmp_path / "ckpt"),
        cfg=CdcConfig(num_buckets=2), fmt="json",
    ).run_available_now(timeout_s=120)
    assert sum(s["n_events"] for s in stats if not s.get("skipped")) == 3
    got = {r.conv_id: r.text for r in table.read().collect()}
    assert got == {"a": "x2", "b": "y"}  # LWW winner per conv


def test_kafka_fmt_requires_connector(spark, tmp_path):
    """fmt='kafka' wires the bus reader; without the connector jar the
    source registration fails with Spark's standard error (clear,
    actionable) — the engine adds no silent fallback."""
    from etl_rs_spark.cdc.stream import StreamDriver
    from etl_rs_spark.sinks.lake import LakeTable

    table = LakeTable.create(
        spark, str(tmp_path / "t"),
        "conv_id string, turn_idx int, ts timestamp", num_buckets=2,
    )
    d = StreamDriver(
        spark, table, "ignored", str(tmp_path / "ckpt"),
        fmt="kafka",
        source_options={"kafka.bootstrap.servers": "none:9092",
                        "subscribe": "cdc"},
    )
    try:
        d._reader()
    except Exception as exc:
        assert "kafka" in str(exc).lower()
    else:
        pytest.skip("kafka connector present; smoke covered elsewhere")
