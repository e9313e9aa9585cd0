"""Dead-letter queue: unmergeable envelope rows are quarantined, the
happy path stays one-pass (no DLQ output when nothing is bad), and the
table state matches applying only the valid rows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.cdc.apply import apply_batch
from etl_rs_spark.config import CdcConfig
from etl_rs_spark.generator import gen_change_stream, to_envelope
from etl_rs_spark.sinks.lake import LakeTable

DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


@pytest.fixture()
def envelope(spark):
    ev = gen_change_stream(
        spark, n_events=400, n_convs=20, turns_per_conv=8, seed=11
    )
    return to_envelope(ev)


def _corrupt(envelope):
    """Null the key of 3 rows and break the payload JSON of 2 others."""
    return envelope.select(
        F.when(F.col("lsn").isin(5, 6, 7), F.lit(None).cast("string"))
        .otherwise(F.col("conv_id"))
        .alias("conv_id"),
        "turn_idx",
        "ts",
        "op",
        "lsn",
        F.when(F.col("lsn").isin(10, 11), F.lit("{not json"))
        .otherwise(F.col("payload"))
        .alias("payload"),
    )


def test_bad_rows_quarantined_and_state_clean(spark, tmp_path, envelope):
    dlq = str(tmp_path / "dlq")
    cfg = CdcConfig(num_buckets=4, dead_letter_dir=dlq)
    table = LakeTable.create(spark, str(tmp_path / "t"), DDL, num_buckets=4)
    corrupted = _corrupt(envelope)
    stats = apply_batch(table, corrupted, batch_id=0, run_id="r", cfg=cfg)
    assert stats["dlq_rows"] == 5

    quarantined = spark.read.parquet(dlq)
    got = {
        (r.lsn, r.dlq_reason) for r in quarantined.collect()
    }
    assert got == {
        (5, "null_key_field"),
        (6, "null_key_field"),
        (7, "null_key_field"),
        (10, "unparseable_payload"),
        (11, "unparseable_payload"),
    }
    assert {r.dlq_batch_id for r in quarantined.collect()} == {0}

    # final state == applying only the valid rows to a fresh table
    clean_table = LakeTable.create(
        spark, str(tmp_path / "t2"), DDL, num_buckets=4
    )
    valid = corrupted.where(
        F.col("conv_id").isNotNull() & ~F.col("lsn").isin(10, 11)
    )
    apply_batch(clean_table, valid, batch_id=0, run_id="r", cfg=CdcConfig(num_buckets=4))
    a = table.read().orderBy("conv_id", "turn_idx").toPandas()
    b = clean_table.read().orderBy("conv_id", "turn_idx").toPandas()
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_no_dlq_write_when_clean(spark, tmp_path, envelope):
    dlq = str(tmp_path / "dlq")
    cfg = CdcConfig(num_buckets=4, dead_letter_dir=dlq)
    table = LakeTable.create(spark, str(tmp_path / "t"), DDL, num_buckets=4)
    stats = apply_batch(table, envelope, batch_id=0, run_id="r", cfg=cfg)
    assert stats["dlq_rows"] == 0
    # rare-path gating: the quarantine job never launched
    assert not os.path.exists(dlq)


def test_all_bad_batch_is_empty_but_quarantined(spark, tmp_path, envelope):
    dlq = str(tmp_path / "dlq")
    cfg = CdcConfig(num_buckets=4, dead_letter_dir=dlq)
    table = LakeTable.create(spark, str(tmp_path / "t"), DDL, num_buckets=4)
    all_bad = envelope.select(
        F.lit(None).cast("string").alias("conv_id"),
        "turn_idx",
        "ts",
        "op",
        "lsn",
        "payload",
    )
    stats = apply_batch(table, all_bad, batch_id=0, run_id="r", cfg=cfg)
    assert stats.get("skipped") and stats["dlq_rows"] == envelope.count()
    assert spark.read.parquet(dlq).count() == envelope.count()
    assert table.read().count() == 0


def test_dlq_through_stream_driver(spark, tmp_path, envelope):
    """End-to-end: a binlog containing corrupt rows streams through
    StreamDriver; bad rows land in the DLQ, good rows reach the table,
    and the final state equals the valid-only replay."""
    from etl_rs_spark.cdc.stream import StreamDriver
    from etl_rs_spark.generator import write_event_files

    dlq = str(tmp_path / "dlq")
    corrupted = _corrupt(envelope)
    write_event_files(corrupted, str(tmp_path / "binlog"), n_files=4)
    table = LakeTable.create(spark, str(tmp_path / "t"), DDL, num_buckets=4)
    stats = StreamDriver(
        spark,
        table,
        str(tmp_path / "binlog"),
        str(tmp_path / "ckpt"),
        cfg=CdcConfig(num_buckets=4, dead_letter_dir=dlq),
    ).run_available_now()
    assert sum(s.get("dlq_rows", 0) for s in stats) == 5
    assert spark.read.parquet(dlq).count() == 5

    clean_table = LakeTable.create(spark, str(tmp_path / "t2"), DDL, num_buckets=4)
    valid = corrupted.where(
        F.col("conv_id").isNotNull() & ~F.col("lsn").isin(10, 11)
    )
    apply_batch(clean_table, valid, batch_id=0, run_id="r", cfg=CdcConfig(num_buckets=4))
    import pandas.testing as pdt

    a = table.read().orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    b = clean_table.read().orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    pdt.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)
