"""CDF-driven incremental consumer: N pruned pulls == full recompute."""

from __future__ import annotations

import sys

import pandas.testing as pdt
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/jobs")

from cdf_consumer_job import cursor, ensure_downstream, pull_increment

from etl_rs_spark.cdc.apply import apply_batch
from etl_rs_spark.config import CdcConfig
from etl_rs_spark.generator import gen_change_stream, to_envelope
from etl_rs_spark.sinks.lake import LakeTable

DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _recompute(src):
    """Ground truth: derived rows straight off the current source state."""
    return (
        src.read()
        .select(
            "conv_id",
            "turn_idx",
            "role",
            F.length("text").cast("int").alias("text_len"),
            "ts",
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_incremental_pulls_equal_full_recompute(spark, tmp_path):
    cfg = CdcConfig(num_buckets=8)
    src = LakeTable.create(spark, str(tmp_path / "src"), DDL, num_buckets=8)
    dst = ensure_downstream(spark, str(tmp_path / "dst"), num_buckets=8)
    ev = to_envelope(
        gen_change_stream(
            spark, n_events=1200, n_convs=40, turns_per_conv=6, seed=5
        )
    ).cache()

    # 3 source batches, one incremental pull after each
    bounds = [(0, 400), (400, 800), (800, 10**9)]
    for i, (lo, hi) in enumerate(bounds):
        apply_batch(
            src,
            ev.where((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
            batch_id=i,
            run_id="r",
            cfg=cfg,
        )
        stats = pull_increment(src, dst)
        assert not stats["skipped"]
        assert cursor(dst) == src.current().version

    got = (
        dst.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _recompute(src)
    assert len(got) == len(want) > 0
    pdt.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )

    # re-pull with no new source version: skipped, downstream untouched
    v = dst.current().version
    stats = pull_increment(src, dst)
    assert stats["skipped"] and dst.current().version == v

    ev.unpersist()


def test_pull_reads_only_changed_buckets(spark, tmp_path):
    """A source merge touching one conversation leads to a pull whose
    downstream merge touches only that conversation's bucket — the
    O(changed data) consumer the per-file LSN pruning exists for."""
    import datetime as dt
    import os

    cfg = CdcConfig(num_buckets=8)
    src = LakeTable.create(spark, str(tmp_path / "src"), DDL, num_buckets=8)
    dst = ensure_downstream(spark, str(tmp_path / "dst"), num_buckets=8)
    ts = dt.datetime(2024, 1, 1)
    wide = spark.createDataFrame(
        [(i, "U", f"c{i}", 0, ts, '{"text": "x"}') for i in range(64)],
        "lsn long, op string, conv_id string, turn_idx int, ts timestamp, payload string",
    )
    apply_batch(src, wide, batch_id=0, run_id="r", cfg=cfg)
    pull_increment(src, dst)
    narrow = spark.createDataFrame(
        [(100, "U", "c0", 0, ts, '{"text": "updated"}')],
        "lsn long, op string, conv_id string, turn_idx int, ts timestamp, payload string",
    )
    apply_batch(src, narrow, batch_id=1, run_id="r", cfg=cfg)

    frm = cursor(dst)
    feed = src.changes(frm)
    opened = {os.path.abspath(p.replace("file:", "")) for p in feed.inputFiles()}
    assert len(opened) < len(src.current().files)  # pruned scan

    stats = pull_increment(src, dst)
    assert len(stats["buckets_touched"]) == 1  # one conv -> one bucket
    row = (
        dst.read()
        .where((F.col("conv_id") == "c0") & (F.col("turn_idx") == 0))
        .collect()[0]
    )
    assert row.text_len == len("updated")
