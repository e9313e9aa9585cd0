"""The /proc process-tree CPU metric behind the soak cost gate and
apply_cpu_ms: monotone, load-attributable, covers JVM work."""

from __future__ import annotations

from etl_rs_spark.cpu import process_tree_cpu_ms, spark_cpu_ms


def test_tree_cpu_monotone_and_counts_own_burn():
    import os

    a = process_tree_cpu_ms(os.getpid())
    assert a is not None and a >= 0
    # burn ~100ms of CPU in this process
    x = 0
    for i in range(3_000_000):
        x += i * i
    b = process_tree_cpu_ms(os.getpid())
    assert b >= a + 50, f"burned CPU not observed: {a} -> {b}"


def test_spark_cpu_counts_jvm_work(spark):
    a = spark_cpu_ms(spark)
    assert a is not None
    # a real JVM-side job must move the counter
    spark.range(0, 30_000_000, 1, 8).selectExpr(
        "sum(pmod(xxhash64(id), 1000))"
    ).collect()
    b = spark_cpu_ms(spark)
    assert b > a, f"JVM job CPU not observed: {a} -> {b}"


def test_apply_batch_reports_cpu(spark, tmp_path):
    from etl_rs_spark.cdc.apply import apply_batch
    from etl_rs_spark.config import CdcConfig
    from etl_rs_spark.sinks.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        "conv_id string, turn_idx int, ts timestamp", num_buckets=2,
    )
    ts = __import__("datetime").datetime(2024, 1, 1)
    env = spark.createDataFrame(
        [(1, "U", "a", 0, ts, "{}")],
        "lsn long, op string, conv_id string, turn_idx int, "
        "ts timestamp, payload string",
    )
    stats = apply_batch(t, env, batch_id=0, run_id="r", cfg=CdcConfig(num_buckets=2))
    assert stats["apply_cpu_ms"] is not None and stats["apply_cpu_ms"] >= 0
