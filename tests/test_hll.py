"""HLL sketch: constant state size, documented error, merge algebra —
and the approx mode of the stateful running-stats operator."""

from __future__ import annotations

import pytest

from etl_rs_spark.functions import hll

P = 12
M = 1 << P


def test_sketch_size_constant_as_cardinality_grows():
    s = hll.empty_sketch(P)
    assert len(s) == M
    for n in (10, 1_000, 50_000):
        s = hll.add_values(s, [f"v{i}" for i in range(n)], P)
        assert len(s) == M  # byte size never grows


def test_estimate_within_documented_error():
    # rse = 1.04/sqrt(4096) ~ 1.6%; assert a 3-sigma band (5%)
    for n in (100, 5_000, 100_000):
        s = hll.add_values(hll.empty_sketch(P), [f"k{i}" for i in range(n)], P)
        est = hll.estimate(s, P)
        assert abs(est - n) / n < 0.05, f"n={n} est={est}"


def test_estimate_exactish_at_tiny_cardinality():
    # linear counting regime: tiny sets estimate near-exactly
    s = hll.add_values(hll.empty_sketch(P), ["a", "b", "c", "a", "b"], P)
    assert hll.estimate(s, P) == 3


def test_duplicates_do_not_move_estimate():
    vals = [f"d{i}" for i in range(2_000)]
    s1 = hll.add_values(hll.empty_sketch(P), vals, P)
    s2 = hll.add_values(s1, vals * 3, P)  # re-add everything thrice
    assert s1 == s2


def test_merge_is_union():
    a = hll.add_values(hll.empty_sketch(P), [f"a{i}" for i in range(3_000)], P)
    b = hll.add_values(hll.empty_sketch(P), [f"b{i}" for i in range(3_000)], P)
    merged = hll.merge(a, b)
    est = hll.estimate(merged, P)
    assert abs(est - 6_000) / 6_000 < 0.05
    # merging with itself is idempotent
    assert hll.merge(a, a) == a


def test_incremental_equals_bulk():
    vals = [f"x{i}" for i in range(10_000)]
    bulk = hll.add_values(hll.empty_sketch(P), vals, P)
    inc = hll.empty_sketch(P)
    for i in range(0, len(vals), 997):
        inc = hll.add_values(inc, vals[i : i + 997], P)
    assert bulk == inc


def test_running_group_stats_approx_mode(spark, tmp_path):
    """Streaming drain with approx_distinct=True: n_distinct tracks the
    true per-key cardinality within the error band while the state row
    carries a constant-size sketch; exact mode on the same input stays
    exact."""
    import uuid

    from pyspark.sql import functions as F

    from etl_rs_spark.streaming.stateful import running_group_stats

    n_per_key = 4_000
    rows = spark.range(2 * n_per_key).select(
        F.when(F.col("id") < n_per_key, F.lit("k1"))
        .otherwise(F.lit("k2"))
        .alias("uid"),
        F.concat(F.lit("val"), F.col("id")).alias("v"),  # all distinct
        (
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id"))
        ).alias("ts"),
    )
    src_dir = str(tmp_path / "src")
    rows.repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    qname = "approx_" + uuid.uuid4().hex[:8]
    q = (
        running_group_stats(
            stream, "uid", "v", ts_col="ts", approx_distinct=True
        )
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(240), "drain did not finish"
    finally:
        q.stop()
    got = spark.table(qname).toPandas()
    final = got.groupby("uid").last()
    assert set(final.index) == {"k1", "k2"}
    for uid in ("k1", "k2"):
        est = final.loc[uid, "n_distinct"]
        assert abs(est - n_per_key) / n_per_key < 0.05, (uid, est)
        assert final.loc[uid, "n_events"] == n_per_key
