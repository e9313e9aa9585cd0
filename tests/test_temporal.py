"""as-of and interval joins vs independent oracles (pandas merge_asof /
brute-force filtering) + plan shape (no nested-loop join)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_rs_spark.operators.temporal import asof_join, interval_join

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def events_df(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type")
    )


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts(1), 100.0),
            ("A", _ts(5), 101.0),
            ("A", _ts(10), 99.0),
            ("B", _ts(2), 50.0),
            ("B", _ts(3), 51.0),
            ("C", _ts(4), 7.0),  # key with no quotes at all
        ],
        "sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 99.5),
            ("A", _ts(5), 100.5),  # equal-ts: backward match is inclusive
            ("A", _ts(7), 98.5),
            ("B", _ts(2.5), 49.5),
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_matches_pandas(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = (
        asof_join(trades, quotes, on="sym")
        .toPandas()
        .sort_values(["sym", "ts"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        trades.toPandas().sort_values("ts"),
        quotes.toPandas().sort_values("ts").rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
        by="sym",
        direction="backward",
    ).sort_values(["sym", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["sym", "ts", "price", "ts_r", "bid"]],
        want[["sym", "ts", "price", "ts_r", "bid"]],
        check_dtype=False,
    )
    # the equal-ts trade took the equal-ts quote (inclusive)
    row = got[(got.sym == "A") & (got.ts == _ts(5))].iloc[0]
    assert row.bid == 100.5
    # key with no right rows survives with nulls (left join)
    assert got[got.sym == "C"].bid.isna().all()


def test_asof_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = asof_join(trades, quotes, on="sym", direction="forward").toPandas()
    by_key = {(r.sym, r.ts): r for r in got.itertuples()}
    assert by_key[("A", _ts(1))].bid == 100.5  # next quote at t=5
    assert by_key[("A", _ts(5))].bid == 100.5  # inclusive
    assert by_key[("A", _ts(10))].ts_r is pd.NaT or pd.isna(
        by_key[("A", _ts(10))].bid
    )  # nothing after t=7... at t=10


def test_asof_suffixes_colliding_payload(spark):
    left = spark.createDataFrame(
        [("k", _ts(1), 1.0)], "k string, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [("k", _ts(0), 2.0)], "k string, ts timestamp, v double"
    )
    out = asof_join(left, right, on="k")
    assert set(out.columns) == {"k", "ts", "v", "ts_r", "v_r"}
    row = out.collect()[0]
    assert row.v == 1.0 and row.v_r == 2.0


def test_asof_null_payload_travels_with_its_row(spark):
    """A NULL payload column on the MATCHED right row must stay NULL —
    not be backfilled from an older right row (which would fabricate a
    composite row that never existed)."""
    left = spark.createDataFrame(
        [("k", _ts(10))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", _ts(0), 1.0, "old"),
            ("k", _ts(5), None, "new"),  # matched row: a IS NULL
        ],
        "k string, ts timestamp, a double, b string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row.ts_r == _ts(5) and row.b == "new"
    assert row.a is None, (
        f"NULL payload was backfilled from an older right row: a={row.a}"
    )


def test_asof_null_payload_forward_direction(spark):
    left = spark.createDataFrame([("k", _ts(0))], "k string, ts timestamp")
    right = spark.createDataFrame(
        [
            ("k", _ts(5), None, "near"),  # matched (smallest ts >= left)
            ("k", _ts(9), 2.0, "far"),
        ],
        "k string, ts timestamp, a double, b string",
    )
    row = asof_join(left, right, on="k", direction="forward").collect()[0]
    assert row.ts_r == _ts(5) and row.b == "near" and row.a is None


def test_asof_non_timestamp_ts_types(spark):
    """Epoch-long timestamps: the matched-ts output column keeps the
    right side's dtype instead of a hardcoded timestamp cast."""
    left = spark.createDataFrame(
        [("k", 100), ("k", 5)], "k string, ts bigint"
    )
    right = spark.createDataFrame(
        [("k", 10, 1.5), ("k", 90, 2.5)], "k string, ts bigint, v double"
    )
    out = asof_join(left, right, on="k")
    assert out.schema["ts_r"].dataType.simpleString() == "bigint"
    by_ts = {r.ts: r for r in out.collect()}
    assert by_ts[100].ts_r == 90 and by_ts[100].v == 2.5
    assert by_ts[5].ts_r is None and by_ts[5].v is None


def test_interval_join_exact_vs_bruteforce(spark, events_df):
    left = events_df.where(F.col("event_type") == "click")
    right = events_df.where(F.col("event_type") == "purchase")
    got = interval_join(
        left, right, on="user_id", low_s=-600, high_s=600
    ).select("event_id", "event_id_r")
    lp = left.toPandas()
    rp = right.toPandas()
    merged = lp.merge(rp, on="user_id", suffixes=("", "_r"))
    dtv = (merged.ts_r - merged.ts).dt.total_seconds()
    want = merged[(dtv >= -600) & (dtv <= 600)][["event_id", "event_id_r"]]
    g = got.toPandas().sort_values(["event_id", "event_id_r"]).reset_index(drop=True)
    w = want.sort_values(["event_id", "event_id_r"]).reset_index(drop=True)
    assert len(g) == len(w) and len(g) > 0
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_interval_join_plan_no_nested_loop(spark, events_df):
    left = events_df.where(F.col("event_type") == "click")
    right = events_df.where(F.col("event_type") == "purchase")
    plan = interval_join(
        left, right, on="user_id", low_s=-600, high_s=600
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_boundary_exact_at_bin_edges(spark):
    # right rows exactly at left_ts+low and left_ts+high are included;
    # one microsecond outside is not
    left = spark.createDataFrame([("k", _ts(10))], "k string, ts timestamp")
    rows = [
        ("k", _ts(10) + dt.timedelta(seconds=-600), "lo_edge"),
        ("k", _ts(10) + dt.timedelta(seconds=600), "hi_edge"),
        ("k", _ts(10) + dt.timedelta(seconds=-600, microseconds=-1), "below"),
        ("k", _ts(10) + dt.timedelta(seconds=600, microseconds=1), "above"),
    ]
    right = spark.createDataFrame(rows, "k string, ts timestamp, tag string")
    got = interval_join(left, right, on="k", low_s=-600, high_s=600)
    tags = {r.tag for r in got.collect()}
    assert tags == {"lo_edge", "hi_edge"}


def test_stream_interval_join_matches_batch(spark, events_df, tmp_path):
    """Watermarked stream-stream interval join drains to the same pairs
    as the batch bin-bucketed operator on identical inputs."""
    import uuid

    from etl_rs_spark.streaming.windows import stream_interval_join

    clicks = events_df.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events_df.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks.write.parquet(cdir)
    purchases.write.parquet(pdir)
    sc = spark.readStream.schema(clicks.schema).parquet(cdir)
    sp = spark.readStream.schema(purchases.schema).parquet(pdir)
    out = stream_interval_join(
        sc, sp, on="user_id", low_s=-1800, high_s=1800, watermark="1 hour"
    )
    qname = "ssj_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    assert q.exception() is None
    got = (
        spark.table(qname)
        .select("event_id", "event_id_r")
        .toPandas()
        .sort_values(["event_id", "event_id_r"])
        .reset_index(drop=True)
    )
    from etl_rs_spark.operators.temporal import interval_join

    want = (
        interval_join(clicks, purchases, on="user_id", low_s=-1800, high_s=1800)
        .select("event_id", "event_id_r")
        .toPandas()
        .sort_values(["event_id", "event_id_r"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_interval_join_fractional_seconds(spark, tmp_path):
    """Sub-second bounds must not be truncated toward zero: with
    low_s=-0.5/high_s=0.5, a right row 400ms away is in-window and one
    700ms away is not — same as the microsecond-exact batch operator."""
    import uuid

    from etl_rs_spark.operators.temporal import interval_join
    from etl_rs_spark.streaming.windows import stream_interval_join

    left = spark.createDataFrame(
        [("L1", "k", _ts(10))], "event_id string, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("R_in", "k", _ts(10) + dt.timedelta(milliseconds=400)),
            ("R_out", "k", _ts(10) + dt.timedelta(milliseconds=700)),
            ("R_in2", "k", _ts(10) - dt.timedelta(milliseconds=500)),
        ],
        "event_id string, k string, ts timestamp",
    )
    cdir, pdir = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(cdir)
    right.write.parquet(pdir)
    sl = spark.readStream.schema(left.schema).parquet(cdir)
    sr = spark.readStream.schema(right.schema).parquet(pdir)
    out = stream_interval_join(
        sl, sr, on="k", low_s=-0.5, high_s=0.5, watermark="10 seconds"
    )
    qname = "ssjf_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    assert q.exception() is None
    got = {r.event_id_r for r in spark.table(qname).collect()}
    assert got == {"R_in", "R_in2"}
    want = {
        r.event_id_r
        for r in interval_join(
            left, right, on="k", low_s=-0.5, high_s=0.5
        ).collect()
    }
    assert got == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

#: adversarial asof inputs: tiny hot keyspace, colliding timestamps,
#: keys that exist on only one side
_left_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=8),  # minute bucket (collisions)
    ),
    min_size=1,
    max_size=25,
)
_right_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "d"]),
        st.integers(min_value=0, max_value=8),
    ),
    min_size=1,
    max_size=25,
    unique=True,  # unique (key, ts): the determinism contract
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(lrows=_left_rows, rrows=_right_rows)
def test_asof_property_matches_merge_asof(spark, lrows, rrows):
    """For arbitrary key/timestamp layouts (ts collisions across rows,
    one-sided keys, equal left/right ts), asof_join == pandas
    merge_asof. Left rows get a synthetic unique id so multiplicity is
    checked too."""
    left = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(lrows)],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, _ts(m), float(m)) for (k, m) in rrows],
        "k string, ts timestamp, payload double",
    )
    got = (
        asof_join(left, right, on="k")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.toPandas().sort_values(["ts", "lid"]),
        right.toPandas().sort_values("ts").rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
        by="k",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["lid", "k", "ts", "ts_r", "payload"]],
        want[["lid", "k", "ts", "ts_r", "payload"]],
        check_dtype=False,
    )


def test_asof_plan_single_shuffle(spark, trades_quotes):
    """The asof union trick must cost ONE hash-partition exchange (by
    key) — no join exchange, no nested loop. That single shuffle is the
    operator's 100x-scale story."""
    trades, quotes = trades_quotes
    plan = (
        asof_join(trades, quotes, on="sym")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, f"expected 1 keyed exchange, saw {n_exchange}:\n{plan}"
