"""Funnel correctness: the greedy earliest-subsequence result must
equal a brute-force ordered-subsequence existence check."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.operators.funnel import funnel_counts, funnel_stage_times

STAGES = ["signup", "click", "purchase"]


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )


def _brute_force_depth(rows, stages):
    """Longest prefix of `stages` existing as a strictly-ts-increasing
    subsequence — canonical single-pointer subsequence scan over the
    ts-sorted events (independent of the engine's per-stage
    min-aggregation implementation)."""
    rows = sorted(rows, key=lambda r: r[0])
    depth = 0
    last_ts = None
    for ts, typ in rows:
        if depth < len(stages) and typ == stages[depth] and (
            last_ts is None or ts > last_ts
        ):
            depth += 1
            last_ts = ts
    return depth


def test_funnel_matches_bruteforce(spark, events):
    times = funnel_stage_times(events, STAGES).toPandas()
    got_depth = {}
    for r in times.itertuples():
        d = 0
        for i in range(len(STAGES)):
            if getattr(r, f"stage_{i}_ts") is not None and not (
                getattr(r, f"stage_{i}_ts") != getattr(r, f"stage_{i}_ts")
            ):  # not NaT
                d = i + 1
            else:
                break
        got_depth[r.user_id] = d

    pdf = events.toPandas()
    for uid, grp in pdf.groupby("user_id"):
        rows = list(zip(grp.ts, grp.event_type))
        want = _brute_force_depth(rows, STAGES)
        assert got_depth.get(uid, 0) == want, f"user {uid}"


def test_funnel_is_single_shuffle_any_k(spark, events):
    """One keyed aggregation for ANY stage count: the events scan and
    shuffle happen once; extra stages add Column expressions, not
    joins (the pre-r4 shape re-scanned events k-1 times)."""
    from etl_rs_spark import plans

    for stages in (STAGES, STAGES + ["error", "login"]):
        plan = plans.physical_plan(funnel_stage_times(events, stages))
        assert plan.count("Exchange") <= 1, plan
        assert "Join" not in plan, plan


def test_funnel_counts_monotone(spark, events):
    c = funnel_counts(events, STAGES).toPandas().sort_values("stage_idx")
    ns = list(c.n_keys)
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert list(c.stage) == STAGES
