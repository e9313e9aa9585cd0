"""Ordered-event funnel over a keyed event stream (conversation/user
journey analysis: did stage_1 happen, then stage_2 strictly after it,
then stage_3 ...).

Existence of an ordered subsequence is decided by the earliest-first
greedy: take the FIRST stage-1 event, then the first stage-2 event
strictly after it, and so on — if any ordered witness exists, the
greedy one does (exchange argument), so the computation is k
conditional min-aggregations instead of a combinatorial search.

Scale shape: every aggregation and join is keyed on the same entity
column, so after the first hash partitioning the per-stage joins are
co-partitioned (no re-shuffle of the big side under AQE's exchange
reuse), and each stage pass is a map-side-combinable min(). No windows,
no sorts, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    df: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per key: the greedy completion timestamp of each funnel stage
    (``stage_{i}_ts``, NULL from the first uncompleted stage on).
    Stage i's timestamp is the min event time of ``stages[i]`` strictly
    after stage i-1's timestamp."""
    if not stages:
        raise ValueError("stages must be non-empty")
    ev = df.select(key_col, ts_col, type_col)
    out = ev.groupBy(key_col).agg(
        F.min(F.when(F.col(type_col) == stages[0], F.col(ts_col))).alias(
            "stage_0_ts"
        )
    )
    for i, stage in enumerate(stages[1:], start=1):
        prev = f"stage_{i-1}_ts"
        nxt = (
            ev.join(out.select(key_col, prev), key_col)
            .where(
                (F.col(type_col) == stage) & (F.col(ts_col) > F.col(prev))
            )
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(f"stage_{i}_ts"))
        )
        out = out.join(nxt, key_col, "left")
    return out


def funnel_counts(
    df: DataFrame,
    stages: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: how many keys completed stage 1, stage 1→2, ...
    (one row per stage, ``n_keys`` monotonically non-increasing)."""
    times = funnel_stage_times(df, stages, key_col, ts_col, type_col)
    counts = times.agg(
        *[
            F.count(F.col(f"stage_{i}_ts")).alias(f"s{i}")
            for i in range(len(stages))
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(stages[i]).alias("stage"),
                F.col(f"s{i}").alias("n_keys"),
            )
            for i in range(len(stages))
        ]
    )
    return counts.select(F.explode(pairs).alias("r")).select(
        "r.stage_idx", "r.stage", "r.n_keys"
    )
