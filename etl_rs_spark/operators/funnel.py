"""Ordered-event funnel over a keyed event stream (conversation/user
journey analysis: did stage_1 happen, then stage_2 strictly after it,
then stage_3 ...).

Existence of an ordered subsequence is decided by the earliest-first
greedy: take the FIRST stage-1 event, then the first stage-2 event
strictly after it, and so on — if any ordered witness exists, the
greedy one does (exchange argument), so the computation is k
conditional min-aggregations instead of a combinatorial search.

Scale shape: ONE keyed aggregation for any number of stages — the
events table is scanned and shuffled exactly once; the greedy
subsequence is then a pure Column fold (``array_min(filter(...))``
cascade) over the per-stage timestamp sets, so adding a stage adds a
scalar expression, not a scan+join. No windows, no sorts, no Python.
Aggregation state is the per-key distinct-timestamp set per stage
(``collect_set``) — O(events per key), the same order as any per-key
sequence analysis; keys here are conversations/users, whose event
counts are bounded in practice.
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
    # one shuffle: per key, the distinct event times of each stage
    # (collect_set skips the NULLs the when() leaves on other stages)
    g = ev.groupBy(key_col).agg(
        *[
            F.collect_set(
                F.when(F.col(type_col) == s, F.col(ts_col))
            ).alias(f"_ts_{i}")
            for i, s in enumerate(stages)
        ]
    )
    # greedy fold, all scalar expressions: stage i's time is the min
    # stage-i event strictly after stage i-1's time; an empty filter
    # gives array_min(NULL-ish)=NULL and `x > NULL` cascades the NULL
    out = g.withColumn("stage_0_ts", F.array_min(F.col("_ts_0")))
    for i in range(1, len(stages)):
        prev = F.col(f"stage_{i-1}_ts")
        out = out.withColumn(
            f"stage_{i}_ts",
            F.array_min(F.filter(F.col(f"_ts_{i}"), lambda x: x > prev)),
        )
    return out.select(
        key_col, *[f"stage_{i}_ts" for i in range(len(stages))]
    )


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
