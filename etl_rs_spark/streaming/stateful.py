"""Custom stateful streaming operators via applyInPandasWithState.

The engine's CDC apply deliberately avoids unbounded streaming state
(per-microbatch LWW + idempotent MERGE), but some pipeline metrics are
inherently cross-batch — "how many events and distinct turns has each
conversation accumulated so far, and when did it last change" — and
those are exactly what Spark's arbitrary stateful processing is for.

``running_group_stats`` maintains one small state row per key across
microbatches (Arrow-batched per group — no per-row Python) and emits
the updated totals every time a key receives events. Watermark +
event-time state TTL bound the state store: a key idle past the TTL
(in event time, i.e. once the watermark passes last_ts + ttl) is
evicted and re-starts from zero if it ever returns — the documented
trade of bounded state for exact-forever counters (at 10^10 scale an
unbounded per-key store is the bug, not the feature).

Scale notes: state is O(live keys) rows, hash-partitioned by key
across executors (RocksDB/HDFS state store); eviction is event-time
driven, so ``availableNow`` drains terminate (a processing-time
timeout would force the engine to keep scheduling empty poll batches —
measured: an endless ~1 s/batch spin). The ROW size is the exact
distinct set in the default mode (fine for enum-like columns) or a
constant 4 KiB HLL sketch with ``approx_distinct=True`` — the required
mode when ``distinct_col`` is high-cardinality.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: event-time idle TTL before a key's state is evicted
STATE_TTL = _dt.timedelta(hours=24)


def _make_update(
    key_col: str,
    distinct_col: str,
    ts_col: str,
    approx_p: int | None = None,
):
    """Build the per-group state-update function. Counters are
    monotonic, so in update mode the LAST emission per key carries the
    final totals (and max() over emissions equals the final row).

    ``approx_p`` selects the bounded-state mode: the state row holds a
    fixed 2**approx_p-byte HLL sketch instead of the exact distinct
    set, and ``n_distinct`` becomes the sketch estimate (~1.6% rse at
    the default p=12)."""

    def _update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_ts + TTL with no new events: evict
            state.remove()
            return
        if approx_p is not None:
            from etl_rs_spark.functions import hll

            n_events, sketch, last_ts = (
                state.get
                if state.exists
                else (0, hll.empty_sketch(approx_p), None)
            )
            sketch = bytes(sketch)
        else:
            n_events, seen, last_ts = (
                state.get if state.exists else (0, [], None)
            )
            seen_set = set(seen or [])
        for pdf in pdfs:
            n_events += len(pdf)
            vals = pdf[distinct_col].dropna()
            if approx_p is not None:
                sketch = hll.add_values(
                    sketch, [str(v) for v in vals], approx_p
                )
            else:
                seen_set.update(str(v) for v in vals)
            batch_max = pdf[ts_col].max()
            if last_ts is None or (
                pd.notna(batch_max) and batch_max > last_ts
            ):
                last_ts = batch_max
        if approx_p is not None:
            state.update((n_events, sketch, last_ts))
            n_distinct = hll.estimate(sketch, approx_p)
        else:
            state.update((n_events, sorted(seen_set), last_ts))
            n_distinct = len(seen_set)
        if last_ts is not None:
            # event-time TTL: eviction driven by watermark progress, not
            # wall-clock polling (keeps availableNow drains terminating)
            state.setTimeoutTimestamp(
                int(pd.Timestamp(last_ts).value // 1_000_000)
                + int(STATE_TTL.total_seconds() * 1000)
            )
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n_events],
                "n_distinct": [n_distinct],
                "last_ts": [last_ts],
            }
        )

    return _update


def running_group_stats(
    events: DataFrame,
    key_col: str,
    distinct_col: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    approx_distinct: bool = False,
    approx_p: int = 12,
) -> DataFrame:
    """Per-key running (event count, distinct values of ``distinct_col``,
    last event time) maintained ACROSS microbatches. Streaming input
    only; event-time timeout requires the watermark set here.

    State-size contract: exact mode (default) stores the distinct set —
    O(distinct values) per key, intended for enum-like columns
    (event_type, turn_idx). For high-cardinality ``distinct_col`` pass
    ``approx_distinct=True``: the state row holds a constant
    2**approx_p-byte HLL sketch (4 KiB at p=12) whatever the
    cardinality, and ``n_distinct`` is the estimate (~1.6% rse)."""
    key_type = dict(events.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, n_events long, "
        f"n_distinct long, last_ts timestamp"
    )
    if approx_distinct:
        state_schema = "n_events long, sketch binary, last_ts timestamp"
    else:
        state_schema = "n_events long, seen array<string>, last_ts timestamp"
    src = events.withWatermark(ts_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        _make_update(
            key_col,
            distinct_col,
            ts_col,
            approx_p=approx_p if approx_distinct else None,
        ),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


#: emitted schema of running_conversation_stats
STATS_SCHEMA = (
    "conv_id string, n_events long, n_turns long, last_ts timestamp"
)


def running_conversation_stats(
    events: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-conversation running (events, distinct turns, last ts) across
    microbatches — the transcript specialization of
    ``running_group_stats`` over (conv_id, turn_idx, ts)."""
    out = running_group_stats(
        events,
        key_col="conv_id",
        distinct_col="turn_idx",
        ts_col="ts",
        watermark=watermark,
    )
    return out.withColumnRenamed("n_distinct", "n_turns")
