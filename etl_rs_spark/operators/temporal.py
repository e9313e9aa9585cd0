"""Temporal joins: as-of (nearest prior/next event) and interval
(bounded time-range) joins — the two stream-ish join shapes a
transcript/CDC pipeline needs that Spark SQL has no first-class
operator for (the reference engine has no joins at all — its Transformer
trait at /root/reference/src/transform/traits.rs is unary).

Both are expressed as compositions of native DataFrame ops so Catalyst
plans them as ordinary shuffles — no Python in the row path, no
cartesian products:

- ``asof_join``: the classic union trick. Tag both sides, union on the
  join key, ONE hash-partition shuffle by key with an in-partition sort
  by (ts, side), then ``last(..., ignorenulls=True)`` over the running
  window carries each right row's payload forward onto every later left
  row. O(|L|+|R|) shuffle bytes, no join explosion, no per-key driver
  state — the same plan shape pandas' merge_asof would need a single
  machine for.

- ``interval_join``: bin-bucketed inequality join. A raw theta-join
  ``l.ts BETWEEN r.ts+low AND r.ts+high`` degenerates to
  BroadcastNestedLoop; instead each left row is exploded to the (at
  most two) fixed-width time bins its window overlaps, the right side
  is assigned its single bin, and the join becomes an EQUI-join on
  (key, bin) with an exact range post-filter. Shuffle is ~2|L|+|R|
  rows; Spark's own stream-stream interval join uses the same
  state-bucketing idea.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window

_TAG = "__asof_is_left"
_TS = "__asof_ts"
_CARRY = "__asof_carry"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the payload of the single right row
    with the largest ``right_ts`` <= ``left_ts`` (direction="backward",
    inclusive — pandas/DuckDB ASOF semantics) or the smallest
    ``right_ts`` >= ``left_ts`` ("forward"), matched within the ``on``
    key. Left rows with no match keep NULL right columns (left join).

    Right payload columns that collide with left column names get
    ``suffix``; the matched right timestamp is always exposed as
    ``{right_ts}{suffix}``. Rows of the right side sharing an identical
    (key, ts) are not ordered with respect to each other — pre-aggregate
    the right side to one row per (key, ts) for determinism (same
    contract as DuckDB's ASOF JOIN).

    The whole matched right row travels as ONE struct through a single
    ``last(ignorenulls=True)`` — never per-column — so a NULL in one
    payload column stays NULL on the matched row instead of being
    backfilled from an older right row (a composite row that never
    existed).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    payload = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    rts_out = right_ts + suffix
    carry_type = StructType(
        [StructField(rts_out, right.schema[right_ts].dataType)]
        + [StructField(out_names[c], right.schema[c].dataType) for c in payload]
    )

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(carry_type).alias(_CARRY),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        F.struct(
            F.col(right_ts).alias(rts_out),
            *[F.col(c).alias(out_names[c]) for c in payload],
        ).alias(_CARRY),
    ).select(*l_tag.columns)

    # backward: ascending scan, right rows sort BEFORE left at equal ts
    # (inclusive match); forward: descending scan, same tag order.
    asc = direction == "backward"
    order = [
        F.col(_TS).asc() if asc else F.col(_TS).desc(),
        F.col(_TAG).asc(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *[c for c in l_tag.columns if c != _CARRY],
        F.last(F.col(_CARRY), ignorenulls=True).over(w).alias(_CARRY),
    )
    return carried.where(F.col(_TAG) == 1).select(
        *[F.col(c) for c in left.columns],
        F.col(_CARRY).getField(rts_out).alias(rts_out),
        *[F.col(_CARRY).getField(out_names[c]).alias(out_names[c]) for c in payload],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    low_s: float,
    high_s: float,
    left_ts: str = "ts",
    right_ts: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join left and right rows sharing the ``on`` key whose
    timestamps satisfy ``left_ts + low_s <= right_ts <= left_ts +
    high_s`` (seconds; ``low_s`` may be negative for a window reaching
    into the past). Equi-join on (key, time-bin) with an exact range
    post-filter — never a nested-loop theta join."""
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if high_s <= low_s:
        raise ValueError("high_s must be > low_s")
    span_us = int(round((high_s - low_s) * 1_000_000))
    low_us = int(round(low_s * 1_000_000))
    high_us = int(round(high_s * 1_000_000))

    def _bin(us_col):
        # exact integer floor-div: (x - pmod(x, span)) / span divides
        # exactly, so the double division is exact (a plain x/span in
        # doubles can land at n - ulp and floor off-by-one at 10^15 us)
        return ((us_col - F.pmod(us_col, F.lit(span_us))) / F.lit(span_us)).cast(
            "long"
        )

    l_us = F.unix_micros(F.col(left_ts))
    lb, ub = l_us + F.lit(low_us), l_us + F.lit(high_us)
    l_binned = left.select(
        "*",
        F.explode(F.sequence(_bin(lb), _bin(ub))).alias("__bin"),
    )
    renames = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in keys
    }
    r_binned = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(renames[c]) for c in renames],
        _bin(F.unix_micros(F.col(right_ts))).alias("__bin"),
    )
    r_ts_col = renames[right_ts]
    joined = l_binned.join(r_binned, [*keys, "__bin"])
    r_us = F.unix_micros(F.col(r_ts_col))
    return joined.where(
        (r_us >= F.unix_micros(F.col(left_ts)) + F.lit(low_us))
        & (r_us <= F.unix_micros(F.col(left_ts)) + F.lit(high_us))
    ).drop("__bin")
