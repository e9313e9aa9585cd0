"""Deduplication operators.

``lww_dedup`` is the CDC engine's core: last-writer-wins per key on a
lexicographic (ts, lsn) order — the deterministic replacement for the
reference's arrival-order First/Last aggregates
(/root/reference/src/transform/common.rs:318-323), which are
nondeterministic by HashMap iteration.

Physical strategy: ``max_by(struct(all_cols), struct(order_cols))``
grouped by key. Unlike a row_number() window (sort + single reducer per
key), max_by is an associative aggregate, so Spark computes it with a
partial (map-side) aggregation before the shuffle — each input partition
forwards at most one candidate row per key it saw. For a hot key the
shuffle volume is O(#partitions), not O(#events). The optional
``salt_buckets`` adds an explicit two-stage reduction on top for the
pathological single-key storm: stage 1 groups by (key, salt) where salt
is derived from lsn, stage 2 merges the per-salt winners. Associativity
of max_by makes the two-stage result identical to the one-stage result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"
_ROW = "__row"
_ORD = "__ord"


def _pick_winner(df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]) -> DataFrame:
    payload = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in order_cols]),
        ).alias(_ROW)
    )
    return agg.select(*keys, *[F.col(f"{_ROW}.{c}").alias(c) for c in payload])


def lww_dedup(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    order_cols: Sequence[str] = ("ts", "lsn"),
    salt_buckets: int = 0,
) -> DataFrame:
    """Keep, per key, the single row with the greatest (order_cols) tuple.

    All columns are preserved. order_cols must be non-null and, jointly,
    unique per key (lsn is globally unique) so the winner is
    deterministic.
    """
    keys = list(keys)
    order_cols = list(order_cols)
    if salt_buckets and salt_buckets > 1:
        salted = df.withColumn(
            _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
        )
        partial = _pick_winner(salted, keys + [_SALT], order_cols)
        return _pick_winner(partial.drop(_SALT), keys, order_cols)
    return _pick_winner(df, keys, order_cols)


def exact_dedup(
    df: DataFrame,
    on: Sequence[str],
    keep_order: Sequence[str] | None = None,
    ascending: bool = True,
) -> DataFrame:
    """Exact deduplication: one representative row per distinct value of
    ``on``. With keep_order, the kept row is the min (ascending) or max
    over those columns — deterministic, unlike DataFrame.dropDuplicates.
    Hash-groupBy with map-side partial aggregation; no window sort.
    """
    on = list(on)
    if keep_order is None:
        return df.dropDuplicates(on)
    payload = [c for c in df.columns if c not in on]
    pick = F.min_by if ascending else F.max_by
    agg = df.groupBy(*on).agg(
        pick(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in keep_order]),
        ).alias(_ROW)
    )
    return agg.select(*on, *[F.col(f"{_ROW}.{c}").alias(c) for c in payload])
