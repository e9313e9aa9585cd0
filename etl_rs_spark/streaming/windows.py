"""Event-time windowed aggregation — tumbling / sliding / session, with
watermarks for late data.

The reference advertises exactly this module (tumbling/sliding/session
windows, watermarking) in its docs but ships none of it
(/root/reference/docs/context/02-estrutura-projeto.md:224-231 — files do
not exist in src/). These are thin, tested wrappers over Spark's native
``window``/``session_window``/``withWatermark``, usable identically on
batch DataFrames and Structured Streaming inputs (same semantics; on a
stream the watermark additionally bounds state and drops late rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def _finish(grouped, aggs: Sequence[Column]) -> DataFrame:
    out = grouped.agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows, e.g. duration='10 minutes'."""
    df = _with_watermark(df, ts_col, watermark)
    g = df.groupBy(F.window(F.col(ts_col), duration).alias("window"), *group_by)
    return _finish(g, aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each row lands in duration/slide windows."""
    df = _with_watermark(df, ts_col, watermark)
    g = df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("window"), *group_by
    )
    return _finish(g, aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into one
    variable-length session per group key."""
    df = _with_watermark(df, ts_col, watermark)
    g = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("window"), *group_by
    )
    return _finish(g, aggs)
