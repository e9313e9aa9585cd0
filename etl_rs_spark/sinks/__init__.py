"""Sinks (loaders) — reference parity (SURVEY.md §2.2), Spark-first.

Each sink has .load(df) -> dict result (rows written etc.). The lake
merge sink lives in sinks.lake.LakeTable.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _rows_out(n: int) -> dict[str, Any]:
    # reference LoadResult {rows_loaded, ...} (/root/reference/src/traits.rs:57-73)
    return {"rows_loaded": n, "success": True}


def _observed(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach a row-count observation so the write action itself reports
    rows_loaded — no second count() job over the plan."""
    obs = Observation()
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def _canonical_temporal(df: DataFrame) -> DataFrame:
    """Render temporal columns the way the reference's JSON loaders do
    (/root/reference/src/load/common.rs:16-41, src/load/json.rs:94-103):
    Date -> %Y-%m-%d, naive DateTime -> '%Y-%m-%d %H:%M:%S',
    tz-aware Timestamp -> RFC-3339 (+00:00 under the engine's pinned
    UTC session). Spark's toJSON would otherwise emit its own ISO form."""
    from pyspark.sql import types as T

    out = {}
    for f2 in df.schema.fields:
        c = F.col(f2.name)
        if isinstance(f2.dataType, T.DateType):
            out[f2.name] = F.date_format(c, "yyyy-MM-dd")
        elif isinstance(f2.dataType, T.TimestampNTZType):
            out[f2.name] = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        elif isinstance(f2.dataType, T.TimestampType):
            out[f2.name] = F.concat(
                F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+00:00")
            )
    return df.withColumns(out) if out else df


def _dir_writable(path: str) -> bool:
    """Health probe: the nearest existing ancestor of path is writable
    (the reference Loader::health_check contract,
    /root/reference/src/traits.rs:66 — fail fast on an unreachable sink)."""
    d = os.path.abspath(path)
    while d and not os.path.exists(d):
        parent = os.path.dirname(d)
        if parent == d:
            break
        d = parent
    return os.path.isdir(d) and os.access(d, os.W_OK)


@dataclass
class JsonSink:
    """JsonLoader (/root/reference/src/load/json.rs:37-187): all rows as
    ONE JSON array file, optional pretty / append (append = read, extend,
    rewrite — same as the reference). Debug-scale sink: the array format
    forces a single file; use JsonLinesSink for data."""

    path: str
    pretty: bool = False
    append: bool = False

    def load(self, df: DataFrame) -> dict[str, Any]:
        rows = [json.loads(r) for r in _canonical_temporal(df).toJSON().collect()]
        if self.append and os.path.exists(self.path):
            with open(self.path) as f:
                rows = json.load(f) + rows
        with open(self.path, "w") as f:
            json.dump(rows, f, indent=2 if self.pretty else None)
        return _rows_out(len(rows))

    def health_check(self) -> bool:
        return _dir_writable(self.path)


@dataclass
class JsonLinesSink:
    """JsonLinesLoader (/root/reference/src/load/json.rs:211-336):
    distributed JSONL write; append mode appends files, not strings."""

    path: str
    append: bool = False

    def load(self, df: DataFrame) -> dict[str, Any]:
        mode = "append" if self.append else "overwrite"
        df, obs = _observed(_canonical_temporal(df))
        df.write.mode(mode).json(self.path)
        return _rows_out(int(obs.get["rows"]))

    def health_check(self) -> bool:
        return _dir_writable(self.path)


@dataclass
class ConsoleSink:
    """ConsoleLoader (/root/reference/src/load/console.rs:35-112)."""

    num_rows: int = 20
    truncate: bool = False

    def load(self, df: DataFrame) -> dict[str, Any]:
        df.show(self.num_rows, truncate=self.truncate)
        return _rows_out(-1)


@dataclass
class MemorySink:
    """MemoryLoader (/root/reference/src/load/memory.rs:41-143): the test
    oracle sink — accumulates collected rows; get_data/clear/len."""

    data: list = field(default_factory=list)

    def load(self, df: DataFrame) -> dict[str, Any]:
        rows = df.collect()
        self.data.extend(rows)
        return _rows_out(len(rows))

    def get_data(self) -> list:
        return list(self.data)

    def clear(self) -> None:
        self.data.clear()

    def __len__(self) -> int:
        return len(self.data)

    def is_empty(self) -> bool:
        return not self.data


@dataclass
class ParquetSink:
    """ParquetLoader (/root/reference/src/load/parquet.rs:48-399):
    compression choices, errors if exists unless overwrite
    (/root/reference/src/load/parquet.rs:341-345), partitioned output
    (the reference stores partition config and never applies it —
    /root/reference/src/load/delta.rs:62-69)."""

    path: str
    compression: str = "snappy"
    overwrite: bool = False
    partition_by: Sequence[str] = field(default_factory=tuple)

    def load(self, df: DataFrame) -> dict[str, Any]:
        df, obs = _observed(df)
        w = df.write.option("compression", self.compression).mode(
            "overwrite" if self.overwrite else "errorifexists"
        )
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)
        return _rows_out(int(obs.get["rows"]))

    def health_check(self) -> bool:
        return _dir_writable(self.path)


@dataclass
class OrcSink:
    """ORC output — same contract as ParquetSink (compression,
    errorifexists-unless-overwrite, partitioned layout), for warehouse
    pipelines whose downstream readers are ORC-native. Beyond the
    reference's format set."""

    path: str
    compression: str = "snappy"
    overwrite: bool = False
    partition_by: Sequence[str] = field(default_factory=tuple)

    def load(self, df: DataFrame) -> dict[str, Any]:
        df, obs = _observed(df)
        w = df.write.option("compression", self.compression).mode(
            "overwrite" if self.overwrite else "errorifexists"
        )
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.orc(self.path)
        return _rows_out(int(obs.get["rows"]))

    def health_check(self) -> bool:
        return _dir_writable(self.path)


@dataclass
class MultiSink:
    """MultiLoader (/root/reference/examples/example_01.rs:166-207): fan
    one dataset out to several sinks; the input is persisted once so the
    upstream plan isn't recomputed per sink."""

    sinks: Sequence[Any]

    def load(self, df: DataFrame) -> dict[str, Any]:
        df = df.persist()
        try:
            results = [s.load(df) for s in self.sinks]
        finally:
            df.unpersist()
        return {"results": results, "success": all(r.get("success") for r in results)}


def single_file(dir_path: str, dest: str, ext: str = "parquet") -> str:
    """Collapse a one-partition Spark output dir to a single flat file."""
    (part,) = glob.glob(os.path.join(dir_path, f"part-*.{ext}*"))
    shutil.move(part, dest)
    shutil.rmtree(dir_path)
    return dest
