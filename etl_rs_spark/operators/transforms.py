"""Row/column transforms — reference operator parity (SURVEY.md §2.3).

Each reference transform (/root/reference/src/transform/common.rs) maps
to a declarative DataFrame operation so Catalyst fuses chains into one
codegen'd stage; nothing here materializes rows. Opaque user functions
(the reference's closure-based Filter/MapTransform,
/root/reference/src/transform/common.rs:10-60) get a vectorized escape
hatch via mapInPandas — Arrow batches, never per-row Python.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rs_spark.functions.coercion import COLUMN_COERCERS


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """FilterTransform (/root/reference/src/transform/common.rs:10-33):
    keep rows matching the predicate — expressed as a Column/SQL string
    so it stays codegen'd and pushes down to the scan."""
    return df.where(predicate)


def filter_rows_pandas(
    df: DataFrame, fn: Callable[[pd.DataFrame], pd.Series]
) -> DataFrame:
    """Opaque-closure filter: fn maps a pandas batch to a boolean Series.
    Arrow-vectorized analogue of the reference's Fn(&DataRow)->bool."""

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            yield b[fn(b).astype(bool)]

    return df.mapInPandas(gen, df.schema)


def map_rows(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """MapTransform (/root/reference/src/transform/common.rs:37-60):
    add/modify fields, declaratively."""
    return df.withColumns(cols)


def map_rows_pandas(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """Opaque batch map (reference's Fn(DataRow)->DataRow and the batched
    replacement for AsyncMapTransform's per-row I/O,
    /root/reference/src/transform/common.rs:63-88): fn transforms whole
    Arrow batches — external calls should be batched inside fn."""

    def gen(batches: Iterable[pd.DataFrame]):
        for b in batches:
            yield fn(b)

    return df.mapInPandas(gen, schema)


def add_column(df: DataFrame, name: str, value) -> DataFrame:
    """AddColumnTransform (/root/reference/src/transform/common.rs:92-116):
    constant column; overwrites an existing column of the same name."""
    return df.withColumn(name, value if isinstance(value, Column) else F.lit(value))


def remove_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """RemoveColumnsTransform (/root/reference/src/transform/common.rs:120-148)."""
    return df.drop(*cols)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """RenameColumnsTransform (/root/reference/src/transform/common.rs:152-182):
    unmapped columns pass through."""
    return df.withColumnsRenamed(mapping)


def select_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """SelectColumnsTransform (/root/reference/src/transform/common.rs:428-453):
    keep only the listed columns; names absent from the frame are
    silently skipped (reference: missing keys silently absent)."""
    present = [c for c in cols if c in df.columns]
    return df.select(*present)


def convert_types(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """ConvertTypesTransform (/root/reference/src/transform/common.rs:186-254):
    per-column flexible cast; failure -> null, never an error. Types:
    string,long/integer,double/float,boolean,date,datetime,timestamp,
    using the reference cast cascade (/root/reference/src/types.rs:206-331)."""
    alias = {"integer": "long", "int": "long", "float": "double"}
    out = {}
    for col, target in spec.items():
        t = alias.get(target, target)
        if t == "string":
            out[col] = F.col(col).cast("string")
        elif t in COLUMN_COERCERS:
            out[col] = COLUMN_COERCERS[t](col)
        else:
            out[col] = F.col(col).cast("string").try_cast(t)
    return df.withColumns(out)


def composite(*transforms: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
    """CompositeTransformer (/root/reference/src/transform/common.rs:456-481):
    sequential chain — Catalyst fuses it into one plan."""

    def run(df: DataFrame) -> DataFrame:
        for t in transforms:
            df = t(df)
        return df

    return run


def parallelize(df: DataFrame, num_workers: int) -> DataFrame:
    """ParallelTransform (/root/reference/src/transform/common.rs:374-424):
    in Spark, parallelism is inherent; this is an explicit repartition
    for when a source arrives under-partitioned."""
    return df.repartition(num_workers)
