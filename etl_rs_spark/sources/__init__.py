"""Sources (extractors) — reference parity (SURVEY.md §2.1), Spark-first.

Every reference extractor (/root/reference/src/extract/) returns a fully
materialized Vec<DataRow>; these return lazy DataFrames, so projection
and predicates reach the scan (the reference applies column projection
AFTER reading everything, /root/reference/src/extract/parquet.rs:276-286,
and stores-but-ignores its Delta predicate,
/root/reference/src/extract/delta.rs:93-125 — here both push down for
real via Catalyst).

Each source has .extract(spark) -> DataFrame (batch) and, where
meaningful, .extract_stream(spark) -> streaming DataFrame, replacing the
reference's never-advancing batch offsets
(/root/reference/src/extract/csv.rs:192-211) with real source offsets in
the streaming checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CsvSource:
    """CsvExtractor (/root/reference/src/extract/csv.rs:9-153): delimiter,
    headers toggle (headerless -> column_{i} names, reference
    src/extract/csv.rs:47-52), quote/escape chars, per-cell type
    inference (reference trial-parse cascade src/extract/csv.rs:60-85 ~
    Spark inferSchema)."""

    path: str
    delimiter: str = ","
    headers: bool = True
    quote: str = '"'
    escape: str = "\\"
    infer_schema: bool = True
    schema: str | None = None

    def _reader(self, spark: SparkSession, streaming: bool):
        r = spark.readStream if streaming else spark.read
        r = (
            r.option("header", str(self.headers).lower())
            .option("sep", self.delimiter)
            .option("quote", self.quote)
            .option("escape", self.escape)
        )
        if self.schema:
            r = r.schema(self.schema)
        elif self.infer_schema and not streaming:
            r = r.option("inferSchema", "true")
        return r

    def _rename_headerless(self, df: DataFrame) -> DataFrame:
        if self.headers:
            return df
        return df.withColumnsRenamed(
            {c: f"column_{i}" for i, c in enumerate(df.columns)}
        )

    def extract(self, spark: SparkSession) -> DataFrame:
        return self._rename_headerless(self._reader(spark, False).csv(self.path))

    def extract_stream(self, spark: SparkSession) -> DataFrame:
        if not self.schema:
            raise ValueError("streaming CSV requires an explicit schema")
        return self._rename_headerless(self._reader(spark, True).csv(self.path))


@dataclass
class JsonSource:
    """JsonExtractor (/root/reference/src/extract/json.rs:9-156): one
    multi-line JSON document; array -> row per element; dotted
    array_path navigates into nested objects before exploding
    (reference path walk src/extract/json.rs:70-96)."""

    path: str
    array_path: str | None = None

    def extract(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import types as T

        df = spark.read.option("multiLine", "true").json(self.path)
        if self.array_path:
            df = df.select(F.explode(F.col(self.array_path)).alias("__e"))
            if isinstance(df.schema["__e"].dataType, T.StructType):
                return df.select("__e.*")
            # non-object array elements -> {"value": v} rows, the
            # reference's wrapping (src/extract/json.rs:113-139)
            return df.select(F.col("__e").alias("value"))
        if df.columns == ["_corrupt_record"]:
            # top-level array of scalars (or a bare scalar document):
            # Spark's JSON reader has no row shape for it; wrap each
            # element as {"value": v} like the reference
            # (src/extract/json.rs:113-139, JSONL :222-230). Debug-scale
            # fallback — the reference reads the whole doc in memory too.
            import json as _json

            with open(self.path) as f:
                doc = _json.load(f)
            vals = doc if isinstance(doc, list) else [doc]
            return spark.createDataFrame([{"value": v} for v in vals])
        return df


@dataclass
class JsonLinesSource:
    """JsonLinesExtractor (/root/reference/src/extract/json.rs:160-254):
    JSONL is Spark's native JSON mode; blank lines skipped by the
    parser."""

    path: str
    schema: str | None = None

    def extract(self, spark: SparkSession) -> DataFrame:
        r = spark.read
        if self.schema:
            r = r.schema(self.schema)
        df = r.json(self.path)
        if df.columns == ["_corrupt_record"]:
            # lines of non-object JSON values -> {"value": v} rows,
            # reference wrapping (src/extract/json.rs:222-230). Driver-
            # side fallback (debug corner: whole-file scalar lines),
            # keeps true value types via createDataFrame inference.
            import json as _json

            with open(self.path) as f:
                vals = [
                    _json.loads(line)
                    for line in f
                    if line.strip()
                ]
            return spark.createDataFrame([{"value": v} for v in vals])
        return df

    def extract_stream(self, spark: SparkSession) -> DataFrame:
        if not self.schema:
            raise ValueError("streaming JSON requires an explicit schema")
        return spark.readStream.schema(self.schema).json(self.path)


@dataclass
class ParquetSource:
    """ParquetExtractor (/root/reference/src/extract/parquet.rs:59-301).
    Column projection is true pushdown here (ReadSchema pruning), unlike
    the reference's post-read HashMap filtering
    (/root/reference/src/extract/parquet.rs:276-286)."""

    path: str
    columns: Sequence[str] = field(default_factory=tuple)
    predicate: str | None = None

    def extract(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.path)
        if self.predicate:
            df = df.where(self.predicate)
        if self.columns:
            df = df.select(*self.columns)
        return df

    def extract_stream(self, spark: SparkSession, schema: str) -> DataFrame:
        df = spark.readStream.schema(schema).parquet(self.path)
        if self.predicate:
            df = df.where(self.predicate)
        if self.columns:
            df = df.select(*self.columns)
        return df

    def get_metadata(self, spark: SparkSession) -> dict:
        """Reference get_metadata (num_rows, schema —
        /root/reference/src/extract/parquet.rs:100-140) via footers."""
        import glob as _glob
        import os as _os

        import pyarrow.parquet as pq

        paths = (
            sorted(_glob.glob(_os.path.join(self.path, "*.parquet")))
            if _os.path.isdir(self.path)
            else [self.path]
        )
        num_rows = 0
        row_groups = 0
        created_by = None
        for p in paths:
            md = pq.ParquetFile(p).metadata
            num_rows += md.num_rows
            row_groups += md.num_row_groups
            created_by = md.created_by
        return {
            "num_rows": num_rows,
            "num_row_groups": row_groups,
            "num_files": len(paths),
            "created_by": created_by,
            "schema": spark.read.parquet(self.path).schema.jsonValue(),
        }


@dataclass
class OrcSource:
    """ORC scans — beyond the reference's format set (it ships csv/json/
    parquet/delta only, /root/reference/src/extract/), but a first-class
    warehouse interchange format Spark reads natively with the same
    pushdown/pruning guarantees as parquet. Same surface as
    ParquetSource; batch + streaming."""

    path: str
    columns: Sequence[str] = field(default_factory=tuple)
    predicate: str | None = None

    def extract(self, spark: SparkSession) -> DataFrame:
        df = spark.read.orc(self.path)
        if self.predicate:
            df = df.where(self.predicate)
        if self.columns:
            df = df.select(*self.columns)
        return df

    def extract_stream(self, spark: SparkSession, schema: str) -> DataFrame:
        df = spark.readStream.schema(schema).orc(self.path)
        if self.predicate:
            df = df.where(self.predicate)
        if self.columns:
            df = df.select(*self.columns)
        return df


@dataclass
class LakeSource:
    """DeltaExtractor-equivalent over LakeTable
    (/root/reference/src/extract/delta.rs:37-138). with_version is
    honored like the reference (:103-109); predicate/columns and
    as-of-timestamp time travel are honored HERE unlike the reference,
    which stores and ignores them
    (/root/reference/src/extract/delta.rs:93-125)."""

    path: str
    version: int | None = None
    predicate: str | None = None
    columns: Sequence[str] = field(default_factory=tuple)
    #: epoch-ms as-of-timestamp (reference with_timestamp,
    #: /root/reference/src/extract/delta.rs:104-109): reads the latest
    #: snapshot committed at or before this instant.
    timestamp_ms: int | None = None

    def extract(self, spark: SparkSession) -> DataFrame:
        from etl_rs_spark.sinks.lake import LakeTable

        df = LakeTable.load(spark, self.path).read(
            version=self.version, as_of_ms=self.timestamp_ms
        )
        if self.predicate:
            df = df.where(self.predicate)
        if self.columns:
            df = df.select(*self.columns)
        return df


@dataclass
class MemorySource:
    """MemoryExtractor (reference example,
    /root/reference/examples/example_03.rs:221-239): rows from the
    driver — test fixtures only."""

    rows: list
    schema: str

    def extract(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, self.schema)
