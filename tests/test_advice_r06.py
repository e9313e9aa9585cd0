"""Round-6 ADVICE hardening: precise errors / graceful nulls on three
edge paths (nested-map LWW payloads, hive-layout files passed
explicitly to add_files, string columns against complex coerce
targets)."""

import os

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.errors import LoadError


def test_lww_resolve_rejects_nested_map_entries(spark, tmp_path):
    """A top-level map column whose VALUE type contains another map
    cannot ride the sorted-entries detour; the merge must raise the
    precise LoadError, not Spark's INVALID_ORDERING_TYPE."""
    from etl_rs_spark.sinks.lake import LakeTable

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        "conv_id string, turn_idx int, meta map<string,map<string,int>>, "
        "ts timestamp",
        num_buckets=2,
    )
    src = spark.createDataFrame(
        [("c1", 0, {"a": {"x": 1}}, 1)],
        "conv_id string, turn_idx int, meta map<string,map<string,int>>, "
        "lsn long",
    ).select(
        "conv_id",
        "turn_idx",
        "meta",
        F.timestamp_seconds(F.lit(1700000000)).alias("ts"),
        "lsn",
        F.lit("U").alias("op"),
    )
    with pytest.raises(LoadError, match="entries Spark cannot order"):
        t.merge(src, run_id="m", batch_id=0)


def test_add_files_rejects_explicit_hive_layout_file(spark, tmp_path):
    """An explicitly passed FILE inside a key=value directory must be
    rejected like a directory scan would — its path-borne partition
    column would import as NULL."""
    from etl_rs_spark.sinks.lake import LakeTable

    part_dir = tmp_path / "data" / "lang=en"
    part_dir.mkdir(parents=True)
    spark.createDataFrame(
        [("c1", 0, 1700000000)],
        "conv_id string, turn_idx int, ts long",
    ).select(
        "conv_id", "turn_idx", F.timestamp_seconds("ts").alias("ts")
    ).coalesce(1).write.mode("overwrite").parquet(str(part_dir))
    f = next(
        p
        for p in os.listdir(part_dir)
        if p.endswith(".parquet")
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        "conv_id string, turn_idx int, ts timestamp",
        num_buckets=2,
    )
    with pytest.raises(LoadError, match="hive-partitioned"):
        t.add_files([str(part_dir / f)])


def test_coerce_columns_complex_target_on_string(spark):
    """A complex coerce target against a still-string column parses via
    from_json (malformed -> NULL) instead of emitting an invalid
    string->struct try_cast that dies at plan time."""
    from etl_rs_spark.cdc.normalize import coerce_columns

    df = spark.createDataFrame(
        [('{"name":"t1","calls":2}',), ("not json",), (None,)],
        "tool string",
    )
    out = coerce_columns(df, {"tool": "struct<name:string,calls:int>"})
    rows = out.collect()
    assert rows[0]["tool"] is not None and rows[0]["tool"]["name"] == "t1"
    assert rows[1]["tool"] is None
    assert rows[2]["tool"] is None
    # scalar targets keep the try_cast path
    df2 = spark.createDataFrame([("7",), ("x",)], "v string")
    got = coerce_columns(df2, {"v": "bigint"}).collect()
    assert got[0]["v"] == 7 and got[1]["v"] is None
