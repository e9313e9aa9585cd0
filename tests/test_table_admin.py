"""jobs/table_admin_job.py: the operator DDL/maintenance CLI drives
every LakeTable admin operation through its argparse surface."""

import json

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.sinks.lake import LakeTable
from jobs import table_admin_job


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        "conv_id string, turn_idx int, text string, ts timestamp",
        num_buckets=4,
    )
    t.append(
        spark.range(20).select(
            F.format_string("c%d", F.col("id") % 5).alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("x").alias("text"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        )
    )
    return t


def _run(capsys, path, *argv):
    assert table_admin_job.main(["--table", path, *argv]) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_admin_ddl_and_maintenance_roundtrip(spark, tmp_path, table, capsys):
    p = table.path
    d = _run(capsys, p, "describe")
    assert d["num_buckets"] == 4 and d["rows"] == 20
    assert _run(capsys, p, "rename-column", "--from", "text", "--to", "body")[
        "renamed"
    ] == {"text": "body"}
    assert (
        _run(capsys, p, "add-column", "--column", "lang", "--type", "string")[
            "added"
        ]
        == "lang"
    )
    assert (
        _run(capsys, p, "set-num-buckets", "--num-buckets", "8")["num_buckets"]
        == 8
    )
    c = _run(capsys, p, "compact")
    assert c["files_after"] >= 1
    lk = _run(capsys, p, "lookup", "--keys", "c1,c2")
    assert {r["conv_id"] for r in lk["rows"]} == {"c1", "c2"}
    assert all(r["body"] == "x" for r in lk["rows"])  # renamed data intact
    assert _run(capsys, p, "drop-column", "--column", "lang")["dropped"] == "lang"
    d2 = _run(capsys, p, "describe")
    assert d2["live_specs"] == [8] and "lang" not in d2["schema"]
    assert table.read().count() == 20
    # operational undo: roll the whole DDL run back to the initial load
    rb = _run(capsys, p, "rollback", "--to-version", "1")
    assert rb["restored"] == 1 and rb["undone"] >= 5
    d3 = _run(capsys, p, "describe")
    assert d3["num_buckets"] == 4 and "text" in d3["schema"]
    assert table.read().count() == 20
