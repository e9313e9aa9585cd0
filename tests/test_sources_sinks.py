"""Source/sink parity tests (SURVEY.md §2.1-2.2; reference inline tests
at /root/reference/src/extract/csv.rs:214-266, src/extract/json.rs:298-364,
src/load/json.rs:338-462, src/load/memory.rs:145-252)."""

import json

import pytest

from etl_rs_spark import sinks
from etl_rs_spark import sources as src
from etl_rs_spark.errors import ETLError


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "users.csv"
    p.write_text("id,name,age,active\n1,Alice,30,true\n2,Bob,17,false\n")
    return str(p)


def test_csv_headers_and_inference(spark, csv_file):
    df = src.CsvSource(csv_file).extract(spark)
    rows = df.orderBy("id").collect()
    assert df.columns == ["id", "name", "age", "active"]
    # type inference: age -> int-ish, active -> boolean
    # (reference per-cell cascade /root/reference/src/extract/csv.rs:60-85)
    assert rows[0]["age"] == 30 and rows[0]["active"] is True
    assert rows[1]["active"] is False


def test_csv_headerless_column_names(spark, tmp_path):
    p = tmp_path / "nohdr.csv"
    p.write_text("1,Alice\n2,Bob\n")
    df = src.CsvSource(str(p), headers=False).extract(spark)
    # headerless -> column_{i} (/root/reference/src/extract/csv.rs:47-52)
    assert df.columns == ["column_0", "column_1"]


def test_csv_custom_delimiter(spark, tmp_path):
    p = tmp_path / "semi.csv"
    p.write_text("id;name\n1;Alice\n")
    df = src.CsvSource(str(p), delimiter=";").extract(spark)
    assert df.columns == ["id", "name"] and df.count() == 1


def test_json_array_and_array_path(spark, tmp_path):
    doc = {"meta": 1, "data": {"items": [{"a": 1}, {"a": 2}]}}
    p = tmp_path / "doc.json"
    p.write_text(json.dumps(doc))
    # dotted array_path navigation (/root/reference/src/extract/json.rs:70-96)
    df = src.JsonSource(str(p), array_path="data.items").extract(spark)
    assert sorted(r["a"] for r in df.collect()) == [1, 2]

    arr = tmp_path / "arr.json"
    arr.write_text(json.dumps([{"x": 1}, {"x": 2}, {"x": 3}]))
    assert src.JsonSource(str(arr)).extract(spark).count() == 3


def test_jsonl(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text('{"x": 1}\n\n{"x": 2}\n')  # blank line skipped
    assert src.JsonLinesSource(str(p)).extract(spark).count() == 2


def test_parquet_projection_and_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(100)], "id int, name string, v double"
    ).write.parquet(p)
    s = src.ParquetSource(p, columns=["id", "name"], predicate="id > 90")
    df = s.extract(spark)
    assert df.columns == ["id", "name"] and df.count() == 9
    plan = df._jdf.queryExecution().executedPlan().toString()
    # real pushdown — the reference filters AFTER reading everything
    # (/root/reference/src/extract/parquet.rs:276-286)
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)" in plan
    assert "v" not in plan.split("ReadSchema")[1].split("\n")[0]
    meta = s.get_metadata(spark)
    assert meta["num_rows"] == 100


def test_memory_sink_accumulates(spark):
    m = sinks.MemorySink()
    df = spark.range(3)
    m.load(df)
    m.load(df)
    assert len(m) == 6 and not m.is_empty()
    m.clear()
    assert m.is_empty()


def test_json_sink_write_and_append(spark, tmp_path):
    p = str(tmp_path / "out.json")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    sinks.JsonSink(p).load(df)
    assert len(json.load(open(p))) == 2
    sinks.JsonSink(p, append=True).load(df)
    data = json.load(open(p))
    assert len(data) == 4  # append = read, extend, rewrite
    assert {d["id"] for d in data} == {1, 2}


def test_jsonl_sink_roundtrip(spark, tmp_path):
    p = str(tmp_path / "out-jsonl")
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    sinks.JsonLinesSink(p).load(df)
    assert spark.read.json(p).count() == 10
    sinks.JsonLinesSink(p, append=True).load(df)
    assert spark.read.json(p).count() == 20


def test_parquet_sink_errorifexists_then_overwrite(spark, tmp_path):
    p = str(tmp_path / "p.parquet")
    df = spark.range(5)
    sinks.ParquetSink(p).load(df)
    with pytest.raises(Exception):
        sinks.ParquetSink(p).load(df)  # exists -> error
        # (/root/reference/src/load/parquet.rs:341-345)
    sinks.ParquetSink(p, overwrite=True).load(df)
    assert spark.read.parquet(p).count() == 5


def test_orc_roundtrip_pushdown_and_sink_modes(spark, tmp_path):
    """ORC source/sink: same pushdown/projection and errorifexists
    contract as the parquet pair."""
    p = str(tmp_path / "t.orc")
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 1.5) for i in range(100)], "id int, name string, v double"
    )
    sinks.OrcSink(p).load(df)
    with pytest.raises(Exception):
        sinks.OrcSink(p).load(df)  # exists -> error
    sinks.OrcSink(p, overwrite=True, compression="zlib").load(df)

    s = src.OrcSource(p, columns=["id", "name"], predicate="id > 90")
    out = s.extract(spark)
    assert out.columns == ["id", "name"] and out.count() == 9
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)" in plan
    # streaming read drains the same rows
    stream = src.OrcSource(p).extract_stream(
        spark, "id int, name string, v double"
    )
    import uuid

    qname = "orc_" + uuid.uuid4().hex[:8]
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    assert spark.table(qname).count() == 100


def test_multi_sink_fanout(spark, tmp_path):
    m1, m2 = sinks.MemorySink(), sinks.MemorySink()
    res = sinks.MultiSink([m1, m2]).load(spark.range(4))
    assert res["success"] and len(m1) == 4 and len(m2) == 4


def test_lake_source_predicate_and_columns(spark, tmp_path):
    from etl_rs_spark.sinks.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "lt"), "conv_id string, turn_idx int, ts timestamp"
    )
    from pyspark.sql import functions as F

    df = spark.range(20).select(
        F.concat(F.lit("c"), (F.col("id") % 4).cast("string")).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.current_timestamp().alias("ts"),
    )
    t.append(df)
    got = src.LakeSource(
        str(tmp_path / "lt"), predicate="conv_id = 'c1'", columns=["conv_id", "turn_idx"]
    ).extract(spark)
    assert got.columns == ["conv_id", "turn_idx"] and got.count() == 5


def test_memory_source(spark):
    df = src.MemorySource([(1, "a")], "id int, s string").extract(spark)
    assert df.collect()[0]["s"] == "a"
