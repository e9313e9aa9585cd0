"""Operator-parity tests for transforms + aggregate (FIXTURES.md §4,
golden values mirroring the reference's inline tests,
/root/reference/src/transform/common.rs:483-637)."""

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.operators import transforms as tr
from etl_rs_spark.operators.aggregate import aggregate

USERS_SCHEMA = "id int, name string, age int, active boolean, email string"
USERS = [
    (1, "Alice", 30, True, "a@x.io"),
    (2, "Bob", 17, True, "b@x.io"),
    (3, "Carol", 25, False, "c@x.io"),
    (4, "Dan", 42, True, "d@x.io"),
    (5, "Eve", 16, False, "e@x.io"),
    (6, "Frank", 19, True, "f@x.io"),
    (7, "Grace", 33, True, "g@x.io"),
    (8, "Heidi", 28, False, "h@x.io"),
    (9, "Ivan", 51, True, "i@x.io"),
    (10, "Judy", 15, True, "j@x.io"),
]
ADULT_ACTIVE_IDS = [1, 4, 6, 7, 9]


@pytest.fixture(scope="module")
def users(spark):
    return spark.createDataFrame(USERS, USERS_SCHEMA).cache()


def ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_filter(users):
    # reference golden shape: active AND age>=18
    # (/root/reference/src/pipeline/mod.rs:486-510)
    got = tr.filter_rows(users, (F.col("active")) & (F.col("age") >= 18))
    assert ids(got) == ADULT_ACTIVE_IDS


def test_filter_pandas_matches_column_filter(users):
    got = tr.filter_rows_pandas(users, lambda b: b["active"] & (b["age"] >= 18))
    assert ids(got) == ADULT_ACTIVE_IDS


def test_map_add_remove_rename_select(users):
    mapped = tr.map_rows(users, {"decade": (F.col("age") / 10).cast("int") * 10})
    assert mapped.where("id = 1").collect()[0]["decade"] == 30

    added = tr.add_column(users, "source", "crm")
    assert added.select("source").distinct().collect()[0][0] == "crm"
    # overwrite existing column, reference semantics
    # (/root/reference/src/transform/common.rs:92-116)
    overwritten = tr.add_column(users, "age", 99)
    assert overwritten.select("age").distinct().collect()[0][0] == 99

    removed = tr.remove_columns(users, ["email", "active"])
    assert removed.columns == ["id", "name", "age"]

    renamed = tr.rename_columns(users, {"name": "full_name", "nope": "x"})
    assert "full_name" in renamed.columns and "name" not in renamed.columns

    # missing columns silently absent
    # (/root/reference/src/transform/common.rs:428-453)
    sel = tr.select_columns(users, ["id", "name", "ghost"])
    assert sel.columns == ["id", "name"]


def test_map_rows_pandas(users):
    out = tr.map_rows_pandas(
        users,
        lambda b: b.assign(age=b.age + 1)[["id", "age"]],
        "id int, age int",
    )
    assert out.where("id = 1").collect()[0]["age"] == 31


def test_composite_chain(users):
    chain = tr.composite(
        lambda d: tr.filter_rows(d, "active AND age >= 18"),
        lambda d: tr.add_column(d, "adult", True),
        lambda d: tr.select_columns(d, ["id", "adult"]),
    )
    got = chain(users)
    assert ids(got) == ADULT_ACTIVE_IDS
    assert got.columns == ["id", "adult"]


def test_convert_types(spark):
    df = spark.createDataFrame(
        [("1", "3.9", "yes", "2024-01-31"), ("x", "oops", "maybe", "31/01/2024")],
        "a string, b string, c string, d string",
    )
    got = tr.convert_types(
        df, {"a": "integer", "b": "integer", "c": "boolean", "d": "date"}
    ).collect()
    ok, bad = got
    assert ok["a"] == 1
    assert ok["b"] == 3  # float truncation (/root/reference/src/types.rs:227)
    assert ok["c"] is True
    assert str(ok["d"]) == "2024-01-31"
    # failures -> null, never error (/root/reference/src/transform/common.rs:212-236)
    assert bad["a"] is None and bad["b"] is None and bad["c"] is None
    assert str(bad["d"]) == "2024-01-31"  # dd/MM/yyyy fallback


# ------------------------------------------------------------ aggregate --
def test_aggregate_golden_sum_naming(spark):
    # reference golden: two rows in one group sum to 30.0, output column
    # named value_sum (/root/reference/src/transform/common.rs:549-577)
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "category string, value double"
    )
    got = {
        r["category"]: r
        for r in aggregate(df, ["category"], {"value": ["sum", "count", "average"]}).collect()
    }
    assert got["a"]["value_sum"] == 30.0
    assert got["a"]["value_count"] == 2
    assert got["a"]["value_average"] == 15.0
    assert got["b"]["value_sum"] == 5.0


def test_aggregate_sum_skips_non_numeric_and_empty_is_zero(spark):
    # Sum: non-numeric silently skipped; all-non-numeric group -> 0.0
    # (/root/reference/src/transform/common.rs:288-293)
    df = spark.createDataFrame(
        [("a", "10"), ("a", "zzz"), ("c", "nah")], "k string, v string"
    )
    got = {r["k"]: r for r in aggregate(df, ["k"], {"v": "sum"}).collect()}
    assert got["a"]["v_sum"] == 10.0
    assert got["c"]["v_sum"] == 0.0


def test_aggregate_min_max_float_coerced(spark):
    # numeric strings participate in min/max after float coercion
    # (/root/reference/src/transform/common.rs:304-317)
    df = spark.createDataFrame(
        [("a", "9"), ("a", "100"), ("a", "xx")], "k string, v string"
    )
    row = aggregate(df, ["k"], {"v": ["min", "max"]}).collect()[0]
    assert row["v_min"] == 9.0 and row["v_max"] == 100.0


def test_aggregate_null_group_key_and_first_last(spark):
    df = spark.createDataFrame(
        [(None, 1, 10.0), (None, 2, 20.0), ("g", 3, 5.0)],
        "k string, seq int, v double",
    )
    rows = aggregate(
        df, ["k"], {"v": ["first", "last"]}, order_col="seq"
    ).collect()
    bynull = {r["k"]: r for r in rows}
    # null keys group together (/root/reference/src/transform/common.rs:333-341)
    assert bynull[None]["v_first"] == 10.0 and bynull[None]["v_last"] == 20.0
    with pytest.raises(ValueError):
        aggregate(df, ["k"], {"v": "first"})  # order required
