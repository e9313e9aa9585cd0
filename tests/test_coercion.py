"""Coercion-table parity (FIXTURES.md §4; reference
/root/reference/src/types.rs:206-331) for both the Column-expression and
pandas-UDF tiers."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.functions import coercion as co

BOOL_CASES = [
    ("true", True), ("TRUE", True), ("1", True), ("yes", True), ("Y", True),
    ("false", False), ("0", False), ("no", False), ("N", False),
    ("maybe", None), ("", None), (None, None),
]

DATE_CASES = [
    ("2024-01-31", dt.date(2024, 1, 31)),
    ("31/01/2024", dt.date(2024, 1, 31)),
    ("01/31/2024", dt.date(2024, 1, 31)),  # MM/dd fallback
    ("2024-13-99", None),
    ("nope", None),
]


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def _eval(one, expr):
    return one.select(expr.alias("v")).collect()[0]["v"]


def test_bool_flex_column(one):
    for raw, want in BOOL_CASES:
        assert _eval(one, co.bool_flex(F.lit(raw))) is want, raw


def test_bool_flex_pandas(spark):
    df = spark.createDataFrame([(c,) for c, _ in BOOL_CASES], "s string")
    got = [r["v"] for r in df.select(co.pd_bool_flex("s").alias("v")).collect()]
    assert got == [w for _, w in BOOL_CASES]


def test_date_flex_column(one):
    for raw, want in DATE_CASES:
        assert _eval(one, co.date_flex(F.lit(raw))) == want, raw


def test_date_flex_pandas(spark):
    df = spark.createDataFrame([(c,) for c, _ in DATE_CASES], "s string")
    got = [r["v"] for r in df.select(co.pd_date_flex("s").alias("v")).collect()]
    assert got == [w for _, w in DATE_CASES]


def test_int_flex_truncates(one):
    # as_integer truncates floats (/root/reference/src/types.rs:227)
    assert _eval(one, co.int_flex(F.lit("7"))) == 7
    assert _eval(one, co.int_flex(F.lit("3.9"))) == 3
    assert _eval(one, co.int_flex(F.lit("-3.9"))) == -3
    assert _eval(one, co.int_flex(F.lit("abc"))) is None


def test_float_flex(one):
    assert _eval(one, co.float_flex(F.lit("3.5"))) == 3.5
    assert _eval(one, co.float_flex(F.lit("x"))) is None


def test_datetime_flex_three_formats(one):
    want = dt.datetime(2024, 1, 31, 12, 30, 5)
    for raw in ("2024-01-31 12:30:05", "31/01/2024 12:30:05", "2024-01-31T12:30:05"):
        got = _eval(one, co.datetime_flex(F.lit(raw)))
        assert got.replace(tzinfo=None) == want, raw
    assert _eval(one, co.datetime_flex(F.lit("31-01-2024"))) is None


def test_timestamp_flex_rfc3339_and_bare_date(one):
    got = _eval(one, co.timestamp_flex(F.lit("2024-01-31T12:30:05+00:00")))
    assert got.replace(tzinfo=None) == dt.datetime(2024, 1, 31, 12, 30, 5)
    # bare date -> midnight UTC (/root/reference/src/types.rs:309-322)
    got = _eval(one, co.timestamp_flex(F.lit("2024-01-31")))
    assert got.replace(tzinfo=None) == dt.datetime(2024, 1, 31, 0, 0, 0)
