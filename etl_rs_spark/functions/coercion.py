"""Flexible type coercions — the reference's DataValue cast semantics
(/root/reference/src/types.rs:206-331), as Spark expressions.

Two tiers, same semantics:

- **Column-expression versions** (bool_flex, date_flex, ...): pure
  built-in functions, so Catalyst keeps them inside whole-stage codegen
  and they're SQL-expressible (used by the oracle-checked queries).
- **Vectorized pandas-UDF versions** (pd_bool_flex, pd_date_flex):
  Arrow-batched Series->Series, used by the CDC payload normalizer where
  the north rule mandates vectorized pandas/Arrow UDFs. Never
  row-at-a-time Python.

Reference semantics reproduced:
- as_boolean accepts true/1/yes/y and false/0/no/n case-insensitively
  (/root/reference/src/types.rs:243-253)
- as_integer truncates floats (/root/reference/src/types.rs:227)
- date parse cascade %Y-%m-%d -> %d/%m/%Y -> %m/%d/%Y
  (/root/reference/src/types.rs:262-273)
- datetime cascade "%Y-%m-%d %H:%M:%S" -> "%d/%m/%Y %H:%M:%S" ->
  "%Y-%m-%dT%H:%M:%S" (/root/reference/src/types.rs:284-296)
- timestamp: RFC-3339 first, bare date -> midnight UTC
  (/root/reference/src/types.rs:309-322)
- every failed conversion yields NULL, never an error
  (/root/reference/src/transform/common.rs:212-236)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_TRUE = ("true", "1", "yes", "y")
_FALSE = ("false", "0", "no", "n")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------- Column --
def bool_flex(col: Column | str) -> Column:
    s = F.lower(F.trim(_c(col).cast("string")))
    return (
        F.when(s.isin(*_TRUE), F.lit(True))
        .when(s.isin(*_FALSE), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def int_flex(col: Column | str) -> Column:
    """int parse; else float parse truncated toward zero; else null."""
    s = F.trim(_c(col).cast("string"))
    as_long = s.try_cast("long")
    as_dbl = s.try_cast("double")
    # try_cast on the double too: ANSI mode (Spark 4 default) raises
    # CAST_OVERFLOW on "1e300"/"nan" under a plain cast.
    return F.coalesce(as_long, as_dbl.try_cast("long"))


def float_flex(col: Column | str) -> Column:
    return F.trim(_c(col).cast("string")).try_cast("double")


def date_flex(col: Column | str) -> Column:
    s = F.trim(_c(col).cast("string"))
    return F.coalesce(
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(s, F.lit("dd/MM/yyyy")).cast("date"),
        F.try_to_timestamp(s, F.lit("MM/dd/yyyy")).cast("date"),
    )


def datetime_flex(col: Column | str) -> Column:
    s = F.trim(_c(col).cast("string"))
    return F.coalesce(
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("dd/MM/yyyy HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
    )


def timestamp_flex(col: Column | str) -> Column:
    """RFC-3339 first (with offset), then datetime forms, then bare date
    at midnight UTC — session tz is pinned UTC in session.py."""
    s = F.trim(_c(col).cast("string"))
    return F.coalesce(
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        datetime_flex(s),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
    )


# ----------------------------------------------------------- pandas UDF --
def _bool_series(s: pd.Series) -> pd.Series:
    low = s.astype("string").str.strip().str.lower()
    out = pd.Series(pd.NA, index=s.index, dtype="boolean")
    out[low.isin(list(_TRUE))] = True
    out[low.isin(list(_FALSE))] = False
    return out


def _date_series(s: pd.Series) -> pd.Series:
    st = s.astype("string").str.strip()
    out = pd.to_datetime(st, format="%Y-%m-%d", errors="coerce")
    for fmt in ("%d/%m/%Y", "%m/%d/%Y"):
        mask = out.isna() & st.notna()
        if mask.any():
            out[mask] = pd.to_datetime(st[mask], format=fmt, errors="coerce")
    return out.dt.date.astype(object).where(out.notna(), None)


pd_bool_flex = pandas_udf(_bool_series, T.BooleanType())
pd_date_flex = pandas_udf(_date_series, T.DateType())

#: coercion registry used by the CDC normalizer: target type -> pandas UDF
PANDAS_COERCERS = {
    "boolean": pd_bool_flex,
    "date": pd_date_flex,
}
#: Column-expression registry (SQL-expressible fast path)
COLUMN_COERCERS = {
    "boolean": bool_flex,
    "long": int_flex,
    "double": float_flex,
    "date": date_flex,
    "datetime": datetime_flex,
    "timestamp": timestamp_flex,
}
