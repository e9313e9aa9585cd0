"""Physical-plan inspection helpers — make "is the filter pushed down /
is the scan pruned / is this join broadcast" assertable in tests and
checkable at the REPL (used by tests/test_plans.py).

The reference claims projection/predicate pushdown but applies both
after full reads (/root/reference/src/extract/parquet.rs:276-286,
/root/reference/src/extract/delta.rs:72-125); here they are real, and
these helpers are how we prove it stays real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            return line.split("PushedFilters:")[1].split("]")[0] + "]"
    return ""


def read_schema(df: DataFrame) -> str:
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.split("ReadSchema:")[1].strip().rstrip(",")
    return ""


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    got = pushed_filters(df)
    assert fragment in got, f"filter {fragment!r} not pushed; got {got!r}"


def assert_column_pruned(df: DataFrame, column: str) -> None:
    got = read_schema(df)
    assert got, "no ReadSchema found in plan"
    assert column not in got, f"column {column!r} not pruned from scan: {got}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, "expected a broadcast hash join"


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages: operators prefixed `*(N)` in
    the plan string share one generated function per N."""
    import re

    ids = set(re.findall(r"\*\((\d+)\)", physical_plan(df)))
    return len(ids)


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan computes a map-side partial aggregate before
    the exchange (partial_max/partial_count/... markers)."""
    return "partial_" in physical_plan(df)
