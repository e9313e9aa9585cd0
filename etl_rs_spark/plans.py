"""Plan-level helpers: Catalyst statistics and CPU-spread planning.

Spark sizes scan parallelism by *bytes* (spark.sql.files.maxPartitionBytes),
which is right for I/O-bound work and wrong for CPU-heavy per-row work:
a 5 MB documents file arrives as ONE task, so a minhash/simhash pass
runs on one core of a 32-core cluster. ``spread_for_cpu`` fixes that
with a size-gated explicit repartition — and only when the input is too
small to fill the cores, so a 100 TB input (whose scan already yields
thousands of tasks) passes through untouched. The gate reads Catalyst's
optimized-plan statistics; no job is triggered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated size of the optimized plan output, in bytes.
    No job is run; unknown sizes come back enormous (Long.Max-ish), which
    callers should treat as 'big'."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def _max_partition_bytes(spark) -> int:
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    digits = "".join(ch for ch in raw if ch.isdigit())
    mult = 1
    low = raw.lower()
    if low.endswith("k") or low.endswith("kb"):
        mult = 1024
    elif low.endswith("m") or low.endswith("mb"):
        mult = 1024 * 1024
    elif low.endswith("g") or low.endswith("gb"):
        mult = 1024 * 1024 * 1024
    return int(digits) * mult if digits else 134217728


def spread_for_cpu(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Repartition a SMALL input so CPU-heavy narrow work (pandas UDFs,
    interpreted higher-order functions) uses every core.

    Only acts when the estimated input size is under
    parallelism * maxPartitionBytes — i.e. when the byte-based scan
    split could not have produced enough tasks anyway. The explicit
    numbered repartition is deliberately NOT AQE-coalescible (AQE
    respects user-specified partition counts), otherwise a tiny input
    would be merged straight back into one partition.

    At scale this is a no-op: a large scan already fills the cores, and
    the gate prevents an accidental full-data shuffle.
    """
    spark = df.sparkSession
    n = parallelism or spark.sparkContext.defaultParallelism
    if n <= 1:
        return df
    try:
        size = plan_size_bytes(df)
    except Exception:  # plan stats unavailable -> assume big, don't touch
        return df
    if size >= n * _max_partition_bytes(spark):
        return df
    return df.repartition(n)
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
