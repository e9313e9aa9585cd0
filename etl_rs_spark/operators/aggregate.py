"""AggregateTransform — reference semantics and output naming
(/root/reference/src/transform/common.rs:258-371).

- group by columns (null keys group together, same as the reference's
  HashMap grouping with Null placeholder,
  /root/reference/src/transform/common.rs:333-341)
- output column name is "{col}_{func}" lowercased, e.g. value_sum
  (/root/reference/src/transform/common.rs:363)
- Sum: float-coerced, non-numeric skipped, EMPTY GROUP -> 0.0
  (/root/reference/src/transform/common.rs:288-293)
- Average/Min/Max: float-coerced, empty -> null
- Count: count of present (non-missing) values
- First/Last in the reference are arrival-order nondeterministic
  (/root/reference/src/transform/common.rs:318-323); here they require
  an explicit order column and use min_by/max_by — deterministic.

Physically this is Spark's distributed hash aggregate with map-side
partial aggregation — the reference runs a single-threaded
HashMap<Vec<DataValue>, Vec<DataRow>> (/root/reference/src/transform/common.rs:330-341).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID = {"count", "sum", "average", "min", "max", "first", "last"}


def _num(col: str) -> Column:
    # float coercion: numbers and numeric strings participate, the rest
    # become null and are skipped — reference as_float semantics
    # (/root/reference/src/types.rs:232-240)
    return F.col(col).cast("string").try_cast("double")


def _agg_expr(col: str, func: str, order_col: str | None) -> Column:
    name = f"{col}_{func}"
    if func == "count":
        return F.count(F.col(col)).alias(name)
    if func == "sum":
        return F.coalesce(F.sum(_num(col)), F.lit(0.0)).alias(name)
    if func == "average":
        return F.avg(_num(col)).alias(name)
    if func == "min":
        return F.min(_num(col)).alias(name)
    if func == "max":
        return F.max(_num(col)).alias(name)
    if func in ("first", "last"):
        if order_col is None:
            raise ValueError(
                f"{func} requires order_col — the reference's arrival-order "
                "First/Last is nondeterministic and not reproducible"
            )
        pick = F.min_by if func == "first" else F.max_by
        return pick(F.col(col), F.col(order_col)).alias(name)
    raise ValueError(f"unknown aggregation {func!r}; valid: {sorted(VALID)}")


def aggregate(
    df: DataFrame,
    group_by: Sequence[str],
    aggregations: dict[str, str | Sequence[str]],
    order_col: str | None = None,
) -> DataFrame:
    """aggregations: column -> func or list of funcs. Unlike the
    reference (one func per column — its HashMap silently drops earlier
    entries, see the bench at
    /root/reference/benches/pipeline_benchmark.rs:221-223), multiple
    functions per column are supported."""
    exprs: list[Column] = []
    for col, funcs in aggregations.items():
        if isinstance(funcs, str):
            funcs = [funcs]
        for fn in funcs:
            exprs.append(_agg_expr(col, fn.lower(), order_col))
    if not exprs:
        raise ValueError("no aggregations given")
    return df.groupBy(*group_by).agg(*exprs)
