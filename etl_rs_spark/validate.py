"""Data validation stage — the reference's Validator trait
(/root/reference/src/traits.rs:77-86) which is declared there but never
implemented or wired; here it is both, Spark-first.

A rule is a Column predicate that is TRUE for VALID rows. ``validate``
evaluates every rule in ONE aggregation job (sum of failures per rule —
map-side combined, no per-row Python, no collect of data rows), so a
hundred rules over 100 TB cost a single scan. This replaces the
reference's row-loop ``validate(&[DataRow]) -> Vec<String>`` shape with
the same observable contract: a list of violation messages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RuleValidator:
    """Named declarative rules; violations come back as messages.

    >>> v = RuleValidator({
    ...     "qty_positive": F.col("l_quantity") > 0,
    ...     "key_present": F.col("l_orderkey").isNotNull(),
    ... })
    >>> v.validate(df)   # ["qty_positive: 3 rows violate"] or []
    """

    def __init__(self, rules: dict[str, Column]):
        if not rules:
            raise ValueError("at least one rule required")
        self.rules = dict(rules)

    def validate(self, df: DataFrame) -> list[str]:
        """All rules in one scan; NULL predicate results count as
        violations (an unknowable rule did not pass)."""
        aggs = [
            F.sum(
                (~F.coalesce(rule.cast("boolean"), F.lit(False))).cast("long")
            ).alias(name)
            for name, rule in self.rules.items()
        ]
        row = df.agg(*aggs).collect()[0]
        return [
            f"{name}: {row[name]} rows violate"
            for name in self.rules
            if (row[name] or 0) > 0
        ]

    def validate_row(self, df: DataFrame) -> list[str]:
        """Reference validate_row parity (src/traits.rs:82-85): validate
        a single-row frame via the batch path."""
        return self.validate(df.limit(1))
