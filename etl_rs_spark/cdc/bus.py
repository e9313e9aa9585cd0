"""Message-bus (Kafka-shaped) change-stream source support.

The reference has no bus source either (its docs sketch one,
/root/reference/docs/context/02-estrutura-projeto.md:224-247); the
engine's binlog tail is file-based because that is what this sandbox
can replay and checkpoint. A Kafka deployment differs in exactly one
step: records arrive as (key, value, timestamp, topic, partition,
offset) with the CDC envelope JSON in ``value`` — everything after
decode (LWW dedup, normalize, merge) is identical.

``decode_bus_frame`` is that one step, as a pure DataFrame transform:
testable without any Kafka jar, and wired into StreamDriver via
``fmt="kafka"`` (which needs spark-sql-kafka-0-10 on the classpath at
runtime — config-level work, no engine change).

Ordering note: Kafka guarantees order only within a partition; the
engine does not rely on arrival order anywhere — LWW on (ts, lsn) is
what makes replay and cross-partition interleavings converge — so a
keyed topic (key = conv_id, matching the merge bucketing) is
sufficient for exactly-once end state, same as the file binlog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rs_spark.generator import ENVELOPE_SCHEMA


def decode_bus_frame(df: DataFrame, schema=ENVELOPE_SCHEMA) -> DataFrame:
    """Kafka record frame -> CDC envelope frame.

    ``value`` (binary or string) carries the envelope as one JSON
    object per record; malformed JSON yields a row of nulls, which the
    dead-letter gate downstream quarantines (null merge keys) instead
    of poisoning the batch. Kafka metadata columns are dropped — the
    envelope's own (ts, lsn) drive ordering, never broker offsets."""
    return (
        df.select(
            F.from_json(F.col("value").cast("string"), schema).alias("__env")
        )
        .select("__env.*")
    )
