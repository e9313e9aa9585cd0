"""CDC payload normalization — envelope in, typed change rows out.

The wire envelope carries evolving payload fields inside one JSON string
(generator.ENVELOPE_SCHEMA). Normalization:

1. **Key discovery** (per microbatch): union of JSON object keys via the
   built-in ``json_object_keys`` + a distinct aggregation — JVM-side,
   partial-agg, tiny result. This is the reference's union-of-keys schema
   inference (/root/reference/src/load/parquet.rs:125-138) done on a
   microbatch instead of a whole materialized dataset, and it is what
   lets a brand-new column (e.g. ``lang``) surface mid-stream.
2. **JSON parse** with ``from_json`` against the discovered struct —
   JVM-side, codegen'd; the payload never reaches Python as a row.
3. **Dirty-value coercion** of spec'd metadata columns via vectorized
   pandas UDFs (functions/coercion.py) — mixed-case boolean strings,
   multi-format date strings — per the reference cast semantics
   (/root/reference/src/types.rs:206-331). Arrow-batched; no per-row
   Python anywhere (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rs_spark.functions.coercion import PANDAS_COERCERS

#: default dirty-metadata coercion spec: payload key -> target type
DEFAULT_COERCE_SPEC = {"meta_active": "boolean", "meta_edited": "date"}


def discover_payload_keys(envelope: DataFrame, payload_col: str = "payload") -> list[str]:
    """Distinct JSON keys across the batch (sorted for determinism)."""
    rows = (
        envelope.select(
            F.explode(
                F.json_object_keys(F.coalesce(F.col(payload_col), F.lit("{}")))
            ).alias("k")
        )
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def normalize_events(
    envelope: DataFrame,
    coerce_spec: dict[str, str] | None = None,
    payload_col: str = "payload",
    coerce: bool = True,
) -> DataFrame:
    """Envelope (lsn, op, conv_id, turn_idx, ts, payload-json) ->
    typed change rows (lsn, op, conv_id, turn_idx, ts, <payload cols>).

    Payload columns are whatever keys this batch actually carries —
    additive schema evolution flows through here to the MERGE, which
    widens the table.
    """
    spec = DEFAULT_COERCE_SPEC if coerce_spec is None else coerce_spec
    keys = discover_payload_keys(envelope, payload_col)

    payload_schema = T.StructType(
        [T.StructField(k, T.StringType()) for k in keys]
    )
    df = envelope.withColumn(
        "__p", F.from_json(F.col(payload_col), payload_schema)
    )
    cols = [
        F.col("lsn").cast("long").alias("lsn"),
        F.col("op").cast("string").alias("op"),
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("ts").cast("timestamp").alias("ts"),
    ]
    for k in keys:
        c = F.col(f"__p.{k}")
        target = spec.get(k)
        if coerce and target is not None and target in PANDAS_COERCERS:
            c = PANDAS_COERCERS[target](c)  # vectorized Arrow batch coercion
        elif coerce and target is not None:
            c = c.cast(target)
        cols.append(c.alias(k))
    return df.select(*cols)


def coerce_columns(df: DataFrame, spec: dict[str, str] | None = None) -> DataFrame:
    """Apply the dirty-value coercion spec to whichever spec'd columns are
    present. Called AFTER LWW dedup in the apply pipeline so the
    vectorized pandas UDFs see one row per key (the winners), not every
    duplicate event — same result, a fraction of the Arrow traffic."""
    spec = DEFAULT_COERCE_SPEC if spec is None else spec
    out = {}
    for k, target in spec.items():
        if k not in df.columns:
            continue
        c = F.col(k)
        out[k] = (
            PANDAS_COERCERS[target](c)
            if target in PANDAS_COERCERS
            else c.cast(target)
        )
    return df.withColumns(out) if out else df
