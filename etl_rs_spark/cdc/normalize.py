"""CDC payload normalization — envelope in, typed change rows out.

The wire envelope carries evolving payload fields inside one JSON string
(generator.ENVELOPE_SCHEMA). Normalization:

1. **Batch prescan** (one job per microbatch): a single groupBy(bucket)
   aggregation over the raw envelope computes, at once, (a) the union of
   JSON object keys via the built-in ``json_object_keys`` +
   ``collect_set`` of the (sorted) per-row key shapes — the reference's
   union-of-keys schema inference (/root/reference/src/load/parquet.rs:125-138)
   done on a microbatch, which is what lets a brand-new column (e.g.
   ``lang``) surface mid-stream — and (b) per-bucket event counts and
   the LSN range, which feed the merge's partition pruning, the
   skew-aware write plan, and the lineage record. One cheap scan (no
   from_json, no dedup shuffle; result is at most num_buckets rows)
   replaces what round 1 did in two separate full-recompute passes.
2. **JSON parse** with ``from_json`` against the discovered struct —
   JVM-side, codegen'd; the payload never reaches Python as a row.
3. **Dirty-value coercion** of spec'd metadata columns via vectorized
   pandas UDFs (functions/coercion.py) — mixed-case boolean strings,
   multi-format date strings — per the reference cast semantics
   (/root/reference/src/types.rs:206-331). Arrow-batched; no per-row
   Python anywhere (BASELINE.json input_hint).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rs_spark.functions.coercion import PANDAS_COERCERS

#: default dirty-metadata coercion spec: payload key -> target type
DEFAULT_COERCE_SPEC = {"meta_active": "boolean", "meta_edited": "date"}


@dataclass
class BatchStats:
    """Everything the apply path needs to know about a microbatch that
    is knowable without parsing payload values — produced by ONE job."""

    keys: list[str] = field(default_factory=list)  # payload key union
    n_events: int = 0
    hi_lsn: int | None = None
    lo_lsn: int | None = None
    #: bucket -> {"n": events, "min_lsn": .., "max_lsn": ..}
    per_bucket: dict[int, dict[str, int]] = field(default_factory=dict)

    @property
    def bucket_counts(self) -> dict[int, int]:
        return {b: s["n"] for b, s in self.per_bucket.items()}


def prescan_batch(
    envelope: DataFrame,
    bucket: F.Column,
    payload_col: str = "payload",
    lsn_col: str = "lsn",
    with_keys: bool = True,
) -> BatchStats:
    """One aggregation job over the raw envelope: per-bucket counts +
    LSN range, plus (with_keys) the payload-key union. collect_set
    gathers distinct *sorted key-array shapes* (a handful per schema
    epoch), not per-row data, so the result stays O(buckets x shapes)
    regardless of batch size.

    with_keys=False keeps the prescan to the typed envelope columns
    (conv_id for the bucket, lsn) — the scan never touches the payload
    bytes' JSON structure, which makes it ~5x cheaper; the CDC apply
    path uses this and discovers keys post-dedup on the winners."""
    aggs = [
        F.count("*").alias("n"),
        F.min(lsn_col).alias("lo"),
        F.max(lsn_col).alias("hi"),
    ]
    if with_keys:
        shapes = F.array_sort(
            F.json_object_keys(F.coalesce(F.col(payload_col), F.lit("{}")))
        )
        aggs.append(
            F.array_distinct(F.flatten(F.collect_set(shapes))).alias("keys")
        )
    rows = envelope.groupBy(bucket.alias("__b")).agg(*aggs).collect()
    stats = BatchStats()
    keyset: set[str] = set()
    for r in rows:
        stats.per_bucket[r["__b"]] = {
            "n": r["n"],
            "min_lsn": r["lo"],
            "max_lsn": r["hi"],
        }
        stats.n_events += r["n"]
        if with_keys:
            keyset.update(r["keys"])
        if r["hi"] is not None:
            stats.hi_lsn = r["hi"] if stats.hi_lsn is None else max(stats.hi_lsn, r["hi"])
        if r["lo"] is not None:
            stats.lo_lsn = r["lo"] if stats.lo_lsn is None else min(stats.lo_lsn, r["lo"])
    stats.keys = sorted(keyset)
    return stats


def discover_payload_keys(envelope: DataFrame, payload_col: str = "payload") -> list[str]:
    """Distinct JSON keys across the batch (sorted for determinism).

    Standalone variant kept for direct callers; the apply hot path gets
    the keys from prescan_batch's combined aggregation instead."""
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
    keys: list[str] | None = None,
) -> DataFrame:
    """Envelope (lsn, op, conv_id, turn_idx, ts, payload-json) ->
    typed change rows (lsn, op, conv_id, turn_idx, ts, <payload cols>).

    Payload columns are whatever keys this batch actually carries —
    additive schema evolution flows through here to the MERGE, which
    widens the table. Pass ``keys`` (e.g. from prescan_batch) to skip
    the discovery job.
    """
    spec = DEFAULT_COERCE_SPEC if coerce_spec is None else coerce_spec
    if keys is None:
        keys = discover_payload_keys(envelope, payload_col)

    # a key whose spec target is a COMPLEX type (struct/array/map — a
    # transcript's tool-call record, a step list) parses natively inside
    # the one from_json pass: the field gets the declared type instead
    # of string, so nested payloads flow through the stream to the
    # MERGE's nested schema evolution with no re-parse and no Python.
    # Malformed nested values null out (PERMISSIVE), same contract as
    # try_cast on scalars.
    def _target_type(k: str) -> T.DataType | None:
        t_ddl = spec.get(k)
        if t_ddl is None:
            return None
        try:
            dt = T.StructType.fromDDL(f"`{k}` {t_ddl}")[0].dataType
        except Exception:
            return None
        return (
            dt
            if isinstance(dt, (T.StructType, T.ArrayType, T.MapType))
            else None
        )

    complex_types = {
        k: dt for k in keys if (dt := _target_type(k)) is not None
    }
    payload_schema = T.StructType(
        [
            T.StructField(k, complex_types.get(k, T.StringType()))
            for k in keys
        ]
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
        if k in complex_types:
            cols.append(c.alias(k))  # already parsed to the target type
            continue
        if coerce and target is not None and target in PANDAS_COERCERS:
            c = PANDAS_COERCERS[target](c)  # vectorized Arrow batch coercion
        elif coerce and target is not None:
            # try_cast: malformed payload values must yield NULL, not an
            # ANSI CAST_INVALID_INPUT that kills the microbatch.
            c = c.try_cast(target)
        cols.append(c.alias(k))
    return df.select(*cols)


def coerce_columns(df: DataFrame, spec: dict[str, str] | None = None) -> DataFrame:
    """Apply the dirty-value coercion spec to whichever spec'd columns are
    present. Called AFTER LWW dedup in the apply pipeline so the
    vectorized pandas UDFs see one row per key (the winners), not every
    duplicate event — same result, a fraction of the Arrow traffic."""
    spec = DEFAULT_COERCE_SPEC if spec is None else spec
    out = {}
    types = {f.name: f.dataType for f in df.schema.fields}
    for k, target in spec.items():
        if k not in df.columns:
            continue
        if isinstance(
            types[k], (T.StructType, T.ArrayType, T.MapType)
        ):
            continue  # parsed natively by normalize_events already
        c = F.col(k)
        if target not in PANDAS_COERCERS:
            # a COMPLEX target against a still-string column (data that
            # did not pass through normalize_events with this spec):
            # string->struct/array/map try_cast is not a valid cast and
            # would raise an AnalysisException at plan time instead of
            # nulling malformed values — parse with from_json, which
            # yields NULL for malformed input, the coercion contract
            # (ADVICE r05).
            try:
                target_dt = T.StructType.fromDDL(f"`__c` {target}")[
                    0
                ].dataType
            except Exception:
                target_dt = None
            if isinstance(
                target_dt, (T.StructType, T.ArrayType, T.MapType)
            ) and isinstance(types[k], T.StringType):
                # from_json in PERMISSIVE mode yields an all-null
                # struct for malformed input; gate on JSON validity so
                # malformed values become NULL like every other failed
                # coercion
                valid = (
                    F.json_array_length(c).isNotNull()
                    if isinstance(target_dt, T.ArrayType)
                    else F.json_object_keys(c).isNotNull()
                )
                out[k] = F.when(
                    c.isNotNull() & valid, F.from_json(c, target_dt)
                )
                continue
            out[k] = c.try_cast(target)
            continue
        out[k] = PANDAS_COERCERS[target](c)
    return df.withColumns(out) if out else df
