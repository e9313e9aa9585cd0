"""Deterministic synthetic transcript + CDC change-stream generator.

Implements FIXTURES.md §1-2: a base ``transcripts`` table
(conv_id, turn_idx, role, text, tool, ts) and a binlog/WAL-style change
stream ``transcript_events`` (lsn, op, key, payload, ts) with

- ~I/U/D mix where the first event for a key is I, later ones U, and a
  deterministic subset D (keys can be deleted then re-inserted at higher
  LSN — the resurrection case),
- bounded out-of-order event time with ts ties (so the (ts, lsn) LWW
  tiebreaker is load-bearing),
- optional hot-conversation skew (one conv_id receives ~hot_frac of all
  events),
- optional additive schema-evolution column ``lang`` carried only by
  events with lsn >= evolve_after_lsn,
- dirty payload metadata (mixed-case boolean strings, multi-format date
  strings) to exercise the vectorized normalizer — coercion semantics per
  the reference's DataValue casts (/root/reference/src/types.rs:206-331).

Generation is fully columnar and distributed: ``spark.range(n)`` plus
built-in expressions (xxhash64 keyed on the seed) — no driver-side loops,
so the same code generates 10^3 test rows or 10^10 bench rows.
Determinism: every derived value is a pure function of (seed, lsn).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
EVENT_COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _h(seed: int, *cols) -> F.Column:
    """Deterministic non-negative 64-bit hash of (seed, *cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def gen_change_stream(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 100,
    turns_per_conv: int = 32,
    seed: int = 42,
    hot_conv_frac: float = 0.0,
    delete_frac: float = 0.05,
    evolve_after_lsn: int | None = None,
    ts_jitter: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Return the LSN-ordered CDC event DataFrame.

    Columns: lsn:long, op:string(I|U|D), conv_id:string, turn_idx:int,
    role:string, text:string, tool:string, ts:timestamp
    [, lang:string when evolve_after_lsn is set]
    [, meta_active:string, meta_edited:string — dirty payload metadata].
    """
    rng = spark.range(n_events, numPartitions=partitions)
    df = rng.withColumn("lsn", F.col("id")).drop("id")

    # --- key assignment -------------------------------------------------
    conv_hash = _h(seed, F.col("lsn"))
    if hot_conv_frac > 0:
        # deterministic hot-key skew: a slice of events all land on conv 0
        is_hot = (conv_hash % 1000) < int(hot_conv_frac * 1000)
        conv_num = F.when(is_hot, F.lit(0)).otherwise(
            (_h(seed + 1, F.col("lsn")) % F.lit(max(n_convs - 1, 1))) + 1
        )
    else:
        conv_num = conv_hash % F.lit(n_convs)
    df = df.withColumn("conv_num", conv_num)
    df = df.withColumn(
        "conv_id", F.format_string("conv-%05d", F.col("conv_num"))
    )
    df = df.withColumn(
        "turn_idx",
        (_h(seed + 2, F.col("lsn")) % F.lit(turns_per_conv)).cast("int"),
    )

    # --- version = how many events this key has seen so far --------------
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("lsn")
    df = df.withColumn("version", F.row_number().over(w))

    # --- op: first event per key is I; later events U, a hash-chosen
    # subset D (so keys get deleted and later re-upserted = resurrection)
    del_mod = max(int(1.0 / delete_frac), 2) if delete_frac > 0 else 0
    op = F.when(F.col("version") == 1, F.lit("I"))
    if del_mod:
        op = op.when(
            _h(seed + 3, F.col("conv_id"), F.col("turn_idx"), F.col("version"))
            % del_mod
            == 0,
            F.lit("D"),
        )
    df = df.withColumn("op", op.otherwise(F.lit("U")))

    # --- event time: monotone-ish in lsn with bounded out-of-order jitter,
    # second granularity so ts ties happen and lsn breaks them (LWW).
    jitter = (_h(seed + 4, F.col("lsn")) % F.lit(2 * ts_jitter + 1)) - F.lit(
        ts_jitter
    )
    df = df.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(BASE_EPOCH) + F.greatest(F.lit(0), F.col("lsn") + jitter)
        ),
    )

    # --- payload (null for deletes, per FIXTURES.md §2) ------------------
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("turn_idx") % 3) + 1,
    )
    text = F.format_string(
        "turn %s/%d v%d :: %s",
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("version"),
        F.sha1(
            F.concat_ws(
                "|",
                F.lit(seed),
                F.col("conv_id"),
                F.col("turn_idx"),
                F.col("version"),
            )
        ),
    )
    tool = F.when(
        role == "tool",
        F.format_string("tool-%d", _h(seed + 5, F.col("turn_idx")) % 5),
    )
    is_del = F.col("op") == "D"
    df = (
        df.withColumn("role", F.when(~is_del, role))
        .withColumn("text", F.when(~is_del, text))
        .withColumn("tool", F.when(~is_del, tool))
    )

    # --- dirty metadata for the vectorized normalizer --------------------
    bool_forms = F.array(
        *[F.lit(s) for s in ["TRUE", "yes", "Y", "1", "False", "NO", "n", "0"]]
    )
    date_forms = F.array(
        F.date_format(F.col("ts"), "yyyy-MM-dd"),
        F.date_format(F.col("ts"), "dd/MM/yyyy"),
        F.date_format(F.col("ts"), "MM/dd/yyyy"),
    )
    df = df.withColumn(
        "meta_active",
        F.when(
            ~is_del, F.element_at(bool_forms, (_h(seed + 6, F.col("lsn")) % 8 + 1).cast("int"))
        ),
    ).withColumn(
        "meta_edited",
        F.when(
            ~is_del, F.element_at(date_forms, (_h(seed + 7, F.col("lsn")) % 3 + 1).cast("int"))
        ),
    )

    cols = EVENT_COLS + ["meta_active", "meta_edited"]
    if evolve_after_lsn is not None:
        df = df.withColumn(
            "lang",
            F.when(
                (F.col("lsn") >= evolve_after_lsn) & ~is_del,
                F.element_at(
                    F.array(F.lit("en"), F.lit("pt"), F.lit("es"), F.lit("de")),
                    (_h(seed + 8, F.col("conv_id")) % 4 + 1).cast("int"),
                ),
            ),
        )
        cols = cols + ["lang"]
    return df.select(*cols)


def gen_base_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    turns_per_conv: int = 32,
    seed: int = 42,
) -> DataFrame:
    """A fully-populated base table (every key at version 1) — used to
    seed a table before replaying a change stream on top of it."""
    n = n_convs * turns_per_conv
    df = spark.range(n).select(
        F.format_string(
            "conv-%05d", (F.col("id") / turns_per_conv).cast("long")
        ).alias("conv_id"),
        (F.col("id") % turns_per_conv).cast("int").alias("turn_idx"),
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("turn_idx") % 3) + 1,
    )
    text = F.format_string(
        "turn %s/%d v0 :: %s",
        F.col("conv_id"),
        F.col("turn_idx"),
        F.sha1(
            F.concat_ws(
                "|", F.lit(seed), F.col("conv_id"), F.col("turn_idx"), F.lit(0)
            )
        ),
    )
    tool = F.when(
        role == "tool",
        F.format_string("tool-%d", _h(seed + 5, F.col("turn_idx")) % 5),
    )
    return df.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(F.lit(BASE_EPOCH - 86400)).alias("ts"),
    )


#: Fixed wire schema of the CDC envelope — stable across schema evolution
#: because evolving payload fields live inside the JSON ``payload`` string
#: (Debezium/binlog style). This is what the streaming source reads.
ENVELOPE_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, "
    "ts timestamp, payload string"
)


def to_envelope(events: DataFrame) -> DataFrame:
    """Pack the typed change stream into the CDC wire envelope.

    All payload fields (role, text, tool, dirty metadata, any evolved
    columns like ``lang``) are serialized into one JSON string; null
    fields are omitted, so a column that hasn't started appearing yet is
    simply absent from every payload — exactly how additive schema
    evolution presents in a real binlog.
    """
    key_cols = {"lsn", "op", "conv_id", "turn_idx", "ts"}
    payload_cols = [c for c in events.columns if c not in key_cols]
    return events.select(
        "lsn",
        "op",
        "conv_id",
        "turn_idx",
        "ts",
        F.to_json(F.struct(*payload_cols)).alias("payload"),
    )


def write_event_files(
    envelope: DataFrame,
    out_dir: str,
    n_files: int,
    fmt: str = "parquet",
) -> list[str]:
    """Materialize the envelope stream as LSN-ordered flat files — the
    replayable file-based binlog the streaming driver tails.

    Files are range-partitioned on lsn so file order == LSN order (the
    reference tracks a `current_position` for this but never advances it,
    /root/reference/src/extract/csv.rs:192-211; file offsets in the
    streaming checkpoint do it for real).
    """
    import glob
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    n_events = envelope.agg(F.max("lsn")).collect()[0][0] + 1
    per = (n_events + n_files - 1) // n_files
    paths: list[str] = []
    for i in range(n_files):
        lo, hi = i * per, min((i + 1) * per, n_events)
        if lo >= hi:
            break
        chunk = envelope.where(
            (F.col("lsn") >= lo) & (F.col("lsn") < hi)
        ).orderBy("lsn")
        tmp = os.path.join(out_dir, f"_tmp-{i:05d}")
        ext = "parquet" if fmt == "parquet" else "json"
        chunk.coalesce(1).write.mode("overwrite").format(fmt).save(tmp)
        (part,) = glob.glob(os.path.join(tmp, f"part-*.{ext}*"))
        final = os.path.join(out_dir, f"batch-{i:05d}.{ext}")
        shutil.move(part, final)
        shutil.rmtree(tmp)
        paths.append(final)
    return paths
