"""Trust anchors for the endurance runner (scripts/run_endurance.py).

The endurance run's verification only means something if (a) a wave can
be regenerated bit-identically at verify time, and (b) the distributed
one-pass oracle (groupBy max_by + inline coercions) agrees with the
engine-independent pandas oracle the whole test suite is built on.
Both are pinned here at small scale, so a PASS from the big run can't
be an artifact of a broken verifier.
"""

from __future__ import annotations

import pandas.testing as pdt
from pyspark.sql import functions as F

from etl_rs_spark.oracle import replay
from scripts.run_endurance import gen_wave, oracle_mismatches  # noqa: F401
from tests.util import normalize_frame

WAVES, PER, CONVS, PARTS = 4, 5000, 40, 4


def _full_stream(spark):
    full = None
    for w in range(WAVES):
        ev = gen_wave(spark, w, PER, CONVS, WAVES, PARTS)
        full = ev if full is None else full.unionByName(
            ev, allowMissingColumns=True
        )
    return full


def test_wave_regeneration_is_bit_identical(spark):
    a = gen_wave(spark, 2, PER, CONVS, WAVES, PARTS).toPandas()
    b = gen_wave(spark, 2, PER, CONVS, WAVES, PARTS).toPandas()
    key = ["lsn"]
    pdt.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_waves_are_disjoint_lsn_segments(spark):
    full = _full_stream(spark)
    agg = full.agg(
        F.countDistinct("lsn").alias("d"),
        F.count("*").alias("n"),
        F.min("lsn").alias("lo"),
        F.max("lsn").alias("hi"),
    ).collect()[0]
    assert agg["d"] == agg["n"] == WAVES * PER
    assert (agg["lo"], agg["hi"]) == (0, WAVES * PER - 1)


def test_distributed_oracle_matches_pandas_oracle(spark):
    """The big run's verifier vs oracle.replay on the same stream."""
    full = _full_stream(spark)
    if "lang" not in full.columns:
        full = full.withColumn("lang", F.lit(None).cast("string"))

    row = F.struct(*[F.col(c) for c in full.columns])
    winners = (
        full.groupBy("conv_id", "turn_idx")
        .agg(F.max_by(row, F.struct("ts", "lsn")).alias("w"))
        .select("w.*")
        .where(F.col("op") != "D")
        .drop("op", "lsn")
    )
    low = F.lower(F.trim(F.col("meta_active")))
    winners = winners.withColumn(
        "meta_active",
        F.when(low.isin("true", "1", "yes", "y"), F.lit(True)).when(
            low.isin("false", "0", "no", "n"), F.lit(False)
        ),
    ).withColumn(
        "meta_edited",
        F.coalesce(
            F.try_to_timestamp(F.col("meta_edited"), F.lit("yyyy-MM-dd")),
            F.try_to_timestamp(F.col("meta_edited"), F.lit("dd/MM/yyyy")),
            F.try_to_timestamp(F.col("meta_edited"), F.lit("MM/dd/yyyy")),
        ).cast("date"),
    )

    want = replay(full.toPandas())  # pandas oracle, lang included
    got = winners.toPandas()
    cols = sorted(set(got.columns) & set(want.columns))
    e = normalize_frame(got[cols])
    o = normalize_frame(want[cols])
    assert len(e) == len(o)
    pdt.assert_frame_equal(e, o, check_dtype=False, check_like=True)


def test_hash_oracle_agrees_with_join_oracle(spark, tmp_path):
    """The 10^9-scale verifier (per-wave winner partials + canonical
    hash triple) must reduce to exactly what hashing the proven
    join-path winners yields — same count, sum and xor."""
    from scripts.run_endurance import (
        _canonical_hash,
        _coerce_meta,
        _hash_triple,
        oracle_hash_triple,
    )

    full = _full_stream(spark)
    if "lang" not in full.columns:
        full = full.withColumn("lang", F.lit(None).cast("string"))
    row = F.struct(*[F.col(c) for c in full.columns])
    winners = _coerce_meta(
        full.groupBy("conv_id", "turn_idx")
        .agg(F.max_by(row, F.struct("ts", "lsn")).alias("w"))
        .select("w.*")
        .where(F.col("op") != "D")
        .drop("op", "lsn")
    )
    want = _hash_triple(winners.select(_canonical_hash().alias("h")))
    got = oracle_hash_triple(
        spark, WAVES, PER, CONVS, PARTS, str(tmp_path)
    )
    assert got == want
