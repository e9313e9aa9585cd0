"""Property-based CDC correctness: hypothesis generates adversarial
change streams (timestamp collisions, out-of-order LSNs across batches,
interleaved deletes/resurrections, sparse payload keys = mid-stream
schema evolution, arbitrary batch splits) and the engine's final table
state must equal the pandas replay oracle for EVERY case.

This is the randomized counterpart of SURVEY.md §5.2's replay-oracle
test: instead of one seeded stream, it searches the event-ordering
space where LWW + tombstone + schema-evolution bugs live."""

from __future__ import annotations

import json

from datetime import datetime, timedelta, timezone

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_rs_spark.cdc.apply import apply_batch
from etl_rs_spark.config import CdcConfig
from etl_rs_spark.generator import ENVELOPE_SCHEMA
from etl_rs_spark.oracle import replay_envelope
from etl_rs_spark.sinks.lake import LakeTable
from tests.util import assert_state_equal

DDL = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

#: one generated event: key x (ts with few distinct values => collisions,
#: broken only by lsn) x op x sparse payload fields
_event = st.tuples(
    st.sampled_from(["c0", "c1", "c2"]),            # conv_id (hot keyspace)
    st.integers(min_value=0, max_value=2),          # turn_idx
    st.integers(min_value=0, max_value=3),          # ts bucket (collisions!)
    st.sampled_from(["I", "U", "D"]),               # op
    st.one_of(st.none(), st.sampled_from(["a", "b", ""])),   # text
    st.one_of(st.none(), st.sampled_from(["x", "y"])),       # lang (evolved)
)

_stream = st.lists(_event, min_size=1, max_size=40)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=_stream, n_batches=st.integers(min_value=1, max_value=3))
def test_random_stream_matches_oracle(spark, tmp_path_factory, events, n_batches):
    rows = []
    for lsn, (conv, turn, tsb, op, text, lang) in enumerate(events):
        payload = {}
        if text is not None:
            payload["text"] = text
        if lang is not None:
            payload["lang"] = lang
        rows.append(
            (
                lsn,
                op,
                conv,
                turn,
                datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=tsb),
                json.dumps(payload) if payload else None,
            )
        )
    env = spark.createDataFrame(rows, ENVELOPE_SCHEMA)

    work = tmp_path_factory.mktemp("prop")
    table = LakeTable.create(spark, str(work / "t"), DDL, num_buckets=4)
    cfg = CdcConfig()
    # arbitrary batch split by lsn ranges, applied in order — batches
    # carry whatever ts-ordering chaos hypothesis generated
    per = (len(rows) + n_batches - 1) // n_batches
    for i in range(n_batches):
        chunk = env.where(
            (F.col("lsn") >= i * per) & (F.col("lsn") < (i + 1) * per)
        )
        apply_batch(table, chunk, batch_id=i, run_id="prop", cfg=cfg)

    got = table.read().toPandas()
    want = replay_envelope(env.toPandas(), coercions={})
    if len(want) == 0:
        assert len(got) == 0
        return
    assert_state_equal(got, want)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(events=_stream)
def test_replay_twice_is_idempotent(spark, tmp_path_factory, events):
    """Applying the identical batch under a NEW run_id (an at-least-once
    redelivery the commit log cannot skip) must not change state — the
    LWW merge itself is the idempotence backstop."""
    rows = [
        (
            lsn,
            op,
            conv,
            turn,
            datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=tsb),
            json.dumps({"text": text}) if text is not None else None,
        )
        for lsn, (conv, turn, tsb, op, text, _l) in enumerate(events)
    ]
    env = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    work = tmp_path_factory.mktemp("idem")
    table = LakeTable.create(spark, str(work / "t"), DDL, num_buckets=4)
    apply_batch(table, env, batch_id=0, run_id="r1", cfg=CdcConfig())
    first = table.read().toPandas()
    apply_batch(table, env, batch_id=0, run_id="r2", cfg=CdcConfig())
    second = table.read().toPandas()
    if len(first) == 0:
        assert len(second) == 0
        return
    assert_state_equal(second, first)
