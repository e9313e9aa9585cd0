"""Batch-apply correctness vs the pandas replay oracle (FIXTURES.md §3)."""

import datetime as dt

import pytest

from etl_rs_spark.cdc.apply import apply_batch
from etl_rs_spark.generator import gen_change_stream, to_envelope
from etl_rs_spark.oracle import replay
from etl_rs_spark.sinks.lake import LakeTable
from tests.util import assert_state_equal

TABLE_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def make_table(spark, tmp_path, name="t", num_buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / name), TABLE_DDL, num_buckets=num_buckets
    )


@pytest.fixture(scope="module")
def stream(spark):
    ev = gen_change_stream(
        spark, n_events=5000, n_convs=50, turns_per_conv=8, seed=42
    ).cache()
    yield ev
    ev.unpersist()


def test_single_batch_apply_matches_oracle(spark, tmp_path, stream):
    table = make_table(spark, tmp_path)
    stats = apply_batch(
        table, to_envelope(stream), batch_id=0, run_id="run-a"
    )
    assert not stats.get("skipped")

    oracle = replay(stream.toPandas())
    engine = table.read().toPandas()
    assert_state_equal(engine, oracle)


def test_multi_batch_apply_matches_oracle(spark, tmp_path, stream):
    from pyspark.sql import functions as F

    table = make_table(spark, tmp_path)
    env = to_envelope(stream)
    for i, (lo, hi) in enumerate([(0, 1500), (1500, 3200), (3200, 5000)]):
        chunk = env.where((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        apply_batch(table, chunk, batch_id=i, run_id="run-b")

    oracle = replay(stream.toPandas())
    engine = table.read().toPandas()
    assert_state_equal(engine, oracle)
    # time travel: version after first commit differs from final
    assert table.current().version == 3
    v1 = table.read(version=1).toPandas()
    assert len(v1) < len(engine) or not v1.equals(engine)


def test_reapply_same_batch_is_skipped(spark, tmp_path, stream):
    table = make_table(spark, tmp_path)
    env = to_envelope(stream)
    apply_batch(table, env, batch_id=0, run_id="run-c")
    v = table.current().version
    stats = apply_batch(table, env, batch_id=0, run_id="run-c")
    assert stats["skipped"]
    assert table.current().version == v


def test_reapply_under_new_run_converges(spark, tmp_path, stream):
    """Replaying the whole stream under a different checkpoint identity
    must not change state (LWW idempotence — exactly-once semantics)."""
    table = make_table(spark, tmp_path)
    env = to_envelope(stream)
    apply_batch(table, env, batch_id=0, run_id="run-d")
    before = table.read().toPandas()
    stats = apply_batch(table, env, batch_id=0, run_id="run-e")
    assert not stats.get("skipped")
    after = table.read().toPandas()
    assert_state_equal(after, before)


def _mk_env(spark, rows):
    """rows: (lsn, op, conv_id, turn_idx, ts_sec, text)"""
    import json

    data = [
        (
            lsn,
            op,
            cid,
            ti,
            dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
            + dt.timedelta(seconds=s),
            json.dumps({"role": "user", "text": txt}) if op != "D" else "{}",
        )
        for (lsn, op, cid, ti, s, txt) in rows
    ]
    return spark.createDataFrame(
        data, "lsn long, op string, conv_id string, turn_idx int, ts timestamp, payload string"
    )


def test_delete_then_resurrect(spark, tmp_path):
    table = make_table(spark, tmp_path)
    env = _mk_env(
        spark,
        [
            (1, "I", "c1", 0, 10, "v1"),
            (2, "D", "c1", 0, 20, None),
            (3, "I", "c1", 0, 30, "v3"),  # resurrection at higher lsn
            (4, "I", "c2", 0, 10, "w1"),
            (5, "D", "c2", 0, 20, None),  # stays deleted
        ],
    )
    apply_batch(table, env, batch_id=0, run_id="r")
    got = table.read().toPandas().sort_values("conv_id")
    assert list(got["conv_id"]) == ["c1"]
    assert list(got["text"]) == ["v3"]


def test_late_older_event_cannot_resurrect_across_batches(spark, tmp_path):
    """Tombstone semantics: delete applied in batch 0; batch 1 delivers a
    LATE event with older (ts) for the same key — must stay deleted."""
    table = make_table(spark, tmp_path)
    apply_batch(
        table,
        _mk_env(spark, [(1, "I", "c1", 0, 10, "v1"), (2, "D", "c1", 0, 50, None)]),
        batch_id=0,
        run_id="r",
    )
    assert len(table.read().toPandas()) == 0
    apply_batch(
        table,
        _mk_env(spark, [(3, "U", "c1", 0, 25, "late")]),  # ts 25 < delete ts 50
        batch_id=1,
        run_id="r",
    )
    assert len(table.read().toPandas()) == 0
    # but a genuinely newer event resurrects
    apply_batch(
        table,
        _mk_env(spark, [(4, "U", "c1", 0, 60, "new")]),
        batch_id=2,
        run_id="r",
    )
    got = table.read().toPandas()
    assert list(got["text"]) == ["new"]


def test_two_stage_salted_dedup_same_result(spark, tmp_path, stream):
    from etl_rs_spark.config import CdcConfig

    t1 = make_table(spark, tmp_path, "plain")
    t2 = make_table(spark, tmp_path, "salted")
    env = to_envelope(stream)
    apply_batch(t1, env, batch_id=0, run_id="r")
    apply_batch(
        t2, env, batch_id=0, run_id="r", cfg=CdcConfig(salt_buckets=8)
    )
    assert_state_equal(t2.read().toPandas(), t1.read().toPandas())


def test_coerce_spec_widening_promotes_across_restart(spark, tmp_path):
    """Operational promotion scenario: a deploy first coerces a payload
    key to int; a later deploy (new run over the same table) widens the
    coercion to long and the stream starts carrying beyond-int32
    values. The second apply promotes the table column in place
    (int -> bigint) through the full normalize -> coerce -> merge
    path; pre-promotion rows read back intact."""
    import json

    from pyspark.sql import functions as F

    table = make_table(spark, tmp_path)

    def env(rows):
        data = [
            (
                lsn,
                "I",
                cid,
                0,
                dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
                + dt.timedelta(seconds=lsn),
                json.dumps({"text": "t", "score": score}),
            )
            for (lsn, cid, score) in rows
        ]
        return spark.createDataFrame(
            data,
            "lsn long, op string, conv_id string, turn_idx int, "
            "ts timestamp, payload string",
        )

    apply_batch(
        table,
        env([(1, "a", 7), (2, "b", 9)]),
        batch_id=0,
        run_id="deploy1",
        coerce_spec={"score": "int"},
    )
    assert (
        dict(table.read().dtypes)["score"] == "int"
    ), dict(table.read().dtypes)

    stats = apply_batch(
        table,
        env([(3, "c", 2**40)]),
        batch_id=0,
        run_id="deploy2",
        coerce_spec={"score": "long"},
    )
    assert stats["schema_promoted"] == {"score": "bigint"}, stats
    got = {r["conv_id"]: r["score"] for r in table.read().collect()}
    assert got == {"a": 7, "b": 9, "c": 2**40}
    assert dict(table.read().dtypes)["score"] == "bigint"


def test_column_map_guards_merge_columns(spark, tmp_path, stream):
    """column_map may only remap payload columns — remapping a merge
    key/order/op column would desync dedup (which runs before the map)
    and must fail fast as a config error."""
    from etl_rs_spark.config import CdcConfig
    from etl_rs_spark.errors import ConfigError

    t = make_table(spark, tmp_path)
    env = to_envelope(stream).limit(100)
    with pytest.raises(ConfigError):
        apply_batch(
            t, env, batch_id=0, run_id="r",
            cfg=CdcConfig(column_map={"conv_id": "conversation"}),
        )
    # a mapping whose source key never appears is a no-op, not an error
    stats = apply_batch(
        t, env, batch_id=0, run_id="r",
        cfg=CdcConfig(column_map={"nonexistent": "whatever"}),
    )
    assert not stats.get("skipped")


def test_apply_matches_oracle_under_range_distribution(spark, tmp_path, stream):
    """write.distribution-mode=range changes only the physical file
    layout (range-partitioned, disjoint key bounds); the applied state
    is byte-identical to the oracle replay."""
    from pyspark.sql import functions as F

    table = LakeTable.create(
        spark,
        str(tmp_path / "rng"),
        TABLE_DDL,
        num_buckets=4,
        props={
            "write.distribution-mode": "range",
            "write.target-file-rows": 200,
        },
    )
    env = to_envelope(stream)
    for i, (lo, hi) in enumerate([(0, 2500), (2500, 5000)]):
        apply_batch(
            table,
            env.where((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
            batch_id=i,
            run_id="run-range",
        )
    assert_state_equal(table.read().toPandas(), replay(stream.toPandas()))
    # the layout actually differs: multi-file buckets with key stats
    snap = table.current()
    per_bucket: dict = {}
    for f in snap.files:
        per_bucket.setdefault(f["bucket"], []).append(f)
    assert any(len(fs) > 1 for fs in per_bucket.values())
    assert all(f.get("min_key") is not None for f in snap.files)
