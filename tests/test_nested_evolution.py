"""Nested additive schema evolution (Iceberg spec: struct fields may be
added at any nesting depth in place — including inside array elements
and map values). The reference stores schema-evolution knobs and never
applies them (/root/reference/src/load/delta.rs:62-69); here a struct
payload column widening mid-stream is a first-class merge path:
transcript `tool` payloads are exactly this shape (a tool call record
growing an `args`/`calls` field as the agent runtime evolves)."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rs_spark.sinks.lake import (
    LakeTable,
    _align_cast,
    _needs_structural_align,
    _promote_type,
)

DDL = (
    "conv_id string, turn_idx int, "
    "tool struct<name:string, ok:boolean>, ts timestamp"
)


def _src(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_promote_struct_adds_fields_and_recurses():
    cur = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n", T.IntegerType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n", T.LongType()),  # nested promotion
            T.StructField("args", T.StringType()),  # nested add
        ]
    )
    p = _promote_type(cur, new)
    assert [f.name for f in p.fields] == ["name", "n", "args"]
    assert p["n"].dataType == T.LongType()
    # incoming missing a field never shrinks; identical struct is a no-op
    assert _promote_type(new, cur) is None
    assert _promote_type(cur, cur) is None
    # non-promotable nested mismatch keeps the table type
    bad = T.StructType([T.StructField("n", T.StringType())])
    got = _promote_type(cur, bad)
    assert got is None  # nothing widened -> no schema change
    # array element / map value recursion
    pa = _promote_type(T.ArrayType(cur), T.ArrayType(new))
    assert isinstance(pa, T.ArrayType) and pa.elementType["args"]
    pm = _promote_type(
        T.MapType(T.StringType(), cur), T.MapType(T.StringType(), new)
    )
    assert isinstance(pm, T.MapType) and pm.valueType["args"]
    # map key type change is never a promotion
    assert (
        _promote_type(
            T.MapType(T.StringType(), cur), T.MapType(T.LongType(), new)
        )
        is None
    )


def test_align_cast_null_struct_stays_null(spark):
    narrow = T.StructType([T.StructField("name", T.StringType())])
    wide = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("args", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(("grep",),), (None,)], T.StructType([T.StructField("tool", narrow)])
    )
    out = df.select(_align_cast(F.col("tool"), narrow, wide).alias("tool"))
    rows = {r.tool for r in out.collect()}
    assert ("grep", None) in {tuple(t) if t else None for t in rows}
    assert None in rows  # NULL struct did NOT become struct(NULL, NULL)
    assert not _needs_structural_align(narrow, narrow)
    assert _needs_structural_align(narrow, wide)
    assert _needs_structural_align(T.ArrayType(narrow), T.ArrayType(wide))


def test_merge_widens_nested_struct_in_place(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), DDL, num_buckets=4)
    b1 = _src(
        spark,
        [
            ("c1", 0, ("grep", True), dt.datetime(2025, 1, 1), 1, "I"),
            ("c2", 0, ("read", False), dt.datetime(2025, 1, 1), 2, "I"),
        ],
        "conv_id string, turn_idx int, "
        "tool struct<name:string, ok:boolean>, ts timestamp, "
        "lsn long, op string",
    )
    t.merge(b1, run_id="r", batch_id=0)
    # batch 2 arrives with a WIDER tool struct: +calls (nested add)
    b2 = _src(
        spark,
        [
            ("c2", 0, ("read", True, 5), dt.datetime(2025, 1, 2), 3, "U"),
            ("c3", 0, ("bash", True, 1), dt.datetime(2025, 1, 2), 4, "I"),
        ],
        "conv_id string, turn_idx int, "
        "tool struct<name:string, ok:boolean, calls:int>, ts timestamp, "
        "lsn long, op string",
    )
    res = t.merge(b2, run_id="r", batch_id=1)
    assert res["version"] == 2
    tool_t = t.current().schema()["tool"].dataType
    assert [f.name for f in tool_t.fields] == ["name", "ok", "calls"]
    got = {
        r.conv_id: (r.tool.name, r.tool.ok, r.tool.calls)
        for r in t.read().collect()
    }
    # c1's winner predates the widening: its batch-1 file is read back
    # through the widened schema with calls = NULL (no rewrite happened)
    assert got == {
        "c1": ("grep", True, None),
        "c2": ("read", True, 5),
        "c3": ("bash", True, 1),
    }
    # a later NARROW batch (pre-widening producer still live) aligns up
    b3 = _src(
        spark,
        [("c1", 0, ("edit", True), dt.datetime(2025, 1, 3), 5, "U")],
        "conv_id string, turn_idx int, "
        "tool struct<name:string, ok:boolean>, ts timestamp, "
        "lsn long, op string",
    )
    t.merge(b3, run_id="r", batch_id=2)
    r = t.read().where(F.col("conv_id") == "c1").first()
    assert (r.tool.name, r.tool.ok, r.tool.calls) == ("edit", True, None)


def test_merge_widens_nested_promotion_inside_struct(spark, tmp_path):
    ddl = "conv_id string, turn_idx int, tool struct<n:int>, ts timestamp"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl, num_buckets=2)
    b1 = _src(
        spark,
        [("c1", 0, (7,), dt.datetime(2025, 1, 1), 1, "I")],
        "conv_id string, turn_idx int, tool struct<n:int>, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(b1, run_id="r", batch_id=0)
    b2 = _src(
        spark,
        [("c2", 0, (2**40,), dt.datetime(2025, 1, 2), 2, "I")],
        "conv_id string, turn_idx int, tool struct<n:bigint>, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(b2, run_id="r", batch_id=1)
    tool_t = t.current().schema()["tool"].dataType
    assert tool_t["n"].dataType == T.LongType()
    got = {r.conv_id: r.tool.n for r in t.read().collect()}
    assert got == {"c1": 7, "c2": 2**40}


def test_merge_widens_array_of_struct(spark, tmp_path):
    ddl = (
        "conv_id string, turn_idx int, "
        "steps array<struct<name:string>>, ts timestamp"
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl, num_buckets=2)
    b1 = _src(
        spark,
        [("c1", 0, [("plan",), ("act",)], dt.datetime(2025, 1, 1), 1, "I")],
        "conv_id string, turn_idx int, steps array<struct<name:string>>, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(b1, run_id="r", batch_id=0)
    b2 = _src(
        spark,
        [
            (
                "c2",
                0,
                [("plan", 12), (None, None)],
                dt.datetime(2025, 1, 2),
                2,
                "I",
            )
        ],
        "conv_id string, turn_idx int, "
        "steps array<struct<name:string, ms:int>>, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(b2, run_id="r", batch_id=1)
    elem = t.current().schema()["steps"].dataType.elementType
    assert [f.name for f in elem.fields] == ["name", "ms"]
    got = {r.conv_id: [tuple(s) for s in r.steps] for r in t.read().collect()}
    assert got["c1"] == [("plan", None), ("act", None)]  # old file, null-fill
    assert got["c2"] == [("plan", 12), (None, None)]


def test_nested_widening_on_merge_on_read(spark, tmp_path):
    """Delta files written before and after the widening resolve
    together at read time under the tip schema."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=2,
        props={"write.merge.mode": "merge-on-read", "write.delta.max-files": 8},
    )
    b1 = _src(
        spark,
        [("c1", 0, ("grep", True), dt.datetime(2025, 1, 1), 1, "I")],
        "conv_id string, turn_idx int, "
        "tool struct<name:string, ok:boolean>, ts timestamp, "
        "lsn long, op string",
    )
    t.merge(b1, run_id="r", batch_id=0)
    b2 = _src(
        spark,
        [
            ("c1", 0, ("grep", True, 9), dt.datetime(2025, 1, 2), 2, "U"),
            ("c2", 0, ("bash", False, 0), dt.datetime(2025, 1, 2), 3, "I"),
        ],
        "conv_id string, turn_idx int, "
        "tool struct<name:string, ok:boolean, calls:int>, ts timestamp, "
        "lsn long, op string",
    )
    t.merge(b2, run_id="r", batch_id=1)
    got = {
        r.conv_id: (r.tool.name, r.tool.ok, r.tool.calls)
        for r in t.read().collect()
    }
    assert got == {"c1": ("grep", True, 9), "c2": ("bash", False, 0)}
    # compaction folds mixed-width delta files under the tip schema
    t.compact()
    got2 = {
        r.conv_id: (r.tool.name, r.tool.ok, r.tool.calls)
        for r in t.read().collect()
    }
    assert got2 == got


def test_iceberg_twin_nested_evolution_ddl():
    """The jar-gated twin emits field-path DDL for nested widenings
    (pure planning — no Iceberg needed to verify the statements)."""
    from etl_rs_spark.sinks.iceberg import _evolution_ddl

    cur = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n", T.IntegerType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("args", T.StringType()),
        ]
    )
    promoted = _promote_type(cur, new)
    steps = list(_evolution_ddl(cur, promoted, "tool"))
    assert ("promote", "tool.n", "bigint") in steps
    assert ("add", "tool.args", "string") in steps
    arr = list(
        _evolution_ddl(
            T.ArrayType(cur), _promote_type(T.ArrayType(cur), T.ArrayType(new)), "steps"
        )
    )
    assert ("add", "steps.element.args", "string") in arr
    mp = list(
        _evolution_ddl(
            T.MapType(T.StringType(), cur),
            _promote_type(
                T.MapType(T.StringType(), cur), T.MapType(T.StringType(), new)
            ),
            "m",
        )
    )
    assert ("add", "m.value.args", "string") in mp


def test_nested_payload_through_stream(spark, tmp_path):
    """End-to-end: nested tool-call payloads ride the binlog as JSON,
    parse natively to a struct via the coerce-spec (no string
    intermediary, no Python), and the mid-stream arrival of a new
    nested field widens the table struct in place."""
    import os

    from etl_rs_spark.cdc.stream import StreamDriver
    from etl_rs_spark.generator import write_event_files

    early = spark.createDataFrame(
        [
            ("c1", 0, dt.datetime(2025, 1, 1), 1, "U", ("grep",)),
            ("c2", 0, dt.datetime(2025, 1, 1), 2, "U", ("read",)),
        ],
        "conv_id string, turn_idx int, ts timestamp, lsn long, "
        "op string, tool_info struct<name:string>",
    )
    late = spark.createDataFrame(
        [
            ("c2", 0, dt.datetime(2025, 1, 2), 3, "U", ("bash", 4)),
            ("c3", 0, dt.datetime(2025, 1, 2), 4, "U", ("edit", 1)),
        ],
        "conv_id string, turn_idx int, ts timestamp, lsn long, "
        "op string, tool_info struct<name:string, calls:int>",
    )

    def _env(df):
        return df.select(
            "lsn",
            "op",
            "conv_id",
            "turn_idx",
            "ts",
            F.to_json(F.struct("tool_info")).alias("payload"),
        )

    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    write_event_files(_env(early), binlog, n_files=1)
    # second file sorts after the first -> applied in a later microbatch
    _env(late).coalesce(1).write.mode("append").parquet(binlog)

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        "conv_id string, turn_idx int, tool_info struct<name:string>, "
        "ts timestamp",
        num_buckets=4,
    )
    d = StreamDriver(
        spark,
        t,
        binlog,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        coerce_spec={"tool_info": "struct<name:string, calls:int>"},
    )
    d.run_available_now(timeout_s=300)
    tool_t = t.current().schema()["tool_info"].dataType
    assert [f.name for f in tool_t.fields] == ["name", "calls"]
    got = {
        r.conv_id: (r.tool_info.name, r.tool_info.calls)
        for r in t.read().collect()
    }
    assert got == {
        "c1": ("grep", None),
        "c2": ("bash", 4),
        "c3": ("edit", 1),
    }


def test_coerce_spec_from_toml_config(spark, tmp_path):
    from etl_rs_spark.cdc.stream import StreamDriver
    from etl_rs_spark.config import EngineConfig

    cfg = EngineConfig.from_toml(
        """
        [cdc]
        num_buckets = 4

        [cdc.coerce_spec]
        tool_info = "struct<name:string, calls:int>"
        meta_active = "boolean"
        """
    )
    assert cfg.cdc.coerce_spec == {
        "tool_info": "struct<name:string, calls:int>",
        "meta_active": "boolean",
    }
    t = LakeTable.create(
        spark, str(tmp_path / "t"), DDL, num_buckets=4
    )
    d = StreamDriver(
        spark,
        t,
        str(tmp_path / "binlog"),
        str(tmp_path / "ckpt"),
        engine=cfg,
    )
    assert d.coerce_spec == cfg.cdc.coerce_spec


def test_map_payload_column_lww_resolves(spark, tmp_path):
    """A top-level map payload (a [cdc.coerce_spec] map<...> target)
    rides the LWW aggregation as sorted entries — maps themselves are
    not orderable in Spark — and converts back losslessly."""
    ddl = (
        "conv_id string, turn_idx int, attrs map<string,string>, "
        "ts timestamp"
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl, num_buckets=2)
    b1 = spark.createDataFrame(
        [
            ("c1", 0, {"k": "old", "z": "1"}, dt.datetime(2025, 1, 1), 1, "U"),
            ("c2", 0, None, dt.datetime(2025, 1, 1), 2, "U"),
        ],
        "conv_id string, turn_idx int, attrs map<string,string>, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(b1, run_id="r", batch_id=0)
    b2 = spark.createDataFrame(
        [("c1", 0, {"k": "new"}, dt.datetime(2025, 1, 2), 3, "U")],
        "conv_id string, turn_idx int, attrs map<string,string>, "
        "ts timestamp, lsn long, op string",
    )
    t.merge(b2, run_id="r", batch_id=1)
    got = {r.conv_id: r.attrs for r in t.read().collect()}
    assert got == {"c1": {"k": "new"}, "c2": None}
    # merge-on-read: resolution at read time takes the same detour
    t2 = LakeTable.create(
        spark,
        str(tmp_path / "t2"),
        ddl,
        num_buckets=2,
        props={"write.merge.mode": "merge-on-read"},
    )
    t2.merge(b1, run_id="r", batch_id=0)
    t2.merge(b2, run_id="r", batch_id=1)
    got2 = {r.conv_id: r.attrs for r in t2.read().collect()}
    assert got2 == got


def test_map_nested_in_struct_raises_precisely(spark, tmp_path):
    from etl_rs_spark.errors import LoadError

    ddl = (
        "conv_id string, turn_idx int, "
        "tool struct<args:map<string,string>>, ts timestamp"
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl, num_buckets=2)
    b = spark.createDataFrame(
        [("c1", 0, ({"a": "1"},), dt.datetime(2025, 1, 1), 1, "U")],
        "conv_id string, turn_idx int, "
        "tool struct<args:map<string,string>>, ts timestamp, "
        "lsn long, op string",
    )
    import pytest

    with pytest.raises(LoadError, match="cannot order"):
        t.merge(b, run_id="r", batch_id=0)


def test_nested_payload_map_through_stream(spark, tmp_path):
    """[cdc.coerce_spec] map<...> end-to-end: binlog JSON object ->
    typed MapType column -> merge -> read."""
    import os

    from etl_rs_spark.cdc.stream import StreamDriver
    from etl_rs_spark.generator import write_event_files

    ev = spark.createDataFrame(
        [
            ("c1", 0, dt.datetime(2025, 1, 1), 1, "U", {"lang": "en"}),
            ("c1", 0, dt.datetime(2025, 1, 2), 2, "U", {"lang": "pt", "x": "1"}),
        ],
        "conv_id string, turn_idx int, ts timestamp, lsn long, "
        "op string, attrs map<string,string>",
    )
    env = ev.select(
        "lsn", "op", "conv_id", "turn_idx", "ts",
        F.to_json(F.struct("attrs")).alias("payload"),
    )
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    write_event_files(env, binlog, n_files=1)
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        "conv_id string, turn_idx int, attrs map<string,string>, "
        "ts timestamp",
        num_buckets=2,
    )
    StreamDriver(
        spark,
        t,
        binlog,
        str(tmp_path / "ckpt"),
        coerce_spec={"attrs": "map<string,string>"},
    ).run_available_now(timeout_s=300)
    got = {r.conv_id: r.attrs for r in t.read().collect()}
    assert got == {"c1": {"lang": "pt", "x": "1"}}


def test_iceberg_twin_ddl_statements_parse(spark):
    """Every ALTER statement the twin can emit must at least PARSE in
    Spark SQL — the jar-gated env would hit analysis, not grammar
    (regression: ADD COLUMN IF NOT EXISTS is a ParseException)."""
    from pyspark.errors import AnalysisException, ParseException

    from etl_rs_spark.sinks.iceberg import _evolution_ddl

    cur = T.StructType([T.StructField("name", T.StringType()),
                        T.StructField("n", T.IntegerType())])
    new = T.StructType([T.StructField("name", T.StringType()),
                        T.StructField("n", T.LongType()),
                        T.StructField("args", T.StringType())])
    promoted = _promote_type(cur, new)
    stmts = []
    for kind, path, typ in _evolution_ddl(cur, promoted, "tool"):
        if kind == "add":
            stmts.append(f"ALTER TABLE __twin_t ADD COLUMN {path} {typ}")
        else:
            stmts.append(f"ALTER TABLE __twin_t ALTER COLUMN {path} TYPE {typ}")
    stmts.append("ALTER TABLE __twin_t ADD COLUMN lang string")  # widen()
    assert stmts
    for sql in stmts:
        try:
            spark.sql(sql)
            raise AssertionError(f"expected table-not-found: {sql}")
        except ParseException as e:
            raise AssertionError(f"twin emits unparseable DDL: {sql}: {e}")
        except AnalysisException:
            pass  # parsed fine; failed analysis only because no table
