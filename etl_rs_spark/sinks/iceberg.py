"""Iceberg-backed merge sink — the production target of the LakeTable
interface (sinks/lake.py implements the same semantics without the jar).

This sandbox has no network and no iceberg-spark-runtime jar, so this
module is import-gated: ``iceberg_available(spark)`` reports whether the
Iceberg SQL extensions are live, and IcebergTable raises a clear error
otherwise. On a real cluster, enable with:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<path>

The MERGE here is the statement the reference's DeltaLoader stub was
meant to issue (/root/reference/src/load/delta.rs:255-267 logs a warning
and appends instead); with LWW guards it is idempotent under replay,
matching LakeTable.merge semantics exactly.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_rs_spark.errors import LoadError


def _evolution_ddl(cur, promoted, path: str):
    """Yield the field-path DDL steps taking type ``cur`` to its
    promoted form: ("add", "tool.calls", "int") for nested adds and
    ("promote", "tool.n", "bigint") for nested scalar promotions —
    Iceberg's ADD COLUMN / ALTER COLUMN path syntax (array elements
    address as ``col.element``, map values as ``col.value``)."""
    from pyspark.sql import types as T

    if isinstance(cur, T.StructType) and isinstance(promoted, T.StructType):
        have = {f.name: f for f in cur.fields}
        for f in promoted.fields:
            cf = have.get(f.name)
            if cf is None:
                yield "add", f"{path}.{f.name}", f.dataType.simpleString()
            elif cf.dataType != f.dataType:
                yield from _evolution_ddl(
                    cf.dataType, f.dataType, f"{path}.{f.name}"
                )
    elif isinstance(cur, T.ArrayType) and isinstance(promoted, T.ArrayType):
        yield from _evolution_ddl(
            cur.elementType, promoted.elementType, f"{path}.element"
        )
    elif isinstance(cur, T.MapType) and isinstance(promoted, T.MapType):
        yield from _evolution_ddl(
            cur.valueType, promoted.valueType, f"{path}.value"
        )
    else:
        yield "promote", path, promoted.simpleString()


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        return True
    except Exception:
        return False


class IcebergTable:
    """Same interface as LakeTable (create/read/merge), issuing Iceberg
    SQL. Single source of truth for the MERGE statement shape."""

    def __init__(self, spark: SparkSession, table: str):
        if not iceberg_available(spark):
            raise LoadError(
                "iceberg-spark-runtime not on the classpath; use "
                "sinks.lake.LakeTable (identical semantics) or submit with "
                "the Iceberg package/extensions — see module docstring"
            )
        self.spark = spark
        self.table = table

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        table: str,
        schema_ddl: str,
        bucket_col: str = "conv_id",
        num_buckets: int = 16,
    ) -> "IcebergTable":
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}, _lsn BIGINT, "
            f"_deleted BOOLEAN) USING iceberg "
            f"PARTITIONED BY (bucket({num_buckets}, {bucket_col}))"
        )
        return cls(spark, table)

    def read(self, version: int | None = None) -> DataFrame:
        df = (
            self.spark.read.option("snapshot-id", version).table(self.table)
            if version is not None
            else self.spark.read.table(self.table)
        )
        return df.where("NOT coalesce(_deleted, false)").drop("_lsn", "_deleted")

    def widen(self, new_cols: dict[str, str]) -> None:
        """Additive schema evolution before MERGE. Plain ADD COLUMN:
        Spark's ALTER TABLE grammar has no IF NOT EXISTS for columns
        (verified: ParseException on 4.1.2); callers pass only names
        absent from the live schema."""
        for name, typ in new_cols.items():
            self.spark.sql(
                f"ALTER TABLE {self.table} ADD COLUMN {name} {typ}"
            )

    def rename_column(self, old: str, new: str) -> None:
        """Metadata-only rename (field-id based in Iceberg, exactly the
        LakeTable.rename_column semantics)."""
        self.spark.sql(
            f"ALTER TABLE {self.table} RENAME COLUMN {old} TO {new}"
        )

    def drop_column(self, name: str) -> None:
        """Lazy drop; a later re-add gets a fresh field id in Iceberg,
        so old data never resurrects (LakeTable.drop_column twin)."""
        self.spark.sql(f"ALTER TABLE {self.table} DROP COLUMN {name}")

    def add_column(self, name: str, typ: str) -> None:
        self.spark.sql(
            f"ALTER TABLE {self.table} ADD COLUMN {name} {typ}"
        )

    def set_num_buckets(
        self, new_n: int, bucket_col: str = "conv_id", old_n: int | None = None
    ) -> None:
        """Partition spec evolution (LakeTable.set_num_buckets twin):
        metadata-only; old files keep the old spec and migrate via
        rewrite_data_files/compaction."""
        if old_n is not None:
            self.spark.sql(
                f"ALTER TABLE {self.table} REPLACE PARTITION FIELD "
                f"bucket({old_n}, {bucket_col}) "
                f"WITH bucket({new_n}, {bucket_col})"
            )
        else:
            self.spark.sql(
                f"ALTER TABLE {self.table} ADD PARTITION FIELD "
                f"bucket({new_n}, {bucket_col})"
            )

    def rollback(self, snapshot_id: int) -> None:
        """LakeTable.rollback twin: Iceberg's rollback_to_snapshot
        procedure — metadata-only restore, undone snapshots stay
        time-travelable until expire_snapshots."""
        self.spark.sql(
            f"CALL {self.table.split('.')[0]}.system.rollback_to_snapshot"
            f"('{self.table.split('.', 1)[1]}', {snapshot_id})"
        )

    def create_tag(self, name: str, snapshot_id: int | None = None) -> None:
        """LakeTable.create_tag twin: ALTER TABLE ... CREATE TAG pins a
        snapshot against expire_snapshots until dropped."""
        as_of = f" AS OF VERSION {snapshot_id}" if snapshot_id is not None else ""
        self.spark.sql(f"ALTER TABLE {self.table} CREATE TAG `{name}`{as_of}")

    def drop_tag(self, name: str) -> None:
        """LakeTable.drop_tag twin: ALTER TABLE ... DROP TAG."""
        self.spark.sql(f"ALTER TABLE {self.table} DROP TAG `{name}`")

    def create_branch(self, name: str) -> None:
        """LakeTable.create_branch twin: ALTER TABLE ... CREATE BRANCH.
        Writes target it via the `branch_<name>` table suffix or the
        spark.wap.branch session conf (Iceberg WAP)."""
        self.spark.sql(f"ALTER TABLE {self.table} CREATE BRANCH `{name}`")

    def drop_branch(self, name: str) -> None:
        """LakeTable.drop_branch twin: ALTER TABLE ... DROP BRANCH."""
        self.spark.sql(f"ALTER TABLE {self.table} DROP BRANCH `{name}`")

    def fast_forward(self, branch: str, to: str = "main") -> None:
        """LakeTable.fast_forward twin: the fast_forward procedure —
        publish a branch's audited state onto main in one metadata swap
        (rejects non-fast-forward moves exactly like LakeTable)."""
        cat, tbl = self.table.split(".", 1)
        self.spark.sql(
            f"CALL {cat}.system.fast_forward('{tbl}', '{to}', '{branch}')"
        )

    def set_properties(self, props: dict[str, str]) -> None:
        """LakeTable.set_properties twin: ALTER TABLE SET/UNSET
        TBLPROPERTIES (None value unsets)."""
        sets = {k: v for k, v in props.items() if v is not None}
        unsets = [k for k, v in props.items() if v is None]
        if sets:
            kv = ", ".join(f"'{k}'='{v}'" for k, v in sets.items())
            self.spark.sql(
                f"ALTER TABLE {self.table} SET TBLPROPERTIES ({kv})"
            )
        if unsets:
            kv = ", ".join(f"'{k}'" for k in unsets)
            self.spark.sql(
                f"ALTER TABLE {self.table} UNSET TBLPROPERTIES ({kv})"
            )

    def _next_lsn(self) -> int:
        return int(
            self.spark.sql(
                f"SELECT coalesce(max(_lsn), -1) + 1 FROM {self.table}"
            ).first()[0]
        )

    def delete_where(self, condition: str) -> None:
        """LakeTable.delete_where twin. NOT a bare ``DELETE FROM`` —
        that would erase the LWW guard and let an already-replayed
        binlog event resurrect the row; instead rows become tombstones
        at max(_lsn)+1, exactly like the LakeTable path (Iceberg's
        row-level UPDATE does the copy-on-write/MoR mechanics)."""
        hi = self._next_lsn()
        self.spark.sql(
            f"UPDATE {self.table} SET _deleted = true, _lsn = {hi} "
            f"WHERE ({condition}) AND NOT coalesce(_deleted, false)"
        )

    #: the composite key and order columns every merge here is keyed on
    #: (see merge()'s ON / LWW-guard clauses) — assignment targets
    #: update_where must reject, mirroring LakeTable.update_where
    KEY_COLS = ("conv_id", "turn_idx")
    ORDER_COLS = ("ts", "_lsn", "lsn")

    def update_where(
        self, assignments: dict[str, str], condition: str | None = None
    ) -> None:
        """LakeTable.update_where twin: assignments applied at
        max(_lsn)+1 so newer stream events still win. Key and order
        columns are not assignable — updating a key through UPDATE
        would corrupt LWW row identity (the MERGE keys on them); issue
        a delete + insert through the change stream instead. Same
        contract as LakeTable.update_where."""
        bad = set(assignments) & (set(self.KEY_COLS) | set(self.ORDER_COLS))
        if bad:
            raise LoadError(
                f"cannot UPDATE key/order columns {sorted(bad)}; delete "
                f"and re-insert through the change stream instead"
            )
        hi = self._next_lsn()
        sets = ", ".join(f"{k} = ({v})" for k, v in assignments.items())
        where = f"({condition}) AND " if condition else ""
        self.spark.sql(
            f"UPDATE {self.table} SET {sets}, _lsn = {hi} "
            f"WHERE {where}NOT coalesce(_deleted, false)"
        )

    def inspect_files(self) -> DataFrame:
        """LakeTable.inspect_files twin: Iceberg's files metadata table."""
        return self.spark.sql(f"SELECT * FROM {self.table}.files")

    def inspect_snapshots(self) -> DataFrame:
        """LakeTable.inspect_snapshots twin: the snapshots metadata table."""
        return self.spark.sql(f"SELECT * FROM {self.table}.snapshots")

    def inspect_refs(self) -> DataFrame:
        """LakeTable.inspect_refs twin: the refs metadata table."""
        return self.spark.sql(f"SELECT * FROM {self.table}.refs")

    def inspect_manifests(self) -> DataFrame:
        """LakeTable.inspect_manifests twin: the manifests metadata table."""
        return self.spark.sql(f"SELECT * FROM {self.table}.manifests")

    def inspect_partitions(self) -> DataFrame:
        """LakeTable.inspect_partitions twin: the partitions metadata table."""
        return self.spark.sql(f"SELECT * FROM {self.table}.partitions")

    def promote(self, winners: DataFrame) -> dict[str, str]:
        """Iceberg-legal in-place type promotion before MERGE (same
        lattice as LakeTable: int->long, float->double, decimal
        precision growth — exactly the ALTER COLUMN TYPE changes the
        Iceberg spec permits). Nested widenings (a struct field added
        or promoted at any depth, LakeTable._promote_type's recursive
        lattice) are emitted as the field-path DDL Iceberg actually
        accepts — ``ADD COLUMN parent.child TYPE`` / ``ALTER COLUMN
        parent.child TYPE T`` — never a wholesale struct type change,
        which Iceberg SQL rejects. Returns {column_path: widened_type}."""
        from etl_rs_spark.sinks.lake import _promote_type

        existing = {
            f.name: f.dataType
            for f in self.spark.read.table(self.table).schema.fields
        }
        out: dict[str, str] = {}
        for f in winners.schema.fields:
            cur = existing.get(f.name)
            if cur is None:
                continue
            p = _promote_type(cur, f.dataType)
            if p is None:
                continue
            for kind, path, typ in _evolution_ddl(cur, p, f.name):
                if kind == "add":
                    # plain ADD COLUMN: IF NOT EXISTS is a
                    # ParseException in Spark's column grammar, and
                    # _evolution_ddl only emits paths absent from cur
                    self.spark.sql(
                        f"ALTER TABLE {self.table} "
                        f"ADD COLUMN {path} {typ}"
                    )
                else:
                    self.spark.sql(
                        f"ALTER TABLE {self.table} "
                        f"ALTER COLUMN {path} TYPE {typ}"
                    )
                out[path] = typ
        return out

    def merge(
        self,
        winners: DataFrame,
        run_id: str | None = None,
        batch_id: int | None = None,
    ) -> dict[str, Any]:
        """LWW MERGE keyed on (conv_id, turn_idx) with the (ts, _lsn)
        guard that makes replay idempotent; deletes become tombstones so
        late older events cannot resurrect (same rationale as
        LakeTable.merge)."""
        existing = {f.name for f in self.spark.read.table(self.table).schema.fields}
        incoming = {
            f.name: f.dataType.simpleString()
            for f in winners.schema.fields
            if f.name not in ("op", "lsn")
        }
        self.widen({k: v for k, v in incoming.items() if k not in existing})
        promoted = self.promote(winners)

        # after a nested widening the table struct is wider than the
        # source's — MERGE's UPDATE SET t.col = s.col needs the source
        # rebuilt to the table shape (missing nested fields as typed
        # NULLs), exactly LakeTable's norm-side alignment
        from pyspark.sql import functions as F

        from etl_rs_spark.sinks.lake import _align_cast, _needs_structural_align

        tbl_types = {
            f.name: f.dataType
            for f in self.spark.read.table(self.table).schema.fields
        }
        for f in winners.schema.fields:
            dst = tbl_types.get(f.name)
            if dst is not None and _needs_structural_align(f.dataType, dst):
                winners = winners.withColumn(
                    f.name, _align_cast(F.col(f.name), f.dataType, dst)
                )

        cols = [c for c in winners.columns if c not in ("op", "lsn")]
        winners.createOrReplaceTempView("__cdc_src")
        set_cols = ", ".join(f"t.{c} = s.{c}" for c in cols)
        ins_cols = ", ".join(cols + ["_lsn", "_deleted"])
        ins_vals = ", ".join([f"s.{c}" for c in cols] + ["s.lsn", "s.op = 'D'"])
        self.spark.sql(
            f"""
            MERGE INTO {self.table} t
            USING __cdc_src s
            ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED AND (s.ts, s.lsn) > (t.ts, t._lsn) AND s.op = 'D'
              THEN UPDATE SET t._deleted = true, t._lsn = s.lsn, t.ts = s.ts
            WHEN MATCHED AND (s.ts, s.lsn) > (t.ts, t._lsn)
              THEN UPDATE SET {set_cols}, t._lsn = s.lsn, t._deleted = false
            WHEN NOT MATCHED
              THEN INSERT ({ins_cols}) VALUES ({ins_vals})
            """
        )
        return {
            "table": self.table,
            "batch_id": batch_id,
            "run_id": run_id,
            "schema_promoted": promoted,
        }
