"""LakeTable — a minimal Iceberg-style table format with copy-on-write
and merge-on-read merge modes.

The north rule targets Iceberg ``MERGE INTO``; this sandbox has no
network and no iceberg-spark-runtime jar, so the engine ships its own
small table format with the same *semantics* Iceberg provides, behind an
interface an Iceberg-backed implementation can replace verbatim
(see ``sinks/iceberg.py`` for the jar-gated SQL implementation):

- **snapshot isolation + atomic commits**: every commit writes an
  immutable ``meta/version-N.json`` manifest (schema + data-file list)
  and atomically swings ``meta/HEAD`` via os.replace. A crash mid-commit
  leaves HEAD on the old snapshot; orphaned data files are inert.
- **two merge modes** (table property ``write.merge.mode``):
  ``copy-on-write`` (default) rewrites touched buckets' state each
  merge; ``merge-on-read`` appends batch winners as per-bucket delta
  files (write cost O(batch)) with per-key LWW resolution at
  read/compaction time and an inline per-bucket fold once a delta
  chain reaches ``write.delta.max-files`` — Iceberg v2's
  copy-on-write vs merge-on-read write modes, with RewriteDataFiles
  played by ``compact()``.
- **hidden-partition bucketing**: data files are owned by
  ``bucket(num_buckets, conv_id)`` (xxhash64-based, deterministic), so a
  MERGE rewrites only the buckets its source touches — copy-on-write
  scoped by partition pruning, which is exactly Iceberg's
  ``PARTITIONED BY (bucket(N, conv_id))`` MERGE behavior.
- **LWW merge keyed on event LSN**: rows carry a hidden ``_lsn`` column;
  an incoming row replaces the stored row only if its (ts, lsn) is
  greater. Re-applying any batch, in any order, converges to the same
  state — the idempotence that makes checkpoint replay exactly-once.
- **additive schema evolution**: new source columns widen the table
  schema in place, and Iceberg-legal type promotions (int->long,
  float->double, decimal precision growth) widen an existing column's
  type in place; old files are read with the widened schema and
  null-backfill (Spark's parquet reader fills missing columns).
- **time travel**: ``read(version=...)`` — the reference's
  DeltaExtractor honors with_version the same way
  (/root/reference/src/extract/delta.rs:103-109).
- **exactly-once bookkeeping**: each snapshot records, per streaming
  run, the highest applied microbatch id; a replayed (run_id, batch_id)
  the table has already committed is skipped outright.

The reference's DeltaLoader advertises exactly this surface —
Append | Overwrite | Merge{merge_keys} modes
(/root/reference/src/load/delta.rs:27-37) — but its write_merge is a
stub that appends (/root/reference/src/load/delta.rs:255-267) and its
partition/schema-evolution knobs are stored and never applied
(/root/reference/src/load/delta.rs:62-69). This class is that surface,
implemented for real.

Concurrency model: single writer (the streaming sink), many readers —
same as one Structured Streaming query owning an Iceberg table.
"""

from __future__ import annotations

import fcntl
import glob
import json
import os
import time
import uuid
from collections.abc import Sequence
import dataclasses
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rs_spark.errors import LoadError

LSN_COL = "_lsn"
DELETED_COL = "_deleted"
#: hidden sub-LSN tie-break tier: full LWW order is (ts, _lsn, _sub).
#: Stream-merge rows persist _sub=1; out-of-band row DML
#: (delete_where/update_where, stamped at lsn = watermark+1 — an LSN
#: the SOURCE may still legitimately produce) persists _sub=0. So a
#: genuine binlog event that later arrives carrying that exact
#: (ts, lsn) beats the stored DML row instead of being silently
#: dropped as idempotent replay, while true replays (stored stream row
#: vs the same stream event, both _sub=1) still tie and no-op. Legacy
#: files without the column read as NULL and are coalesced to 0 —
#: retroactively the same "loses ties to the stream" rule.
SUB_COL = "_sub"
_BUCKET = "__b"
_OP = "op"


def _stat_micros(v: Any) -> int | None:
    """Normalize a parquet footer min/max value for the event-time
    column to an integer: epoch MICROSECONDS for timestamps (pyarrow
    hands back tz-aware datetimes for TIMESTAMP_MICROS columns), the
    raw integer for integer order columns, None for anything the
    manifest can't compare (such columns simply never prune)."""
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        return (v - epoch) // datetime.timedelta(microseconds=1)
    if isinstance(v, int):
        return v
    return None


def _sort_order(snap: "Snapshot") -> list[str]:
    """The write sort order from the snapshot's ``write.sort-order``
    property: ``keys`` (default — sort each written bucket by the
    table's key columns, Iceberg WRITE ORDERED BY parity), ``none``
    (skip the in-task sort), or an explicit comma-separated column
    list."""
    so = str(snap.props.get("write.sort-order", "keys"))
    if so == "keys":
        return list(snap.key_cols)
    if so in ("none", ""):
        return []
    return [c.strip() for c in so.split(",") if c.strip()]


def _bound_micros(v: Any) -> int | None:
    """An event-time bound (datetime, ISO string, or raw int for
    integer order columns) as epoch microseconds, for comparison with
    the manifest's ``min_ts``/``max_ts``. None when unconvertible — the
    caller then skips the file-level prune and relies on the residual
    row filter alone (always correct, just unpruned)."""
    import datetime

    if isinstance(v, str):
        try:
            v = datetime.datetime.fromisoformat(v)
        except ValueError:
            return None
    return _stat_micros(v)


def _footer_stats(
    path: str,
    ts_col: str | None = None,
    key_col: str | None = None,
    with_names: bool = False,
) -> dict[str, Any]:
    """Row count, min/max ``_lsn``, and (when ``ts_col`` is given)
    min/max event time from the parquet footer — no data read. The LSN
    range feeds the manifest so incremental readers (``changes()``) can
    skip whole files below the watermark; the event-time range feeds
    ``read(ts_range=...)`` file skipping — the same role Iceberg's
    per-file column stats play in metadata pruning. Columns whose
    footer lacks statistics get None (never pruned); legacy INT96
    timestamp files carry no stats and are likewise never pruned.

    ``key_col`` (the table's bucket column) adds ``min_key``/``max_key``
    — Iceberg's per-file lower_bounds/upper_bounds for the partition
    key — which lets ``lookup()`` skip whole files inside a bucket.
    Only JSON-representable, totally-ordered stat types (str/int/float)
    are recorded; anything else stays None (never pruned). Truncated
    string stats are safe to prune on: parquet writers truncate min
    downward and max upward (or omit the stat), so the recorded range
    always covers the true range."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    acc: dict[str, list[Any]] = {LSN_COL: [None, None, False]}
    if ts_col:
        acc[ts_col] = [None, None, False]
    if key_col and key_col not in acc:
        acc[key_col] = [None, None, False]
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            col = rg.column(i)
            slot = acc.get(col.path_in_schema)
            if slot is None:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                # one stats-less row group poisons the whole file's
                # range: mark unusable (None, but "seen")
                slot[0] = slot[1] = None
                slot[2] = None
                continue
            if slot[2] is None:
                continue
            slot[0] = st.min if slot[0] is None else min(slot[0], st.min)
            slot[1] = st.max if slot[1] is None else max(slot[1], st.max)
            slot[2] = True
    lsn_mn, lsn_mx, _ = acc[LSN_COL]
    out = {"rows": md.num_rows, "min_lsn": lsn_mn, "max_lsn": lsn_mx}
    if ts_col:
        ts_mn, ts_mx, _ = acc[ts_col]
        out["min_ts"] = _stat_micros(ts_mn)
        out["max_ts"] = _stat_micros(ts_mx)
    if key_col:
        k_mn, k_mx, _ = acc[key_col]
        ok = all(
            isinstance(v, (str, int, float)) and not isinstance(v, bool)
            for v in (k_mn, k_mx)
        )
        out["min_key"] = k_mn if ok else None
        out["max_key"] = k_mx if ok else None
    if with_names:
        # top-level physical column names from the SAME footer read —
        # add_files folds its per-file validation into this pass
        out["cols"] = {f.name for f in md.schema.to_arrow_schema()}
    return out


#: hash-function count for the manifest key bloom (write + probe side)
_KB_K = 3


def _file_may_contain(
    f: dict[str, Any],
    vals: Sequence[Any],
    hashes: Sequence[Sequence[int]] | None = None,
) -> bool:
    """True when the manifest's per-file key metadata admits ANY of the
    sought bucket-key values: the value must fall inside the file's key
    bounds (``min_key``/``max_key``) AND, when the file carries a key
    bloom (``write.key-bloom.bits``), all of the value's bloom bits
    must be set. ``hashes`` are the values' raw xxhash64 probe hashes
    (position i = hash_i mod the file's recorded bits — computed
    against each file's own bits so mixed-setting file sets stay
    correct). Missing bounds/bloom/hashes and cross-type comparisons
    keep the file — pruning is only ever an optimization, never a
    correctness input."""
    mn, mx = f.get("min_key"), f.get("max_key")
    bloom, bits, kbk = f.get("key_bloom"), f.get("kb_bits"), f.get("kb_k")
    bm: bytes | None = None
    if bloom and hashes is not None and bits and (kbk or _KB_K) <= _KB_K:
        import base64

        bm = base64.b64decode(bloom)
    for i, v in enumerate(vals):
        if mn is not None and mx is not None:
            try:
                if not (mn <= v <= mx):
                    continue
            except TypeError:
                pass  # cross-type bounds: can't exclude this value
        if bm is not None:
            hit = True
            for h in hashes[i][: int(kbk or _KB_K)]:
                p = h % int(bits)
                if not (bm[p // 8] >> (p % 8)) & 1:
                    hit = False
                    break
            if not hit:
                continue
        return True
    return False


def _footer_stats_many(
    paths: list[str],
    ts_col: str | None = None,
    key_col: str | None = None,
    with_names: bool = False,
) -> dict[str, dict[str, Any]]:
    """Footer stats for many files, read concurrently — keeps the
    per-commit driver bookkeeping O(1) wall-clock in the file count
    instead of a serial per-file loop."""
    if not paths:
        return {}
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
        return dict(
            zip(
                paths,
                ex.map(
                    lambda p: _footer_stats(p, ts_col, key_col, with_names),
                    paths,
                ),
            )
        )


def _promote_type(
    cur: T.DataType, new: T.DataType
) -> T.DataType | None:
    """Iceberg-legal in-place type promotion (Iceberg spec, Schema
    Evolution): ``int -> long``, ``float -> double``, and
    ``decimal(P,S) -> decimal(P',S)`` with ``P' > P``. Returns the
    promoted type, or None when ``new`` does not widen ``cur``.

    Files written before a promotion stay readable under the widened
    schema because Spark 4's parquet readers perform the matching
    widening read (SPARK-40876); `read()`/`changes()`/the merge's
    current-state scan all pass the promoted schema explicitly, so the
    upcast happens in the scan, not in a rewrite."""
    if cur == T.IntegerType() and new == T.LongType():
        return new
    if cur == T.FloatType() and new == T.DoubleType():
        return new
    if (
        isinstance(cur, T.DecimalType)
        and isinstance(new, T.DecimalType)
        and new.scale == cur.scale
        and new.precision > cur.precision
    ):
        return new
    # -- nested additive evolution (Iceberg spec: "Add a new struct
    # field" is a legal in-place change at ANY nesting depth, including
    # inside array elements and map values). A struct widens when the
    # incoming struct carries new fields — appended after the existing
    # ones, nullable — and/or recursively promotes shared fields.
    # Shared fields with a NON-promotable mismatch keep the table type
    # (the incoming value is aligned to it at write, same rule as
    # top-level columns); incoming structs MISSING existing fields
    # never shrink the table struct (dropping a field is a separate
    # explicit DDL, exactly like top-level drop_column).
    if isinstance(cur, T.StructType) and isinstance(new, T.StructType):
        by_new = {f.name: f for f in new.fields}
        merged: list[T.StructField] = []
        widened = False
        for f in cur.fields:
            nf = by_new.get(f.name)
            p = (
                _promote_type(f.dataType, nf.dataType)
                if nf is not None
                else None
            )
            if p is not None:
                merged.append(T.StructField(f.name, p, True, f.metadata))
                widened = True
            else:
                merged.append(f)
        have = {f.name for f in cur.fields}
        for f in new.fields:
            if f.name not in have:
                merged.append(T.StructField(f.name, f.dataType, True))
                widened = True
        return T.StructType(merged) if widened else None
    if isinstance(cur, T.ArrayType) and isinstance(new, T.ArrayType):
        p = _promote_type(cur.elementType, new.elementType)
        if p is not None:
            return T.ArrayType(p, cur.containsNull or new.containsNull)
        return None
    if (
        isinstance(cur, T.MapType)
        and isinstance(new, T.MapType)
        and cur.keyType == new.keyType
    ):
        p = _promote_type(cur.valueType, new.valueType)
        if p is not None:
            return T.MapType(
                cur.keyType, p, cur.valueContainsNull or new.valueContainsNull
            )
        return None
    return None


def _align_cast(col: F.Column, src: T.DataType, dst: T.DataType) -> F.Column:
    """Cast ``col`` (of type ``src``) to ``dst``, tolerating ADDED
    nested struct fields. Spark's plain ``cast`` rejects struct casts
    whose field counts differ, so after a nested widening the incoming
    (narrower) struct is rebuilt field-by-field: shared fields recurse,
    fields the source lacks become typed NULLs, and a NULL source
    struct stays NULL (never a struct of NULLs — LWW payload equality
    and CDF diffs depend on that). Arrays/maps recurse through
    ``transform``/``transform_values`` only when their element/value
    needs structural alignment; everything else is a plain cast, which
    keeps the pre-existing top-level semantics byte-for-byte."""
    if src == dst:
        return col
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        by_src = {f.name: f for f in src.fields}
        parts = []
        for f in dst.fields:
            sf = by_src.get(f.name)
            if sf is None:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                parts.append(
                    _align_cast(col.getField(f.name), sf.dataType, f.dataType)
                    .alias(f.name)
                )
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(
            F.struct(*parts)
        )
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        if _needs_structural_align(src.elementType, dst.elementType):
            return F.transform(
                col, lambda x: _align_cast(x, src.elementType, dst.elementType)
            )
        return col.cast(dst)
    if isinstance(src, T.MapType) and isinstance(dst, T.MapType):
        if _needs_structural_align(src.valueType, dst.valueType):
            return F.transform_values(
                col, lambda _, v: _align_cast(v, src.valueType, dst.valueType)
            )
        return col.cast(dst)
    return col.cast(dst)


def _read_compatible(file_t: T.DataType, tbl_t: T.DataType) -> bool:
    """Can a parquet column of type ``file_t`` be served under table
    type ``tbl_t`` without rewriting the file? True for equal types,
    Iceberg-promotable scalars (the widening parquet read upcasts), and
    structs whose fields are a name-wise subset with compatible types
    (missing nested fields null-fill; the reader resolves by name, so
    field order is irrelevant). Used by add_files validation."""
    if file_t == tbl_t:
        return True
    # naive (NTZ) parquet timestamps — the norm for externally-written
    # corpora — read under the table's TIMESTAMP: the engine pins the
    # session timezone to UTC (session.py), where the two annotations
    # denote the same instant
    if isinstance(file_t, T.TimestampNTZType) and isinstance(
        tbl_t, T.TimestampType
    ):
        return True
    if isinstance(file_t, T.StructType) and isinstance(tbl_t, T.StructType):
        by_tbl = {f.name: f for f in tbl_t.fields}
        return all(
            f.name in by_tbl
            and _read_compatible(f.dataType, by_tbl[f.name].dataType)
            for f in file_t.fields
        )
    if isinstance(file_t, T.ArrayType) and isinstance(tbl_t, T.ArrayType):
        return _read_compatible(file_t.elementType, tbl_t.elementType)
    if (
        isinstance(file_t, T.MapType)
        and isinstance(tbl_t, T.MapType)
        and file_t.keyType == tbl_t.keyType
    ):
        return _read_compatible(file_t.valueType, tbl_t.valueType)
    return _promote_type(file_t, tbl_t) == tbl_t


def _needs_structural_align(src: T.DataType, dst: T.DataType) -> bool:
    """True when a plain ``cast`` cannot take ``src`` to ``dst``
    (struct field sets differ, or a nested element does)."""
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        if {f.name for f in src.fields} != {f.name for f in dst.fields}:
            return True
        by_src = {f.name: f for f in src.fields}
        return any(
            _needs_structural_align(by_src[f.name].dataType, f.dataType)
            for f in dst.fields
        )
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return _needs_structural_align(src.elementType, dst.elementType)
    if isinstance(src, T.MapType) and isinstance(dst, T.MapType):
        return _needs_structural_align(src.valueType, dst.valueType)
    return False


def _with_meta_cols(schema: T.StructType) -> T.StructType:
    """User schema + hidden (_lsn, _deleted, _sub) — fresh object, no
    mutation. Files written before the _sub tier read it as NULL."""
    return T.StructType(
        list(schema.fields)
        + [
            T.StructField(LSN_COL, T.LongType()),
            T.StructField(DELETED_COL, T.BooleanType()),
            T.StructField(SUB_COL, T.IntegerType()),
        ]
    )


def _group_key(f: dict[str, Any], snap: "Snapshot") -> str:
    """Manifest group a file entry belongs to: its write-time
    (spec, bucket). Both fields are immutable per entry, so a file's
    group never changes across commits — which is what lets _commit
    reuse untouched groups' manifest files verbatim."""
    return (
        f"s{int(f.get('spec_n', snap.num_buckets))}"
        f"-b{int(f.get('bucket', -1))}"
    )


def _load_manifest(meta_dir: str, relpath: str) -> list[dict[str, Any]]:
    """Load one manifest file's entries, stamping each with its source
    manifest (``_mf``) and that manifest's entry count (``_mfn``) — the
    provenance _commit's reuse check keys on. Transient keys, never
    serialized.

    Entries also get an explicit ``spec_n`` from the manifest's own
    group (every file in a group was written under that spec — the
    group key encodes it), so hydrated entries never fall back to the
    snapshot's CURRENT spec. This is what lets set_num_buckets be a
    pure metadata commit on sharded tables: old manifests need no
    rewrite because their spec travels with them, Iceberg's
    spec-id-per-manifest semantics."""
    with open(os.path.join(meta_dir, relpath)) as fh:
        doc = json.load(fh)
    ents = doc["files"]
    grp = doc.get("group", "")
    spec = int(grp.split("-b")[0][1:]) if grp.startswith("s") else None
    for e in ents:
        if spec is not None:
            e.setdefault("spec_n", spec)
        e["_mf"] = relpath
        e["_mfn"] = len(ents)
    return ents


def _file_spec(f: dict[str, Any], snap: "Snapshot") -> int:
    """Bucket-spec (num_buckets) a data file was written under. Files
    predating spec evolution are stamped at evolution time
    (set_num_buckets); unstamped files are by construction at the
    snapshot's current spec."""
    return int(f.get("spec_n", snap.num_buckets))


def _expand_to_current(
    f: dict[str, Any], snap: "Snapshot"
) -> set[int]:
    """CURRENT-spec bucket ids whose keys may live in file f. Exact
    (not approximate) because pmod(xxhash64(k), N) nests under
    divisibility: (h mod kN) mod N == h mod N — enforced by
    set_num_buckets, which only allows specs that divide one another.
    A file at the current spec maps to itself; a coarser file covers
    every descendant id; a finer file collapses onto one ancestor."""
    s, b, cur = _file_spec(f, snap), f["bucket"], snap.num_buckets
    if s == cur:
        return {b}
    if cur % s == 0:  # file coarser than current spec: split
        return {B for B in range(cur) if B % s == b}
    return {b % cur}  # file finer than current spec: collapse


def _file_overlaps(
    f: dict[str, Any], wanted: set[int], snap: "Snapshot"
) -> bool:
    """Does file f hold any keys whose current-spec bucket is in
    ``wanted``? O(|wanted|) worst case per file (no data reads)."""
    s, b, cur = _file_spec(f, snap), f["bucket"], snap.num_buckets
    if s == cur:
        return b in wanted
    if cur % s == 0:
        return any(B % s == b for B in wanted)
    return (b % cur) in wanted


def bucket_expr(col: str, num_buckets: int) -> F.Column:
    """Deterministic bucket id — Spark's xxhash64 with its fixed seed, so
    the same key lands in the same bucket across sessions and runs."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(num_buckets)).cast("int")


def _tips(hs: "Snapshot") -> dict[str, int]:
    """Branch ref table from the HEAD snapshot. Legacy manifests (no
    branches dict) read as one main branch at HEAD. The HEAD snapshot
    is by construction its own branch's tip (_commit always writes
    ``branches[branch] = slot``), so that entry is normalized here —
    which also makes reads robust to a manually-forged manifest whose
    carried dict is stale."""
    tips = dict(hs.branches) if hs.branches else {"main": hs.version}
    tips[hs.branch] = hs.version
    return tips


def _orderable(dt: T.DataType) -> bool:
    """Can Spark order values of this type (max/sort/struct-compare)?
    Everything except MapType at any depth."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def _lww_resolve(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    types: dict[str, T.DataType],
) -> DataFrame:
    """One row per key: the LWW winner over rows carrying the hidden
    (_lsn, _deleted) columns — shared by the copy-on-write merge fold
    and by read-side resolution of merge-on-read delta files.

    ``max(struct((ts, _lsn) first, payload after))`` is a single
    ASSOCIATIVE aggregation, so Spark runs a partial map-side combine
    before the shuffle — a hot key's duplicates collapse to at most one
    row per upstream partition before any data moves. Winning
    tombstones keep their (ts, _lsn) — a late, older event for a
    deleted key must still lose — but their user payload is nulled,
    the same representation the copy-on-write path persists."""
    payload = [c for c in df.columns if c not in key_cols]
    # order tiers: (ts, _lsn, _sub) — see SUB_COL. Legacy NULL _sub
    # coalesces to 0 so ties resolve deterministically (stream rows,
    # _sub=1, beat stored row-DML rows, _sub=0, at equal (ts, lsn)).
    # NULL _lsn (files registered by add_files carry no engine columns;
    # the scan null-fills them) coalesces to -1 — append()'s "predates
    # every stream event" convention — so imported rows lose LWW to any
    # genuine binlog event for the same key at the same ts
    order_exprs = [
        F.col(ts_col),
        F.coalesce(F.col(LSN_COL), F.lit(-1).cast("long")).alias(LSN_COL),
    ]
    if SUB_COL in df.columns:
        order_exprs.append(
            F.coalesce(F.col(SUB_COL), F.lit(0)).alias(SUB_COL)
        )
    rest = [
        c for c in payload if c not in (ts_col, LSN_COL, SUB_COL)
    ]
    # max(struct) needs every ridden column ORDERABLE; MapType is not.
    # A map payload column (e.g. a [cdc.coerce_spec] map<...> target)
    # rides as sorted entries (array<struct> IS orderable, and sorting
    # by key keeps the tie-break deterministic) and converts back after
    # the winner is extracted. Unorderable shapes at deeper nesting
    # (a map inside a struct) have no such lossless detour — raise
    # precisely rather than let Spark's INVALID_ORDERING_TYPE kill the
    # microbatch with an opaque plan error.
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    map_cols = {c for c in rest if isinstance(dtypes[c], T.MapType)}
    for c in map_cols:
        # the sorted-entries detour itself needs an ORDERABLE entry
        # shape: a map whose key or value type is (or contains) another
        # map would still reach array_sort with an unorderable struct
        # and die on Spark's opaque INVALID_ORDERING_TYPE — raise the
        # same precise LoadError instead (ADVICE r05)
        mt = dtypes[c]
        if not (_orderable(mt.keyType) and _orderable(mt.valueType)):
            raise LoadError(
                f"payload map column {c!r} has type "
                f"{mt.simpleString()}, whose entries Spark cannot "
                f"order inside the LWW aggregation (a map nested in "
                f"the key or value type); restructure the nested map "
                f"as array<struct>"
            )
    for c in rest:
        if c not in map_cols and not _orderable(dtypes[c]):
            raise LoadError(
                f"payload column {c!r} has type "
                f"{dtypes[c].simpleString()}, which Spark cannot order "
                f"inside the LWW aggregation (maps nested below the "
                f"top level); restructure the payload as "
                f"array<struct> or a top-level map column"
            )

    def _ride(c: str) -> F.Column:
        if c in map_cols:
            return F.array_sort(F.map_entries(F.col(c))).alias(c)
        return F.col(c)

    merged = df.groupBy(*key_cols).agg(
        F.max(
            F.struct(*order_exprs, *[_ride(c) for c in rest])
        ).alias("__w")
    )

    def _unride(c: str) -> F.Column:
        if c in map_cols:
            return F.map_from_entries(F.col(f"__w.{c}")).alias(c)
        return F.col(f"__w.{c}").alias(c)

    final = merged.select(
        *key_cols,
        *[
            _unride(c)
            for c in payload
            if c != SUB_COL or SUB_COL in df.columns
        ],
    )
    for c in payload:
        if c in (ts_col, LSN_COL, DELETED_COL, SUB_COL):
            continue
        final = final.withColumn(
            c,
            F.when(F.col(DELETED_COL), F.lit(None).cast(types[c])).otherwise(
                F.col(c)
            ),
        )
    return final


@dataclass
class Snapshot:
    version: int
    schema_json: str  # user-visible schema (StructType.json())
    key_cols: list[str]
    order_cols: list[str]
    bucket_col: str
    num_buckets: int
    #: {path, bucket, rows, min_lsn, max_lsn[, kind]} — the LSN range is
    #: the per-file stat that lets changes() prune below-watermark
    #: files; kind is "delta" for merge-on-read delta files (absent =
    #: base file holding resolved one-row-per-key state).
    #:
    #: PERSISTENCE IS SHARDED (Iceberg's manifest-list layout): the
    #: snapshot JSON does NOT carry this list — it carries
    #: ``manifest_list`` below, and the entries live in per-
    #: (spec, bucket) manifest files under meta/manifests/. A commit
    #: rewrites only the manifests of TOUCHED groups and reuses the
    #: parent's pointers for the rest, so commit metadata bytes are
    #: O(touched buckets), not O(table files) — per-file key blooms
    #: ride in the bucket manifest they describe. In memory the full
    #: list hydrates lazily on first ``.files`` access (see
    #: ``__getattr__``); legacy manifests with an inline ``files``
    #: array keep reading unchanged.
    files: list[dict[str, Any]] = field(default_factory=list)
    #: [{path, group, n_files, rows, min_lsn, max_lsn, spec_n, bucket}]
    #: — one entry per live manifest file (relative to meta/). The
    #: summary stats let readers prune whole manifests (bucket/LSN)
    #: before loading any per-file entry.
    manifest_list: list = field(default_factory=list)
    applied: dict[str, int] = field(default_factory=dict)  # run_id -> max batch
    watermark_lsn: int = -1
    props: dict[str, Any] = field(default_factory=dict)
    #: wall-clock commit time (epoch ms), stamped by _commit — enables
    #: as-of-timestamp time travel (the reference's DeltaExtractor stores
    #: with_timestamp but never resolves it,
    #: /root/reference/src/extract/delta.rs:104-109; here it resolves).
    committed_at_ms: int = -1
    #: [[version, watermark_lsn]] at every commit that ADVANCED the
    #: watermark (seeded [[0, -1]] at create). changes(with_version=
    #: True) attributes rows from the to-snapshot's history alone:
    #: O(1) driver metadata reads for any window, robust to
    #: expire_snapshots removing intermediate version files. Empty =
    #: legacy manifest (fall back to walking surviving version files).
    #:
    #: SEGMENTED: only the recent TAIL rides in the snapshot; once the
    #: tail exceeds _WM_SEGMENT_ROWS entries, _commit rolls it into an
    #: immutable segment file under meta/manifests/ and appends its
    #: path to ``wm_segments`` — so per-snapshot metadata stays O(1)
    #: amortized over the table's life instead of O(commits). Readers
    #: needing the full line use LakeTable._full_wm_history().
    wm_history: list = field(default_factory=list)
    #: ordered immutable segment files (relative to meta/), each
    #: holding an older chunk of the watermark history line.
    wm_segments: list = field(default_factory=list)
    #: Iceberg-style stable column identity (spec: Schema Evolution):
    #: current column name -> field id. A column's id never changes
    #: across renames; a dropped-then-readded name gets a FRESH id, so
    #: old files' data for the retired id can never resurrect.
    field_ids: dict = field(default_factory=dict)
    next_field_id: int = 0
    #: write epoch: bumped by every rename/drop. Data files record the
    #: epoch they were written under; ``epoch_names`` maps, per epoch,
    #: field id -> the PHYSICAL parquet column name files of that epoch
    #: carry (keys are strings — JSON round-trip). Reads translate
    #: per-epoch physical names to current logical names by id.
    epoch: int = 0
    epoch_names: dict = field(default_factory=dict)
    #: named refs (Iceberg table refs, tag flavor): tag name -> pinned
    #: version. A tagged version and the files it references are
    #: protected from expire_snapshots until the tag is dropped —
    #: the audit pin for "the exact table state a training run read".
    refs: dict = field(default_factory=dict)
    #: Iceberg table refs, BRANCH flavor: branch name -> tip version,
    #: including "main". Maintained by _commit (the committing branch's
    #: tip becomes the new version; other tips are carried verbatim),
    #: so the HEAD snapshot's ``branches`` is the authoritative ref
    #: table. Empty = legacy manifest ({"main": HEAD} implied).
    branches: dict = field(default_factory=dict)
    #: branch name -> INCARNATION id (the version slot of the commit
    #: that created the ref — globally unique, so a dropped-then-
    #: recreated name is distinguishable from its previous life even
    #: when both incarnations fork at the same version). Maintained by
    #: _commit alongside ``branches``; fast_forward stamps it into
    #: ``ff_source`` and rejects a publish whose source-branch
    #: incarnation changed since the recorded publish. Absent on
    #: legacy manifests ({} -> epoch -1 -> the pre-epoch check applies).
    branch_epochs: dict = field(default_factory=dict)
    #: per-ref retention (Iceberg's ``max-ref-age-ms`` ref property):
    #: "branch:<name>" / "tag:<name>" -> max age in ms, measured from
    #: the commit time of the snapshot the ref points to. Maintained
    #: GLOBALLY by _commit (like ``branches``), edited through
    #: create_branch/create_tag(max_age_ms=...) and purged on ref drop.
    #: expire_snapshots drops aged refs before computing what to keep,
    #: so a forgotten audit branch stops pinning history forever.
    ref_retention: dict = field(default_factory=dict)
    #: which branch this snapshot was committed to ("main" default —
    #: also the correct reading for legacy manifests).
    branch: str = "main"
    #: version this snapshot was derived from (its ancestor pointer).
    #: -1 = legacy/create; _commit's optimistic-concurrency check is
    #: ``parent_version == tips[branch]`` — a writer whose branch tip
    #: moved underneath it conflicts, while commits landing on OTHER
    #: branches merely shift the global slot number and are rebased
    #: over transparently.
    parent_version: int = -1
    #: version of the parent-branch snapshot this branch forked from
    #: (-1 on main). Set when the first commit lands on a fresh branch;
    #: carried along the branch chain. fast_forward uses it for an O(1)
    #: is-ancestor check that needs no manifest walking (robust to
    #: expire_snapshots trimming intermediate versions).
    fork_version: int = -1
    #: [branch, tip_version] stamped ONLY on fast_forward commits (and
    #: deliberately NOT carried by child()): records that this target-
    #: branch tip IS the named branch's state at that version, which is
    #: what lets a second fast_forward from the same long-lived branch
    #: pass the ancestor check after the first one moved the target.
    ff_source: list = field(default_factory=list)
    #: table statistics written by ``analyze()`` (Iceberg Puffin-file
    #: role): {"analyzed_version": V, "row_count": N, "columns":
    #: {col: {nulls, ndv, min, max}}}. Carried forward by child() —
    #: ``analyzed_version`` tells readers how stale they are.
    stats: dict = field(default_factory=dict)
    #: what produced this snapshot (Iceberg snapshot-summary
    #: ``operation`` role): create / merge / delete / update / append /
    #: overwrite / compact / ddl / set-buckets / properties / analyze /
    #: tag / branch / fast-forward / rollback / expire-refs. Purely
    #: observational (inspect_snapshots); never inherited by child().
    #: "" on pre-field manifests.
    operation: str = ""

    def __post_init__(self) -> None:
        # legacy manifests (pre field-id) synthesize stable ids from
        # schema order — deterministic, so every reader agrees
        if not self.field_ids:
            names = [f.name for f in self.schema().fields]
            self.field_ids = {n: i + 1 for i, n in enumerate(names)}
            self.next_field_id = len(names) + 1
        if not self.epoch_names:
            self.epoch_names = {
                str(self.epoch): {
                    str(i): n for n, i in self.field_ids.items()
                }
            }

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    def to_json(self) -> str:
        d = {
            k: v for k, v in self.__dict__.items() if not k.startswith("_")
        }
        if d.get("manifest_list"):
            # sharded persistence: file entries live in the manifests
            d.pop("files", None)
        return json.dumps(d, indent=1)

    def __getattr__(self, name: str) -> Any:
        # lazy manifest hydration: LakeTable.snapshot() removes the
        # eagerly-initialized empty ``files`` and installs _files_loader;
        # the first .files access materializes (and caches) the list.
        if name == "files":
            loader = self.__dict__.get("_files_loader")
            if loader is not None:
                object.__setattr__(self, "files", loader())
                return self.__dict__["files"]
        raise AttributeError(name)

    @classmethod
    def from_json(cls, s: str) -> "Snapshot":
        # ignore unknown keys: a manifest written by a NEWER engine
        # (new metadata fields) stays readable by this one — Iceberg
        # readers skip unrecognized metadata fields the same way, and
        # it is what lets a mixed-version executor fleet roll forward
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        snap = cls(**{k: v for k, v in d.items() if k in known})
        if snap.manifest_list and not snap.__dict__.get("files"):
            # sharded snapshot: entries live in manifest files. Install
            # a fail-loud placeholder; LakeTable.snapshot() (which knows
            # meta_dir) swaps in the real loader. A bare from_json
            # consumer touching .files errors instead of silently
            # reading an empty table.
            snap.__dict__.pop("files", None)

            def _no_ctx() -> list:
                raise LoadError(
                    "sharded snapshot: file entries live in manifest "
                    "files; load via LakeTable.snapshot()"
                )

            snap.__dict__["_files_loader"] = _no_ctx
        return snap

    def child(self, **overrides: Any) -> "Snapshot":
        """Successor snapshot: version+1 with deep-copied mutable
        metadata, every field carried forward unless overridden — the
        single place child commits are built, so new snapshot fields
        can never be silently dropped by a write path."""
        base: dict[str, Any] = dict(
            version=self.version + 1,
            schema_json=self.schema_json,
            key_cols=list(self.key_cols),
            order_cols=list(self.order_cols),
            bucket_col=self.bucket_col,
            num_buckets=self.num_buckets,
            manifest_list=[],  # output field: _commit re-shards
            applied=dict(self.applied),
            watermark_lsn=self.watermark_lsn,
            props=dict(self.props),
            committed_at_ms=-1,
            wm_history=[list(x) for x in self.wm_history],
            wm_segments=list(self.wm_segments),
            field_ids=dict(self.field_ids),
            next_field_id=self.next_field_id,
            epoch=self.epoch,
            epoch_names={e: dict(m) for e, m in self.epoch_names.items()},
            refs=dict(self.refs),
            branches={},  # output field: _commit derives it from HEAD
            branch_epochs={},  # output field: _commit derives from HEAD
            ref_retention={},  # output field: _commit derives from HEAD
            branch=self.branch,
            parent_version=self.version,
            fork_version=self.fork_version,
            ff_source=[],  # per-commit stamp, never inherited
            stats={k: v for k, v in self.stats.items()},
            operation="",  # per-commit stamp, never inherited
        )
        base.update(overrides)
        # metadata-only children (no files override, parent still lazy)
        # carry the parent's manifest pointers WITHOUT hydrating — a
        # tag/props/branch commit on a million-file table reads and
        # writes zero manifest bytes.
        if (
            "files" not in base
            and "files" not in self.__dict__
            and self.__dict__.get("_files_loader") is not None
        ):
            base["manifest_list"] = [dict(m) for m in self.manifest_list]
            child = Snapshot(**base)
            child.__dict__.pop("files", None)
            child.__dict__["_files_loader"] = self.__dict__["_files_loader"]
            return child
        if "files" not in base:
            base["files"] = list(self.files)
        return Snapshot(**base)


class LakeTable:
    """Bucketed, snapshot-versioned parquet table (CoW + MoR merges)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.meta_dir = os.path.join(path, "meta")
        self.data_dir = os.path.join(path, "data")
        #: branch every read/write on THIS handle targets. All write
        #: paths go through current()/child()/_commit, so an on_branch
        #: handle gets merge/append/compact/DDL on its branch for free.
        self._branch = "main"

    def on_branch(self, name: str) -> "LakeTable":
        """Handle scoped to a branch (Iceberg branch ref): reads resolve
        the branch tip, writes commit to it — the write-audit-publish
        primitive. The branch must already exist (``create_branch``)."""
        if name != "main" and name not in self.branches():
            raise LoadError(f"no such branch {name!r}")
        t = LakeTable(self.spark, self.path)
        t._branch = name
        return t

    # ------------------------------------------------------------- DDL --
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType | str,
        key_cols: Sequence[str] = ("conv_id", "turn_idx"),
        order_cols: Sequence[str] = ("ts", "lsn"),
        bucket_col: str = "conv_id",
        num_buckets: int = 16,
        exist_ok: bool = False,
        props: dict[str, Any] | None = None,
    ) -> "LakeTable":
        """``props`` are table write properties carried in every
        snapshot: ``write.compression`` (parquet codec) and
        ``write.target-file-rows`` (split a bucket's output when its
        expected volume exceeds the target — bounded file sizes at any
        table size)."""
        t = cls(spark, path)
        if os.path.exists(os.path.join(t.meta_dir, "HEAD")):
            if exist_ok:
                return t
            raise LoadError(f"table already exists at {path}")
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        snap = Snapshot(
            version=0,
            schema_json=json.dumps(schema.jsonValue()),
            key_cols=list(key_cols),
            order_cols=list(order_cols),
            bucket_col=bucket_col,
            num_buckets=num_buckets,
            props=dict(props or {}),
            wm_history=[[0, -1]],
            operation="create",
        )
        t._commit(snap)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        t.current()  # raises if absent
        return t

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.meta_dir, "HEAD"))

    # -------------------------------------------------------- snapshots --
    def _head_snapshot(self) -> Snapshot:
        """Snapshot at the latest committed metadata version (any
        branch) — the one whose ``branches`` dict is authoritative."""
        head = os.path.join(self.meta_dir, "HEAD")
        if not os.path.exists(head):
            raise LoadError(f"no table at {self.path}")
        with open(head) as f:
            v = int(f.read().strip())
        return self.snapshot(v)

    def current(self, branch: str | None = None) -> Snapshot:
        """Tip snapshot of ``branch`` (default: this handle's branch).
        Legacy manifests (no branches dict) read as a single "main"
        branch at HEAD. A branch whose ref still points at its fork
        point (no commits yet) is returned stamped with the branch name
        and fork version, so the first child() commit lands on the
        branch with correct ancestry."""
        b = branch or self._branch
        hs = self._head_snapshot()
        tips = _tips(hs)
        if b not in tips:
            raise LoadError(f"no such branch {b!r}")
        snap = hs if tips[b] == hs.version else self.snapshot(tips[b])
        if snap.branch != b:
            # fresh branch: its ref points at the fork-point snapshot
            snap.branch = b
            snap.fork_version = snap.version
        return snap

    def branches(self) -> dict[str, int]:
        """Branch name -> tip version, including main."""
        return _tips(self._head_snapshot())

    def snapshot(self, version: int) -> Snapshot:
        with open(os.path.join(self.meta_dir, f"version-{version:08d}.json")) as f:
            snap = Snapshot.from_json(f.read())
        self._attach_files_loader(snap)
        return snap

    def _attach_files_loader(self, snap: Snapshot) -> None:
        """Install lazy hydration for a sharded snapshot: .files loads
        every manifest on first access; entries are stamped with their
        source manifest (``_mf``/``_mfn``) so the next _commit can
        reuse untouched groups' manifests verbatim."""
        if not snap.manifest_list or snap.__dict__.get("files"):
            return
        meta_dir, mlist = self.meta_dir, snap.manifest_list

        def _load() -> list[dict[str, Any]]:
            out: list[dict[str, Any]] = []
            for m in mlist:
                out.extend(_load_manifest(meta_dir, m["path"]))
            return out

        snap.__dict__.pop("files", None)
        snap.__dict__["_files_loader"] = _load

    def version_as_of(self, ts_ms: int) -> int:
        """Latest committed version ON THIS HANDLE'S BRANCH with
        committed_at_ms <= ts_ms. Commit times are monotone in the
        global version sequence (single-slot commit protocol), so a
        binary search over the version files needs O(log versions)
        metadata reads; with branching, a short downward walk then
        skips any interleaved other-branch commits (O(interleave), each
        one metadata read — no data touched).

        The bisection runs over the sorted list of version files that
        actually EXIST (not the dense [0, tip] range), so holes left by
        ``expire_snapshots`` can never crash it — the same robustness
        the downward lineage walk already has. A file expiring between
        the listing and the read is skipped the same way."""
        tip = self.current()
        versions = sorted(
            v
            for v in (
                int(p.split("version-")[1].split(".")[0])
                for p in glob.glob(
                    os.path.join(self.meta_dir, "version-*.json")
                )
            )
            if v <= tip.version
        )

        def _committed_at(idx: int) -> int:
            try:
                return self.snapshot(versions[idx]).committed_at_ms
            except FileNotFoundError:
                # expired between listing and read: treat as "too new"
                # so the search keeps moving left toward survivors
                return ts_ms + 1

        lo, hi = 0, len(versions) - 1
        if hi < 0 or _committed_at(0) > ts_ms:
            raise LoadError(
                f"no snapshot at or before ts {ts_ms} (table created later)"
            )
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if _committed_at(mid) <= ts_ms:
                lo = mid
            else:
                hi = mid - 1
        lo = versions[lo]
        b, fork = tip.branch, tip.fork_version
        v = lo
        while v >= 0:
            try:
                s = self.snapshot(v)
            except FileNotFoundError:
                v -= 1
                continue
            # lineage: committed on this branch in THIS incarnation
            # (same fork — a recreated branch name must not time-travel
            # into its previous life), or fork point / pre-fork history
            if (s.branch == b and (fork < 0 or s.fork_version == fork)) or (
                fork >= 0 and v <= fork and (v == fork or s.branch == "main")
            ):
                return v
            v -= 1
        raise LoadError(
            f"no snapshot on branch {b!r} at or before ts {ts_ms}"
        )

    #: a version file claimed (created) but never published (HEAD swung)
    #: is treated as crashed-writer residue only once this old; younger
    #: claims are presumed to belong to a live competitor mid-commit.
    STALE_CLAIM_S: float = 60.0

    #: branch_edits sentinel: "point the ref at this commit's own slot"
    _SLOT: int = -2
    #: wm_history tail entries kept inline per snapshot before rolling
    #: into an immutable segment file
    _WM_SEGMENT_ROWS: int = 256

    def _shard_manifests(self, snap: Snapshot) -> None:
        """Iceberg-style manifest sharding: group ``snap.files`` by
        (write-spec, bucket), write ONE manifest file per group that
        changed since the parent snapshot, and reuse the parent's
        manifest path for every untouched group. The snapshot JSON then
        carries only the manifest list (O(groups) summaries), so commit
        metadata bytes are O(touched buckets) — per-file key-bloom
        bitmaps live in the bucket manifest they describe, not in every
        snapshot.

        Reuse detection is provenance-based: hydration stamps each
        entry with its source manifest (``_mf``) and that manifest's
        entry count (``_mfn``). A group is byte-identical to a parent
        manifest iff every entry came from that one manifest and none
        of its entries were dropped (count match) — code that MUTATES a
        committed entry must copy it without the ``_``-keys (see
        set_num_buckets), which forces the rewrite."""
        edits = snap.__dict__.pop("_group_edits", None)
        lazy = (
            "files" not in snap.__dict__
            and snap.__dict__.get("_files_loader") is not None
        )
        if lazy and edits is None:
            # metadata-only child: parent pointers carried verbatim —
            # zero manifest bytes read or written
            snap.__dict__["_manifests_written"] = 0
            return
        written = 0
        if lazy:
            # group-edit commit (merge's path): parent manifests are
            # reused for every group not named in ``edits``; edited
            # groups get one fresh manifest each (or disappear when
            # emptied). The parent's entries are never hydrated.
            mlist = [
                dict(m)
                for m in snap.manifest_list
                if m["group"] not in edits
            ]
            for gk in sorted(edits):
                ents = edits[gk]
                if not ents:
                    continue  # group emptied: no manifest
                mlist.append(self._write_manifest(gk, ents))
                written += 1
            mlist.sort(key=lambda m: m["group"])
            snap.manifest_list = mlist
            meta_dir = self.meta_dir

            def _load() -> list[dict[str, Any]]:
                out: list[dict[str, Any]] = []
                for m in mlist:
                    out.extend(_load_manifest(meta_dir, m["path"]))
                return out

            snap.__dict__["_files_loader"] = _load
            snap.__dict__["_manifests_written"] = written
            return
        groups: dict[str, list[dict[str, Any]]] = {}
        for f in snap.files:
            groups.setdefault(_group_key(f, snap), []).append(f)
        mlist = []
        for gk in sorted(groups):
            ents = groups[gk]
            srcs = {e.get("_mf") for e in ents}
            src = next(iter(srcs)) if len(srcs) == 1 else None
            if src is not None and all(
                e.get("_mfn") == len(ents) for e in ents
            ):
                # untouched group: reuse parent manifest
                mlist.append(self._manifest_summary(gk, src, ents))
            else:
                mlist.append(self._write_manifest(gk, ents))
                written += 1
        snap.manifest_list = mlist
        snap.__dict__["_manifests_written"] = written

    def _write_manifest(
        self, gk: str, ents: list[dict[str, Any]]
    ) -> dict[str, Any]:
        """Write one group's manifest file (atomic) and return its
        manifest-list summary; restamps the in-memory entries'
        provenance so a later same-process commit can reuse it."""
        mdir = os.path.join(self.meta_dir, "manifests")
        os.makedirs(mdir, exist_ok=True)
        name = f"mf-{uuid.uuid4().hex[:16]}-{gk}.json"
        relpath = os.path.join("manifests", name)
        payload = [
            {k: v for k, v in e.items() if not k.startswith("_")}
            for e in ents
        ]
        tmp = os.path.join(mdir, f".{name}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"group": gk, "files": payload}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(mdir, name))
        for e in ents:
            e["_mf"] = relpath
            e["_mfn"] = len(ents)
        return self._manifest_summary(gk, relpath, ents)

    @staticmethod
    def _manifest_summary(
        gk: str, relpath: str, ents: list[dict[str, Any]]
    ) -> dict[str, Any]:
        lsns_lo = [e.get("min_lsn") for e in ents]
        lsns_hi = [e.get("max_lsn") for e in ents]
        return {
            "path": relpath,
            "group": gk,
            "spec_n": int(gk.split("-b")[0][1:]),
            "bucket": int(gk.split("-b")[1]),
            "n_files": len(ents),
            "rows": sum(int(e.get("rows", 0)) for e in ents),
            "deltas": sum(1 for e in ents if e.get("kind") == "delta"),
            # None = unknown -> readers must not prune on it
            "min_lsn": (
                None
                if any(x is None for x in lsns_lo)
                else min(lsns_lo, default=None)
            ),
            "max_lsn": (
                None
                if any(x is None for x in lsns_hi)
                else max(lsns_hi, default=None)
            ),
        }

    def _candidate_files(
        self,
        snap: Snapshot,
        buckets: set[int] | None = None,
        lsn_gt: int | None = None,
    ) -> list[dict[str, Any]]:
        """File entries admitted by MANIFEST-level pruning: for a
        sharded, still-lazy snapshot this loads only the manifests
        whose group can overlap ``buckets`` (exact — every file in a
        group shares its (spec, bucket) coverage) and whose known
        max_lsn exceeds ``lsn_gt``. Returns a SUPERSET of the exact
        answer; callers apply their per-file filters on top, as they
        did over snap.files. Hydrated / legacy snapshots fall back to
        the full in-memory list (same result, no extra I/O)."""
        if "files" in snap.__dict__ or not snap.manifest_list:
            return snap.files
        out: list[dict[str, Any]] = []
        for m in snap.manifest_list:
            if (
                buckets is not None
                and m["bucket"] >= 0
                and not _file_overlaps(m, buckets, snap)
            ):
                continue
            if (
                lsn_gt is not None
                and m.get("max_lsn") is not None
                and m["max_lsn"] <= lsn_gt
            ):
                continue
            out.extend(_load_manifest(self.meta_dir, m["path"]))
        return out

    def _roll_wm_segments(self, snap: Snapshot) -> None:
        """Keep per-snapshot watermark history O(1) amortized: once the
        inline tail exceeds _WM_SEGMENT_ROWS entries, roll all but the
        most recent entry into an immutable segment file and append its
        path to ``wm_segments``. Readers that need the full line
        (changes() attribution / expired-from recovery) concatenate
        segments + tail via _full_wm_history()."""
        if len(snap.wm_history) <= self._WM_SEGMENT_ROWS:
            return
        mdir = os.path.join(self.meta_dir, "manifests")
        os.makedirs(mdir, exist_ok=True)
        rolled, tail = snap.wm_history[:-1], snap.wm_history[-1:]
        name = f"wm-{uuid.uuid4().hex[:12]}.json"
        tmp = os.path.join(mdir, f".{name}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"entries": rolled}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(mdir, name))
        snap.wm_segments = list(snap.wm_segments) + [
            os.path.join("manifests", name)
        ]
        snap.wm_history = tail

    def _full_wm_history(self, snap: Snapshot) -> list:
        """Full [version, watermark] line: rolled segments + inline
        tail. O(segments) metadata reads, only paid by callers that
        genuinely need deep history."""
        out: list = []
        for seg in snap.wm_segments:
            try:
                with open(os.path.join(self.meta_dir, seg)) as fh:
                    out.extend(json.load(fh)["entries"])
            except FileNotFoundError:
                continue  # segment expired: attribution degrades gracefully
        out.extend(snap.wm_history)
        return out

    def _cap_applied(self, snap: Snapshot) -> None:
        """Bound the exactly-once (run_id -> max batch) log carried per
        snapshot (prop ``write.applied.max-runs``, default 4096). The
        log is an optimization (skip re-merging a committed batch) and
        a monotonicity guard, not the correctness backstop — a replayed
        batch whose run was evicted re-merges and every event loses or
        ties under LWW, so the table state is unchanged. Eviction is
        oldest-seen-first (dict insertion order)."""
        cap = int(snap.props.get("write.applied.max-runs", 4096))
        if len(snap.applied) <= cap:
            return
        drop = len(snap.applied) - cap
        for k in list(snap.applied)[:drop]:
            del snap.applied[k]

    def _commit(
        self, snap: Snapshot, branch_edits: dict[str, int | None] | None = None
    ) -> None:
        """Commit with an ATOMIC slot claim (optimistic concurrency):
        the snapshot takes the next GLOBAL version slot (HEAD+1 — all
        branches share one metadata sequence, exactly as every Iceberg
        commit writes the next metadata.json regardless of branch). The
        version file itself is the put-if-absent arbiter — it is
        hard-linked into place (``os.link``, fails with EEXIST if the
        slot is taken), so of two writers racing the same slot exactly
        one creates it and the loser retries or raises BEFORE touching
        HEAD (its data files stay orphaned; vacuum_orphans reclaims
        them).

        The CORRECTNESS check is per-branch: ``snap.parent_version``
        must still equal the committing branch's tip. A tip that moved
        is first given to _try_rebase (Iceberg's commit
        retry-with-validation): a data commit whose manifest-group
        footprint is disjoint from the winners' — and under whom no
        structural metadata or replay-log state moved — is spliced onto
        the new tip without redoing any data work. Only when that
        validation fails is it a real conflict (the writer's data files
        were derived from state that moved) and raises to the caller,
        whose retry re-reads and rebuilds — same contract as before. A
        commit that merely landed on a DIFFERENT branch only shifts the
        global slot number; this writer rebases onto the next slot
        transparently (bounded retry loop), because nothing it wrote
        depends on other branches' state.

        ``branch_edits`` adds/removes branch refs atomically with the
        commit (value None deletes) — used by create_branch/drop_branch.
        The committing branch's own tip always becomes this snapshot.

        Crashed-writer recovery: a version file without a HEAD swing is
        residue, but it is indistinguishable in content from a live
        competitor's claim-in-flight — so a claim is only recycled once
        it is older than ``STALE_CLAIM_S`` AND HEAD is still behind it.
        Recovery unlinks the stale claim and retries the link, so two
        concurrent recoverers still resolve to exactly one winner. The
        StreamDriver's (run_id, batch_id) idempotence log makes
        retry-after-conflict safe on the CDC path."""
        self._shard_manifests(snap)
        self._roll_wm_segments(snap)
        self._cap_applied(snap)
        head = os.path.join(self.meta_dir, "HEAD")
        last_err: LoadError | None = None
        for attempt in range(8):
            hv, tips = -1, {}
            if os.path.exists(head):
                hs = self._head_snapshot()
                hv = hs.version
                tips = _tips(hs)
                if snap.branch not in tips:
                    raise LoadError(f"no such branch {snap.branch!r}")
                if tips[snap.branch] != snap.parent_version:
                    # same-branch race: before declaring a real
                    # conflict, try the metadata-level rebase (Iceberg's
                    # commit retry-with-validation) — valid iff the
                    # intervening commits touched disjoint manifest
                    # groups and changed no structural metadata. On
                    # success nothing is recomputed or rewritten: the
                    # already-written data files and group manifests are
                    # spliced onto the new tip.
                    if not self._try_rebase(snap, tips[snap.branch]):
                        raise LoadError(
                            f"concurrent commit conflict: branch "
                            f"{snap.branch!r} is at version "
                            f"{tips[snap.branch]}, this writer derived "
                            f"from version {snap.parent_version}; "
                            f"re-read and retry"
                        )
            slot = hv + 1
            # a watermark-advance entry this writer appended for its
            # INTENDED version (parent+1, flagged by merge) follows the
            # commit to the slot it actually lands in — other branches'
            # commits shift the global sequence
            if snap.__dict__.get("_wm_pending") and snap.wm_history:
                snap.wm_history[-1][0] = slot
            snap.version = slot
            new_tips = dict(tips)
            new_epochs = dict(hs.branch_epochs) if hv >= 0 else {}
            new_rr = dict(hs.ref_retention) if hv >= 0 else {}
            for k, ms in (
                snap.__dict__.get("_ref_retention_edits") or {}
            ).items():
                if ms is None:
                    new_rr.pop(k, None)
                else:
                    new_rr[k] = int(ms)
            for k, v in (branch_edits or {}).items():
                if v is None:
                    new_tips.pop(k, None)
                    new_epochs.pop(k, None)
                    new_rr.pop(f"branch:{k}", None)
                    continue
                # ref creation: this commit's slot is the incarnation id
                new_epochs[k] = slot
                if v == self._SLOT:
                    # "the slot this very commit takes" — create_branch
                    # forks at its own creation commit so the fork point
                    # IS the committing branch's new tip (anything older
                    # would be instantly behind and never fast-forwardable)
                    new_tips[k] = slot
                else:
                    new_tips[k] = int(v)
            new_tips[snap.branch] = slot
            snap.branches = new_tips
            snap.branch_epochs = new_epochs
            snap.ref_retention = new_rr
            if snap.committed_at_ms < 0 or attempt > 0:
                snap.committed_at_ms = int(time.time() * 1000)
            vpath = os.path.join(self.meta_dir, f"version-{slot:08d}.json")
            vtmp = os.path.join(self.meta_dir, f".version.{uuid.uuid4().hex}")
            with open(vtmp, "w") as f:
                f.write(snap.to_json())
                f.flush()
                os.fsync(f.fileno())
            try:
                self._claim_slot(vtmp, vpath, slot)
            except LoadError as e:
                # slot lost to a competitor (possibly on another
                # branch, possibly an in-flight claim whose HEAD swing
                # hasn't landed yet): re-read and rebase; the
                # per-branch parent check above converts a same-branch
                # advance into the real conflict error
                last_err = e
                time.sleep(0.02 * (attempt + 1))
                continue
            finally:
                if os.path.exists(vtmp):
                    os.remove(vtmp)
            tmp = os.path.join(self.meta_dir, f".HEAD.{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write(str(slot))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(self.meta_dir, "HEAD"))  # atomic
            return
        raise last_err  # all rebase attempts lost their slot race

    def _try_rebase(self, snap: Snapshot, tip_version: int) -> bool:
        """Metadata-level commit rebase after a same-branch slot race
        (Iceberg's commit retry-with-validation): when the commits that
        won the race touched DISJOINT manifest groups and changed no
        structural metadata, this writer's already-written data files
        and group manifests are spliced onto the new tip — the merge /
        append / targeted-compact is NOT redone. That is what lets
        streaming ingest and background maintenance (compact of other
        buckets, tag/branch commits, distributed retention) commit
        concurrently on one branch without either redoing O(batch) or
        O(bucket-state) data work.

        Validation (all checked against the snapshot this commit was
        derived from; any failure returns False and the caller raises
        the real conflict, whose retry re-reads and rebuilds):
        - this commit declared pure DATA intent (``_data_commit``, set
          by merge/append/compact/overwrite): its whole effect beyond
          group manifests is watermark/applied advance and additive
          schema widening, which this splice knows how to recompose.
          Refs/DDL/spec/rollback commits do not rebase — their intent
          is not group-shaped;
        - footprints are exact and disjoint: a group's manifest pointer
          changes iff a commit touched it (provenance-based pointer
          reuse), so OUR footprint is the pointer diff snap-vs-parent,
          the winners' is parent-vs-tip, and neither the state this
          commit read nor the groups it rewrote may appear in both;
        - no structural metadata changed under us: schema, bucket spec,
          key/order columns, rename epoch, field ids and table props
          are byte-equal between parent and tip (a concurrent widening
          or DDL is a real conflict — conservative by design);
        - the exactly-once log and the LSN watermark moved only
          FORWARD between parent and tip: a rollback regressed them on
          purpose (undone batches must replay), and rebasing over it
          would resurrect exactly the state it undid.

        The rebased snapshot adopts the tip's manifests for every
        untouched group (keeping the winners' effects), the tip's
        refs/stats/watermark history, max-merged watermark and applied
        log, and re-appends its own watermark advance when it still
        advances past the tip."""
        if not snap.__dict__.get("_data_commit"):
            return False  # refs/DDL/spec/rollback intent: never rebase
        try:
            parent = self.snapshot(snap.parent_version)
            tip = self.snapshot(tip_version)
        except FileNotFoundError:
            return False  # expired under us: real conflict
        for s in (parent, tip):
            # legacy inline-files snapshot (pre-sharding): its file set
            # is not group-addressable, so pointer-diff validation
            # cannot run. An EMPTY manifest list with no files is just
            # a young sharded table — fine.
            if not s.manifest_list and s.__dict__.get("files"):
                return False
        if (
            tip.schema_json != parent.schema_json
            or tip.num_buckets != parent.num_buckets
            or tip.bucket_col != parent.bucket_col
            or tip.key_cols != parent.key_cols
            or tip.order_cols != parent.order_cols
            or tip.epoch != parent.epoch
            or tip.field_ids != parent.field_ids
            or tip.epoch_names != parent.epoch_names
            or tip.props != parent.props
            or tip.watermark_lsn < parent.watermark_lsn
        ):
            return False
        for run, b in parent.applied.items():
            if tip.applied.get(run, -1) < b:
                return False  # rollback regressed the replay log
        pm = {m["group"]: m["path"] for m in parent.manifest_list}
        tm = {m["group"]: m["path"] for m in tip.manifest_list}
        sm = {m["group"]: m["path"] for m in snap.manifest_list}
        touched = {
            g for g in pm.keys() | sm.keys() if pm.get(g) != sm.get(g)
        }
        others = {
            g for g in pm.keys() | tm.keys() if pm.get(g) != tm.get(g)
        }
        if others & touched:
            return False  # overlapping data footprint: real conflict
        ours = {
            m["group"]: m
            for m in snap.manifest_list
            if m["group"] in touched
        }
        mlist = [m for m in tip.manifest_list if m["group"] not in touched]
        mlist += ours.values()
        mlist.sort(key=lambda m: m["group"])
        snap.manifest_list = mlist
        snap.parent_version = tip.version
        snap.watermark_lsn = max(tip.watermark_lsn, snap.watermark_lsn)
        merged = dict(tip.applied)
        for run, b in snap.applied.items():
            merged[run] = max(merged.get(run, -1), b)
        snap.applied = merged
        self._cap_applied(snap)
        snap.refs = dict(tip.refs)
        snap.stats = dict(tip.stats)
        snap.wm_segments = list(tip.wm_segments)
        snap.wm_history = [list(x) for x in tip.wm_history]
        advanced = (
            snap.__dict__.pop("_wm_pending", False)
            and snap.watermark_lsn > tip.watermark_lsn
        )
        if advanced:
            # slot index is retargeted by _commit when it lands
            snap.wm_history.append([tip.version + 1, snap.watermark_lsn])
            snap.__dict__["_wm_pending"] = True
        self._roll_wm_segments(snap)
        snap.__dict__.pop("files", None)
        self._attach_files_loader(snap)
        snap.__dict__["_rebased"] = True  # observability (merge stats)
        return True

    def _claim_slot(self, vtmp: str, vpath: str, version: int) -> None:
        """Link the fully-written manifest into the version slot; the
        exclusive create is the commit arbiter.

        Stale-claim arbitration is CONTENT-based, not mtime-based: a
        claim's age comes from the ``committed_at_ms`` the claiming
        writer embedded in the manifest JSON itself, so recycling is
        correct on stores with coarse, cached, or skewed filesystem
        mtimes. Recycling serializes on an exclusive per-version flock:
        the winner re-verifies staleness INSIDE the lock before
        unlink+link, so a racing recoverer can never unlink a competitor
        's freshly recycled claim (plain unlink-then-link had that
        window: read-stale / competitor-recycles / unlink-fresh). The
        no-contention fast path — the first ``os.link`` — never takes
        the lock."""
        try:
            os.link(vtmp, vpath)
            return
        except FileExistsError:
            pass
        # slot taken: published competitor, live claim, or crashed residue
        head = os.path.join(self.meta_dir, "HEAD")
        published = -1
        if os.path.exists(head):
            with open(head) as f:
                published = int(f.read().strip())
        if published >= version:
            raise LoadError(
                f"concurrent commit conflict: version {version} was "
                f"published by another writer (HEAD={published}); "
                f"re-read and retry"
            )
        age_s = self._claim_age_s(vpath)
        if age_s <= self.STALE_CLAIM_S:
            raise LoadError(
                f"concurrent commit conflict: version {version} is "
                f"claimed by an in-flight writer ({age_s:.1f}s old, "
                f"stale after {self.STALE_CLAIM_S}s); re-read and retry"
            )
        lockpath = os.path.join(self.meta_dir, f".claimlock-{version:08d}")
        with open(lockpath, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if self._claim_age_s(vpath) <= self.STALE_CLAIM_S:
                    # a competing recoverer recycled the slot while we
                    # waited for the lock — the claim there is fresh now
                    raise LoadError(
                        f"concurrent commit conflict: version {version} "
                        f"was re-claimed by a competing recoverer; "
                        f"re-read and retry"
                    )
                try:
                    os.unlink(vpath)
                except FileNotFoundError:
                    pass
                try:
                    os.link(vtmp, vpath)
                except FileExistsError:
                    raise LoadError(
                        f"concurrent commit conflict: version {version} "
                        f"was re-claimed by a competing recoverer; "
                        f"re-read and retry"
                    ) from None
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def _claim_age_s(self, vpath: str) -> float:
        """Seconds since the claim at ``vpath`` was stamped, read from
        the claim's own embedded ``committed_at_ms``. A vanished,
        unreadable, or unstamped claim counts as infinitely old: the
        write path fsyncs the full manifest before linking it into the
        slot, so torn content can only be crashed residue."""
        try:
            with open(vpath) as f:
                claimed_ms = json.loads(f.read()).get("committed_at_ms", -1)
        except (FileNotFoundError, ValueError):
            return float("inf")
        if not isinstance(claimed_ms, (int, float)) or claimed_ms < 0:
            return float("inf")
        return time.time() - claimed_ms / 1000.0

    # ------------------------------------------------------------ reads --
    def _scan_files(
        self,
        snap: Snapshot,
        fs: list[dict[str, Any]],
        schema: T.StructType | None = None,
    ) -> DataFrame:
        """Scan data files under the logical ``schema`` (default: the
        snapshot's), translating each file's PHYSICAL parquet column
        names to current logical names by stable field id (Iceberg
        schema-evolution semantics: renames relabel, drops retire the
        id, a re-added name gets a fresh id so retired data never
        resurrects).

        Fast path — every file written under the snapshot's current
        epoch: physical names equal logical names (renames/drops bump
        the epoch, so within one epoch names are fixed and a name can
        enter the epoch only once), one name-based scan with explicit
        schema exactly as before; columns added after a file was
        written null-backfill in the parquet reader. Files from older
        epochs are scanned per epoch with that epoch's physical names
        and re-aliased — one extra scan per SURVIVING old epoch, which
        compaction retires."""
        logical = (schema if schema is not None else snap.schema()).fields
        out_schema = _with_meta_cols(
            T.StructType([T.StructField(f.name, f.dataType, True) for f in logical])
        )
        if not fs:
            return self.spark.createDataFrame([], out_schema)
        by_epoch: dict[int, list[dict[str, Any]]] = {}
        for f in fs:
            by_epoch.setdefault(int(f.get("epoch", 0)), []).append(f)
        if set(by_epoch) == {snap.epoch}:
            return self.spark.read.schema(out_schema).parquet(
                *[f["path"] for f in fs]
            )
        meta_fields = [
            T.StructField(LSN_COL, T.LongType(), True),
            T.StructField(DELETED_COL, T.BooleanType(), True),
            T.StructField(SUB_COL, T.IntegerType(), True),
        ]
        parts: list[DataFrame] = []
        for e in sorted(by_epoch):
            phys_by_id = {
                int(i): n
                for i, n in snap.epoch_names.get(str(e), {}).items()
            }
            read_fields: list[T.StructField] = []
            sel: list[F.Column] = []
            for lf in logical:
                fid = snap.field_ids.get(lf.name)
                pn = phys_by_id.get(fid) if fid is not None else None
                if pn is not None:
                    # current type (covers in-place promotions), the
                    # epoch's physical name
                    read_fields.append(T.StructField(pn, lf.dataType, True))
                    sel.append(F.col(pn).alias(lf.name))
                else:
                    # field didn't exist at this epoch (added later, or
                    # a re-add of a retired name): NULL — never read a
                    # stale physical column that happens to share the name
                    sel.append(F.lit(None).cast(lf.dataType).alias(lf.name))
            df = self.spark.read.schema(
                T.StructType(read_fields + meta_fields)
            ).parquet(*[f["path"] for f in by_epoch[e]])
            parts.append(
                df.select(
                    *sel, F.col(LSN_COL), F.col(DELETED_COL), F.col(SUB_COL)
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        version: int | None = None,
        include_meta: bool = False,
        buckets: Sequence[int] | None = None,
        as_of_ms: int | None = None,
        ts_range: tuple[Any, Any] | None = None,
        key_values: Sequence[Any] | None = None,
        key_hashes: Sequence[Sequence[int]] | None = None,
    ) -> DataFrame:
        """Read the table's current (LWW-resolved, tombstone-filtered)
        state, optionally restricted to ``buckets`` (manifest-pruned)
        and/or an event-time window ``ts_range=(lo, hi)`` over the
        first order column (each bound a datetime, ISO string, or None
        for open-ended).

        ``key_values`` restricts the result to rows whose bucket-column
        value is in the list AND file-skips on the manifest's per-file
        key bounds (``min_key``/``max_key``, Iceberg's lower/upper
        bounds): a file whose key range excludes every sought value is
        never opened. Safe for any file mix — a file without a key can
        neither produce nor supersede (LWW) a row of that key, and
        tombstones carry their real key so deletes are never hidden by
        the prune. The residual ``isin`` filter keeps conservatively
        retained files (missing bounds) row-exact. ``lookup()`` adds
        the bucket-hash prune on top; at 10^10 rows the combination
        reads O(files actually holding the conversation), not O(bucket).

        ``ts_range`` is Iceberg-style DATA SKIPPING, not just a filter:
        the manifest stores each file's min/max event time (parquet
        footer stats captured at write time), and every file whose
        max_ts lies strictly BELOW ``lo`` is never opened. That prune
        is exact for ANY mix of base files, merge-on-read deltas,
        appends and schema epochs, because resolution orders by
        (ts, lsn): a row with ts < lo can neither be a result row
        (results need ts >= lo) nor supersede one (it loses LWW to any
        row with ts >= lo). Files ABOVE the window cannot be skipped —
        a newer version of a key supersedes (deletes-from-the-window) an
        in-range row — so they stay in the scan and the residual
        ``ts <= hi`` filter lands post-resolution. The dominant 100-TB
        access pattern ("the last day/week of a years-deep transcript
        store") therefore reads O(window), not O(table). Files from
        pre-stats manifests (no max_ts) are conservatively read."""
        if as_of_ms is not None:
            if version is not None:
                raise LoadError("pass version OR as_of_ms, not both")
            version = self.version_as_of(as_of_ms)
        snap = self.current() if version is None else self.snapshot(version)
        mixed = False
        if buckets is not None:
            wanted = set(buckets)
            # sharded snapshots load only the admitted groups' manifests
            files = self._candidate_files(snap, buckets=wanted)
            files = [f for f in files if _file_overlaps(f, wanted, snap)]
            # a file written under a coarser (pre-evolution) spec also
            # holds sibling buckets' keys; a residual hash filter keeps
            # bucket-restricted reads row-exact across spec evolution
            mixed = any(_file_spec(f, snap) != snap.num_buckets for f in files)
        else:
            files = snap.files
        kvals: list[Any] | None = None
        if key_values is not None:
            kvals = list(key_values)
            files = [
                f for f in files if _file_may_contain(f, kvals, key_hashes)
            ]
        lo = hi = None
        if ts_range is not None:
            lo, hi = ts_range
            lo_us = _bound_micros(lo)
            if lo_us is not None:
                files = [
                    f
                    for f in files
                    if f.get("max_ts") is None or f["max_ts"] >= lo_us
                ]
        df = self._resolved_scan(snap, files, include_meta)
        if kvals is not None:
            df = df.where(F.col(snap.bucket_col).isin(kvals))
        if mixed:
            df = df.where(
                bucket_expr(snap.bucket_col, snap.num_buckets).isin(
                    list(wanted)
                )
            )
        if ts_range is not None:
            tcol = F.col(snap.order_cols[0])
            ttype = next(
                (
                    f.dataType
                    for f in snap.schema().fields
                    if f.name == snap.order_cols[0]
                ),
                T.TimestampType(),
            )
            if lo is not None:
                df = df.where(tcol >= F.lit(lo).cast(ttype))
            if hi is not None:
                df = df.where(tcol <= F.lit(hi).cast(ttype))
        return df

    def _resolved_scan(
        self,
        snap: Snapshot,
        files: list[dict[str, Any]],
        include_meta: bool,
    ) -> DataFrame:
        """Scan the given files with merge-on-read resolution: buckets
        carrying delta files get a per-key LWW pass over base+delta;
        every other bucket stays on the scan-only path (no shuffle).
        The dirty set is bounded by write.delta.max-files per bucket,
        so read amplification is O(max-files), not O(commits). Bucket
        identity is compared under the CURRENT spec (_expand_to_current)
        so a delta file always resolves against base files holding its
        keys even across a bucket-spec evolution."""

        def _scan(fs: list[dict[str, Any]]) -> DataFrame:
            return self._scan_files(snap, fs)

        dirty: set[int] = set()
        for f in files:
            if f.get("kind") == "delta":
                dirty |= _expand_to_current(f, snap)
        clean_df = _scan(
            [f for f in files if not _file_overlaps(f, dirty, snap)]
        )
        df = clean_df
        if dirty:
            types = {f.name: f.dataType for f in snap.schema().fields}
            resolved = _lww_resolve(
                _scan([f for f in files if _file_overlaps(f, dirty, snap)]),
                snap.key_cols,
                snap.order_cols[0],
                types,
            )
            df = clean_df.unionByName(resolved.select(*clean_df.columns))
        if include_meta:
            return df
        # tombstones (soft deletes) are an implementation detail: a delete
        # must keep its (ts, lsn) so a late, older cross-batch event for
        # the same key cannot resurrect the row.
        return df.where(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(
            LSN_COL, DELETED_COL, SUB_COL
        )

    # --------------------------------------------------- point lookup --
    def _key_probe(
        self, values: Sequence[Any], snap: Snapshot
    ) -> tuple[list[int], list[list[int]]]:
        """Bucket ids the given bucket-column values hash into plus the
        values' raw bloom probe hashes — computed with the SAME hash
        family the write path uses (``bucket_expr``'s xxhash64 and
        ``_key_blooms``' xxhash64(key, i)).

        Fast path: a pure-Python xxhash64 (functions/xxh64.py, pinned
        bit-identical to the JVM by tests/test_xxh64_pin.py) hashes the
        probe keys on the driver, so an interactive ``lookup`` issues
        exactly ONE Spark job — the pruned scan — instead of paying a
        ~100 ms hash micro-job first. Key dtypes outside the pinned set
        fall back to the original Spark-job probe, so the fast path can
        never be a correctness input."""
        btype = next(
            f.dataType
            for f in snap.schema().fields
            if f.name == snap.bucket_col
        )
        try:
            from etl_rs_spark.functions.xxh64 import (
                UnsupportedKeyType,
                spark_xxhash64,
            )

            dt = btype.simpleString()
            n = snap.num_buckets
            buckets_set: set[int] = set()
            hashes = []
            for v in values:
                h = spark_xxhash64([v], [dt])
                buckets_set.add(((h % n) + n) % n)
                hashes.append(
                    [
                        spark_xxhash64([v, k], [dt, "int"])
                        for k in range(_KB_K)
                    ]
                )
            return sorted(buckets_set), hashes
        except UnsupportedKeyType:
            pass  # exotic key dtype: hash through Spark below
        vdf = self.spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)],
            T.StructType(
                [
                    T.StructField("i", T.IntegerType()),
                    T.StructField("v", btype),
                ]
            ),
        )
        rows = vdf.select(
            "i",
            bucket_expr("v", snap.num_buckets).alias("b"),
            *[
                F.xxhash64(F.col("v"), F.lit(k)).alias(f"h{k}")
                for k in range(_KB_K)
            ],
        ).collect()
        rows.sort(key=lambda r: r["i"])  # hashes[j] must align with values[j]
        buckets = sorted({r["b"] for r in rows})
        hashes = [[r[f"h{k}"] for k in range(_KB_K)] for r in rows]
        return buckets, hashes

    def _buckets_for(self, values: Sequence[Any], snap: Snapshot) -> list[int]:
        """Bucket ids for the given bucket-column values (see
        ``_key_probe``)."""
        return self._key_probe(values, snap)[0]

    def lookup(
        self,
        values: Any,
        version: int | None = None,
        include_meta: bool = False,
    ) -> DataFrame:
        """Point lookup by bucket-column value(s) with hash-partition
        pruning: the keys are hashed with the write path's own bucket
        function, the scan is restricted to those buckets' files via the
        manifest (``read(buckets=...)``), and the residual equality
        filter lands on the parquet scan as a pushed predicate. Looking
        up k conversations on an N-bucket table reads at most k buckets'
        files — O(k/N) of the table, regardless of table size — which is
        what makes single-conversation retrieval from a 10^10-row
        transcript store an interactive query instead of a table scan.
        Iceberg gets the identical prune from
        ``PARTITIONED BY (bucket(N, conv_id))`` + a conv_id equality
        predicate. Merge-on-read buckets resolve per-key LWW exactly as
        in ``read()`` (shared scan path).

        Inside the surviving buckets, per-file key bounds
        (``min_key``/``max_key``, via ``read(key_values=...)``) skip
        files whose key range excludes every sought value — so a hot
        bucket that has accumulated many files between compactions
        still opens only the files that can actually hold the
        conversation, and sorted-write row-group stats prune the rest
        within each file. With ``write.key-bloom.bits`` set, each
        file's manifest bloom additionally skips same-bucket files that
        definitely lack the key even when their key BOUNDS overlap it —
        the case hash-distributed writes always hit, since every salted
        file spans the full key range."""
        if isinstance(values, (list, tuple, set, frozenset)):
            vals = list(values)
        else:
            vals = [values]
        snap = self.current() if version is None else self.snapshot(version)
        wanted, hashes = self._key_probe(vals, snap) if vals else ([], [])
        return self.read(
            version=snap.version,
            include_meta=include_meta,
            buckets=wanted,
            key_values=vals,
            key_hashes=hashes,
        )

    # ------------------------------------------------- metadata tables --
    def row_count(self, version: int | None = None) -> int:
        """Upper-bound row count from manifest metadata alone — ZERO
        Spark jobs and (on a sharded snapshot) zero manifest loads: the
        manifest-list summaries carry per-group footer row counts. The
        count includes tombstones and unresolved MoR delta rows, so it
        is an OVERESTIMATE of the resolved state — exactly what
        corpus-size-derived knobs want (``auto_doc_freq_cap`` only
        loosens with an overestimate, never tightens)."""
        snap = self.current() if version is None else self.snapshot(version)
        if "files" not in snap.__dict__ and snap.manifest_list:
            return sum(int(m.get("rows", 0)) for m in snap.manifest_list)
        return sum(int(f.get("rows", 0)) for f in snap.files)

    def ngram_dedup_pairs(
        self,
        id_col: str,
        text_col: str,
        n: int = 3,
        threshold: float = 0.8,
        version: int | None = None,
    ) -> DataFrame:
        """Corpus-scale n-gram Jaccard near-dup pairs over the table's
        resolved state, with the hot-gram cap derived from the
        MANIFEST's own row counts (``row_count``) — the data-derived
        cap costs zero extra jobs here, not even the in-plan count
        subquery the standalone operator falls back to."""
        from etl_rs_spark.operators.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(
            self.read(version=version),
            id_col=id_col,
            text_col=text_col,
            n=n,
            threshold=threshold,
            max_doc_freq="auto",
            n_docs=self.row_count(version=version),
        )

    def inspect_files(self, version: int | None = None) -> DataFrame:
        """The manifest as a queryable DataFrame (Iceberg's ``t.files``
        metadata table): one row per live data file with its bucket,
        row count, LSN/event-time/key ranges, MoR kind, write spec and
        epoch, and whether it carries a key bloom.

        On a sharded snapshot this is a DISTRIBUTED read of the
        manifest files themselves (exactly how Iceberg serves its
        ``files`` table): the driver ships O(groups) paths, executors
        parse and explode the entries, and a 10^6-file table never
        materializes its file list in driver memory. Hydrated / legacy
        snapshots build the same schema from the in-memory list."""
        snap = self.current() if version is None else self.snapshot(version)
        out_ddl = (
            "path string, bucket int, rows long, min_lsn long, "
            "max_lsn long, min_ts long, max_ts long, min_key string, "
            "max_key string, kind string, spec_n int, epoch int, "
            "has_key_bloom boolean, external boolean"
        )
        if "files" not in snap.__dict__ and snap.manifest_list:
            paths = [
                os.path.join(self.meta_dir, m["path"])
                for m in snap.manifest_list
            ]
            ent = (
                "group string, files array<struct<path:string,"
                "bucket:int,rows:long,min_lsn:long,max_lsn:long,"
                "min_ts:long,max_ts:long,min_key:string,max_key:string,"
                "kind:string,spec_n:int,epoch:int,key_bloom:string,"
                "external:boolean>>"
            )
            raw = (
                self.spark.read.schema(ent)
                .option("multiLine", True)
                .json(paths)
            )
            f = F.col("f")
            return raw.select(
                "group", F.explode("files").alias("f")
            ).select(
                f["path"].alias("path"),
                f["bucket"].alias("bucket"),
                F.coalesce(f["rows"], F.lit(0)).alias("rows"),
                f["min_lsn"].alias("min_lsn"),
                f["max_lsn"].alias("max_lsn"),
                f["min_ts"].alias("min_ts"),
                f["max_ts"].alias("max_ts"),
                f["min_key"].alias("min_key"),
                f["max_key"].alias("max_key"),
                F.coalesce(f["kind"], F.lit("base")).alias("kind"),
                # entries written under the current spec may omit
                # spec_n; the group key encodes it (see _load_manifest)
                F.coalesce(
                    f["spec_n"],
                    F.regexp_extract("group", r"^s(\d+)-b", 1).cast("int"),
                ).alias("spec_n"),
                F.coalesce(f["epoch"], F.lit(0)).alias("epoch"),
                f["key_bloom"].isNotNull().alias("has_key_bloom"),
                F.coalesce(f["external"], F.lit(False)).alias("external"),
            )
        rows = [
            (
                f["path"],
                int(f["bucket"]),
                int(f.get("rows", 0)),
                f.get("min_lsn"),
                f.get("max_lsn"),
                f.get("min_ts"),
                f.get("max_ts"),
                None if f.get("min_key") is None else str(f["min_key"]),
                None if f.get("max_key") is None else str(f["max_key"]),
                f.get("kind", "base"),
                _file_spec(f, snap),
                int(f.get("epoch", 0)),
                bool(f.get("key_bloom")),
                bool(f.get("external")),
            )
            for f in snap.files
        ]
        return self.spark.createDataFrame(rows, out_ddl)

    def inspect_snapshots(self) -> DataFrame:
        """Surviving snapshot history as a DataFrame (Iceberg's
        ``t.snapshots``/``t.history``): version, commit time, branch,
        parent, watermark, file/row counts. Bounded by retention —
        expire_snapshots trims it. O(retained versions) metadata
        reads, no data touched."""
        rows = []
        for p in sorted(
            glob.glob(os.path.join(self.meta_dir, "version-*.json"))
        ):
            s = Snapshot.from_json(open(p).read())
            if s.manifest_list:
                # sharded: the manifest-list summaries already carry
                # the counts — zero manifest files opened
                n_files = sum(m["n_files"] for m in s.manifest_list)
                n_rows = sum(m["rows"] for m in s.manifest_list)
            else:
                n_files = len(s.files)
                n_rows = sum(f.get("rows", 0) for f in s.files)
            rows.append(
                (
                    s.version,
                    s.committed_at_ms,
                    s.operation or None,  # "" = pre-field manifest
                    s.branch,
                    s.parent_version,
                    s.watermark_lsn,
                    n_files,
                    n_rows,
                    s.num_buckets,
                    s.epoch,
                )
            )
        return self.spark.createDataFrame(
            rows,
            "version int, committed_at_ms long, operation string, "
            "branch string, parent_version int, watermark_lsn long, "
            "n_files int, n_rows long, num_buckets int, epoch int",
        )

    def inspect_refs(self) -> DataFrame:
        """Tags and branches as a DataFrame (Iceberg's ``t.refs``)."""
        tips = _tips(self._head_snapshot())
        rows = [("branch", n, int(v)) for n, v in sorted(tips.items())]
        for tv in sorted(set(tips.values())):
            for n, v in sorted(self.snapshot(int(tv)).refs.items()):
                rows.append(("tag", n, int(v)))
        return self.spark.createDataFrame(
            list(dict.fromkeys(rows)),
            "type string, name string, version int",
        )

    def inspect_manifests(self, version: int | None = None) -> DataFrame:
        """The manifest LIST as a DataFrame (Iceberg's ``t.manifests``):
        one row per manifest file at the given (default current)
        version — its group, write spec, bucket, file/row/delta counts
        and LSN range. Served entirely from the snapshot's summary
        line: O(groups) driver metadata, ZERO manifest files opened.
        Legacy inline-files snapshots synthesize the same shape from
        the in-memory list (one virtual group per (spec, bucket))."""
        snap = self.current() if version is None else self.snapshot(version)
        ddl = (
            "path string, group string, spec_n int, bucket int, "
            "n_files int, rows long, delta_files int, min_lsn long, "
            "max_lsn long"
        )
        if snap.manifest_list:
            rows = [
                (
                    m["path"],
                    m["group"],
                    int(m["spec_n"]),
                    int(m["bucket"]),
                    int(m["n_files"]),
                    int(m["rows"]),
                    int(m.get("deltas", 0)),
                    m.get("min_lsn"),
                    m.get("max_lsn"),
                )
                for m in snap.manifest_list
            ]
            return self.spark.createDataFrame(rows, ddl)
        groups: dict[str, list[dict[str, Any]]] = {}
        for f in snap.files:
            groups.setdefault(_group_key(f, snap), []).append(f)
        rows = []
        for gk in sorted(groups):
            s = self._manifest_summary(gk, "", groups[gk])
            rows.append(
                (
                    None,
                    gk,
                    s["spec_n"],
                    s["bucket"],
                    s["n_files"],
                    s["rows"],
                    s["deltas"],
                    s["min_lsn"],
                    s["max_lsn"],
                )
            )
        return self.spark.createDataFrame(rows, ddl)

    def inspect_partitions(self, version: int | None = None) -> DataFrame:
        """Per-partition (write-spec, bucket) rollup (Iceberg's
        ``t.partitions``): file/row/delta counts and LSN range per
        bucket under each spec still present in the table — the view an
        operator reads to spot skewed buckets, delta-chain depth before
        compaction, or an unfinished bucket-spec evolution (rows still
        parked under an old spec_n). Aggregated from the manifest-list
        summaries: O(groups) driver metadata, zero manifest or data
        files opened. Footer ``rows`` on MoR tables count stored rows
        (base + unresolved delta events), matching ``t.files``."""
        return (
            self.inspect_manifests(version=version)
            .groupBy("spec_n", "bucket")
            .agg(
                F.sum("n_files").cast("int").alias("n_files"),
                F.sum("rows").alias("rows"),
                F.sum("delta_files").cast("int").alias("delta_files"),
                F.min("min_lsn").alias("min_lsn"),
                F.max("max_lsn").alias("max_lsn"),
            )
            .orderBy("spec_n", "bucket")
        )

    # -------------------------------------------------- table statistics --
    def analyze(
        self, columns: Sequence[str] | None = None, exact: bool = False
    ) -> dict[str, Any]:
        """ANALYZE TABLE ... COMPUTE STATISTICS (the role Iceberg's
        Puffin statistics files play for scan planning): ONE pass over
        the resolved current state computes, per column, null count,
        NDV (HyperLogLog++ ``approx_count_distinct`` by default —
        constant memory per column at any cardinality, which is the
        only NDV a 10^10-row table can afford; ``exact=True`` swaps in
        ``count_distinct`` for oracle tests), and min/max for atomic
        (orderable) types. The result is committed into table metadata
        atomically and carried by every later snapshot with its
        ``analyzed_version``, so consumers (operators sizing bucket
        counts, engines choosing broadcast sides, humans running
        describe) can see both the numbers and their staleness."""
        snap = self.current()
        cols = list(columns) if columns else [
            f.name for f in snap.schema().fields
        ]
        types = {f.name: f.dataType for f in snap.schema().fields}
        unknown = [c for c in cols if c not in types]
        if unknown:
            raise LoadError(f"no such column(s) {unknown}")
        aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            ndv = (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(c)
            )
            aggs += [
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    f"__nulls_{c}"
                ),
                ndv.alias(f"__ndv_{c}"),
            ]
            if isinstance(types[c], T.AtomicType):
                aggs += [
                    F.min(c).alias(f"__min_{c}"),
                    F.max(c).alias(f"__max_{c}"),
                ]
        row = self.read(version=snap.version).agg(*aggs).first().asDict()

        def _enc(v: Any) -> Any:
            import datetime as _dt
            if v is None or isinstance(v, (str, int, float, bool)):
                return v
            if isinstance(v, _dt.datetime):
                return v.isoformat(sep=" ", timespec="microseconds")
            return str(v)

        colstats = {
            c: {
                "nulls": int(row[f"__nulls_{c}"] or 0),
                "ndv": int(row[f"__ndv_{c}"] or 0),
                "min": _enc(row.get(f"__min_{c}")),
                "max": _enc(row.get(f"__max_{c}")),
            }
            for c in cols
        }
        stats = {
            "analyzed_version": snap.version,
            "row_count": int(row["__n"]),
            "exact_ndv": bool(exact),
            "columns": colstats,
        }
        self._commit(snap.child(stats=stats, operation="analyze"))
        return stats

    # -------------------------------------------------------- row DML --
    def delete_where(self, condition: Any) -> dict[str, Any]:
        """Row-level DELETE (Iceberg ``DELETE FROM t WHERE p`` — the
        GDPR / right-to-be-forgotten path) expressed THROUGH the CDC
        merge rather than beside it: the matching keys of the current
        snapshot become tombstone events at ``lsn = watermark + 1``
        (each keeping its stored event time, so the LWW comparison
        falls through to the strictly-higher LSN) and take the normal
        merge path. That buys, for free: bucket-pruned rewrites of only
        the affected buckets, merge-on-read delta semantics when the
        table runs MoR, visibility in the change data feed (consumers
        see the deletes), branch/WAP compatibility, and correct replay
        interplay — a binlog event already below the watermark can
        never resurrect the row, while a genuinely NEWER event
        (higher (ts, lsn)) still wins, which is exactly CDC delete
        semantics. The borrowed ``watermark + 1`` is an LSN the source
        may still legitimately produce, so DML rows persist the hidden
        sub-LSN tier at 0 (stream rows carry 1): a genuine event later
        arriving at exactly (ts, watermark+1) beats the stored DML row
        instead of tying and being dropped as replay. ``condition`` is
        a Column or a SQL string over the table's columns. Physical
        removal of the tombstoned payload follows at
        ``compact(tombstone_lsn_horizon=...)``."""
        snap = self.current()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        lsn_name = snap.order_cols[-1]
        winners = (
            self.read(version=snap.version)
            .where(cond)
            .withColumn("op", F.lit("D"))
            .withColumn(lsn_name, F.lit(snap.watermark_lsn + 1))
        )
        res = self.merge(
            winners, lsn_col=lsn_name, sub_lsn=0, operation="delete"
        )
        return {**res, "dml": "delete"}

    def update_where(
        self, assignments: dict[str, Any], condition: Any = None
    ) -> dict[str, Any]:
        """Row-level UPDATE (Iceberg ``UPDATE t SET ... WHERE p``),
        same construction as ``delete_where``: matching rows of the
        current snapshot are re-emitted as U-events with the
        assignments applied at ``lsn = watermark + 1`` and merged.
        ``assignments`` maps column name -> Column or SQL expression
        (evaluated against the pre-update row, so ``{"value":
        "value * 2"}`` works); assigning a NEW column widens the schema
        through the merge's normal additive evolution. Key and order
        columns are not assignable (that is an identity change — issue
        a delete + insert through the stream instead)."""
        snap = self.current()
        bad = set(assignments) & set(snap.key_cols) | (
            set(assignments) & set(snap.order_cols)
        )
        if bad:
            raise LoadError(
                f"cannot UPDATE key/order columns {sorted(bad)}; delete "
                f"and re-insert through the change stream instead"
            )
        cond = F.expr(condition) if isinstance(condition, str) else condition
        lsn_name = snap.order_cols[-1]
        df = self.read(version=snap.version)
        if cond is not None:
            df = df.where(cond)
        exprs = {
            k: (F.expr(v) if isinstance(v, str) else v)
            for k, v in assignments.items()
        }
        winners = (
            df.withColumns(exprs)
            .withColumn("op", F.lit("U"))
            .withColumn(lsn_name, F.lit(snap.watermark_lsn + 1))
        )
        res = self.merge(
            winners, lsn_col=lsn_name, sub_lsn=0, operation="update"
        )
        return {**res, "dml": "update"}

    # ------------------------------------------------- schema evolution --
    def rename_column(self, old: str, new: str) -> dict[str, Any]:
        """Metadata-only column rename (Iceberg spec: renames preserve
        the field id; no data files are touched or rewritten). Bumps
        the write epoch — files written before the rename keep their
        old physical column name and are translated by id at read time
        (_scan_files); files written after carry the new name.
        Key/order/bucket column references follow the rename.

        The reference's DeltaLoader stores schema-evolution knobs and
        never applies them (/root/reference/src/load/delta.rs:62-69);
        RenameColumnsTransform (operators/transforms.py) renames rows
        in flight — this renames the TABLE."""
        snap = self.current()
        names = [f.name for f in snap.schema().fields]
        if old not in names:
            raise LoadError(f"no such column {old!r}")
        if new in names:
            raise LoadError(f"column {new!r} already exists")
        if new in (LSN_COL, DELETED_COL, SUB_COL, _BUCKET):
            raise LoadError(f"{new!r} is a reserved name")
        fields = [
            T.StructField(new if f.name == old else f.name, f.dataType,
                          f.nullable, f.metadata)
            for f in snap.schema().fields
        ]
        field_ids = dict(snap.field_ids)
        field_ids[new] = field_ids.pop(old)
        new_epoch = snap.epoch + 1
        epoch_names = {e: dict(m) for e, m in snap.epoch_names.items()}
        epoch_names[str(new_epoch)] = {
            str(i): n for n, i in field_ids.items()
        }
        ren = lambda c: new if c == old else c  # noqa: E731
        new_snap = snap.child(
            schema_json=json.dumps(T.StructType(fields).jsonValue()),
            key_cols=[ren(c) for c in snap.key_cols],
            order_cols=[ren(c) for c in snap.order_cols],
            bucket_col=ren(snap.bucket_col),
            field_ids=field_ids,
            epoch=new_epoch,
            epoch_names=epoch_names,
            operation="ddl",
        )
        self._commit(new_snap)
        return {"version": new_snap.version, "renamed": {old: new}}

    def drop_column(self, name: str) -> dict[str, Any]:
        """Metadata-only column drop: the field id is retired and the
        column vanishes from every read — including reads of old files,
        whose bytes stay on disk untouched (Iceberg's lazy drop; the
        next compaction of a bucket physically rewrites it without the
        column). Re-adding the same NAME later allocates a fresh id, so
        the retired column's data never resurrects. Key/order/bucket
        columns cannot be dropped."""
        snap = self.current()
        if name in snap.key_cols or name in snap.order_cols or name == snap.bucket_col:
            raise LoadError(f"cannot drop key/order/bucket column {name!r}")
        fields = [f for f in snap.schema().fields if f.name != name]
        if len(fields) == len(snap.schema().fields):
            raise LoadError(f"no such column {name!r}")
        field_ids = dict(snap.field_ids)
        field_ids.pop(name, None)
        new_epoch = snap.epoch + 1
        epoch_names = {e: dict(m) for e, m in snap.epoch_names.items()}
        epoch_names[str(new_epoch)] = {
            str(i): n for n, i in field_ids.items()
        }
        new_snap = snap.child(
            schema_json=json.dumps(T.StructType(fields).jsonValue()),
            field_ids=field_ids,
            epoch=new_epoch,
            epoch_names=epoch_names,
            operation="ddl",
        )
        self._commit(new_snap)
        return {"version": new_snap.version, "dropped": name}

    def add_column(
        self, name: str, dtype: T.DataType | str
    ) -> dict[str, Any]:
        """Explicit additive evolution (the merge path also widens
        implicitly): allocates a fresh field id under the CURRENT epoch
        — existing files simply lack the column and null-backfill, and
        if the name once belonged to a dropped column, old epochs'
        physical data is invisible to the new id (non-resurrection)."""
        snap = self.current()
        if isinstance(dtype, str):
            dtype = T.StructType.fromDDL(f"`{name}` {dtype}")[0].dataType
        names = [f.name for f in snap.schema().fields]
        if name in names:
            raise LoadError(f"column {name!r} already exists")
        if name in (LSN_COL, DELETED_COL, SUB_COL, _BUCKET):
            raise LoadError(f"{name!r} is a reserved name")
        field_ids = dict(snap.field_ids)
        field_ids[name] = snap.next_field_id
        epoch_names = {e: dict(m) for e, m in snap.epoch_names.items()}
        epoch_names.setdefault(str(snap.epoch), {})[
            str(snap.next_field_id)
        ] = name
        new_snap = snap.child(
            schema_json=json.dumps(
                snap.schema().add(name, dtype).jsonValue()
            ),
            field_ids=field_ids,
            next_field_id=snap.next_field_id + 1,
            epoch_names=epoch_names,
            operation="ddl",
        )
        self._commit(new_snap)
        return {"version": new_snap.version, "added": name}

    def set_num_buckets(self, new_n: int) -> dict[str, Any]:
        """Bucket-spec (partition spec) evolution, Iceberg-style: a
        METADATA-ONLY commit — no data rewrite, no downtime. Existing
        files keep their old spec (stamped ``spec_n`` here); new writes
        use the new spec; reads/merges/lookup prune EXACTLY across the
        mix because pmod(xxhash64(k), N) nests under divisibility
        ((h mod kN) mod N == h mod N), which is why ``new_n`` must be a
        multiple or divisor of the current spec (and of every spec
        still present in the file set). Old-spec files migrate
        incrementally: any merge that folds a bucket they overlap
        rewrites them whole under the new spec, and ``compact()``
        finishes the tail — the 100-TB resize story (a table that
        outgrew its bucket count) without a big-bang rewrite window.

        Iceberg parity: ALTER TABLE ... WRITE ORDERED/partition spec
        evolution with bucket[N] transforms; the reference stores a
        partition-evolution knob and never applies it
        (/root/reference/src/load/delta.rs:62-69)."""
        snap = self.current()
        if new_n == snap.num_buckets:
            return {"version": snap.version, "skipped": True}
        if new_n < 1:
            raise LoadError("num_buckets must be >= 1")
        lazy = (
            "files" not in snap.__dict__
            and snap.__dict__.get("_files_loader") is not None
        )
        if lazy:
            # sharded table: every manifest summary carries its spec,
            # and hydration stamps entries from their manifest's group
            # (_load_manifest) — so no entry ever falls back to the new
            # current spec and NO manifest needs rewriting. Spec
            # evolution on a 10^6-file table is one O(groups) snapshot
            # JSON, zero manifest bytes read or written.
            specs = {int(m["spec_n"]) for m in snap.manifest_list} | {
                snap.num_buckets
            }
        else:
            specs = {_file_spec(f, snap) for f in snap.files} | {
                snap.num_buckets
            }
        for s in specs:
            if not (new_n % s == 0 or s % new_n == 0):
                raise LoadError(
                    f"new spec {new_n} must divide or be a multiple of "
                    f"every live spec (violates {s}); evolve through a "
                    "compatible intermediate or compact() first"
                )
        if lazy:
            new_snap = snap.child(num_buckets=new_n, operation="set-buckets")
        else:
            files = []
            for f in snap.files:
                # copy WITHOUT the _mf provenance keys: the stamped
                # spec_n must reach disk, so the group may not reuse
                # its parent manifest (see _shard_manifests)
                g = {k: v for k, v in f.items() if not k.startswith("_")}
                g.setdefault("spec_n", snap.num_buckets)
                files.append(g)
            new_snap = snap.child(
                num_buckets=new_n, files=files, operation="set-buckets"
            )
        self._commit(new_snap)
        return {
            "version": new_snap.version,
            "num_buckets": new_n,
            "previous": snap.num_buckets,
        }

    def set_properties(self, props: dict[str, Any]) -> dict[str, Any]:
        """Update table write properties with a metadata-only commit
        (Iceberg ALTER TABLE ... SET TBLPROPERTIES): merge semantics —
        given keys overwrite, a None value unsets the key, everything
        else carries forward. Properties steer WRITE behavior only
        (write.compression, write.target-file-rows, write.merge.mode,
        write.delta.max-files, write.sort-order,
        write.distribution-mode), so changing them
        mid-stream is always safe: existing files keep whatever shape
        they were written with and are resolved/compacted under the
        usual rules."""
        snap = self.current()
        merged = dict(snap.props)
        for k, v in props.items():
            if v is None:
                merged.pop(k, None)
            else:
                merged[k] = v
        new_snap = snap.child(props=merged, operation="properties")
        self._commit(new_snap)
        return {"version": new_snap.version, "props": merged}

    def create_tag(
        self,
        name: str,
        version: int | None = None,
        max_age_ms: int | None = None,
    ) -> dict[str, Any]:
        """Pin a snapshot under a name (Iceberg ALTER TABLE ... CREATE
        TAG): a metadata-only commit that records ``name -> version``
        in the table refs. A tagged version — and every data file it
        references — survives ``expire_snapshots`` until the tag is
        dropped, so "the exact table state training run X read" stays
        reproducible (``read(version=tags()[name])``) while routine
        retention keeps trimming untagged history. Tag commits go
        through the same claim-slot arbitration as data commits, so
        racing taggers/writers serialize cleanly."""
        snap = self.current()
        if name in snap.refs:
            raise LoadError(f"tag {name!r} already exists")
        v = snap.version if version is None else int(version)
        try:
            self.snapshot(v)  # must name a live, readable version
        except FileNotFoundError:
            raise LoadError(f"tag target version {v} does not exist")
        new_snap = snap.child(refs={**snap.refs, name: v}, operation="tag")
        if max_age_ms is not None:
            # Iceberg max-ref-age-ms for tags: expire_snapshots drops
            # the tag once the pinned snapshot is older than this
            new_snap.__dict__["_ref_retention_edits"] = {
                f"tag:{name}": int(max_age_ms)
            }
        self._commit(new_snap)
        return {"version": new_snap.version, "tag": name, "at": v}

    def drop_tag(self, name: str) -> dict[str, Any]:
        """Remove a tag (Iceberg DROP TAG) — the pinned version rejoins
        the normal retention pool at the next ``expire_snapshots``."""
        snap = self.current()
        if name not in snap.refs:
            raise LoadError(f"no such tag {name!r}")
        refs = dict(snap.refs)
        at = refs.pop(name)
        new_snap = snap.child(refs=refs, operation="tag")
        new_snap.__dict__["_ref_retention_edits"] = {f"tag:{name}": None}
        self._commit(new_snap)
        return {"version": new_snap.version, "dropped": name, "was_at": at}

    def tags(self) -> dict[str, int]:
        """Current tag name -> pinned version."""
        return dict(self.current().refs)

    # --------------------------------------------- branches (WAP) --
    def create_branch(
        self,
        name: str,
        version: int | None = None,
        max_age_ms: int | None = None,
    ) -> dict[str, Any]:
        """Create a branch ref (Iceberg ALTER TABLE ... CREATE BRANCH)
        pointing at this handle's branch tip (or an explicit
        ``version``). The write-audit-publish opener: stage risky work
        (a backfill, a schema change, a suspect binlog window) on the
        branch via ``on_branch(name)`` — full merge/compact/DDL
        capability, zero main-branch visibility — audit it, then
        ``fast_forward`` to publish atomically or ``drop_branch`` to
        discard. A branch tip and the files it references survive
        expire_snapshots like any ref. Metadata-only commit; O(1).

        ``max_age_ms`` (Iceberg's ``RETAIN``/``max-ref-age-ms`` ref
        property): once the branch TIP snapshot is older than this,
        ``expire_snapshots`` drops the ref automatically and its
        snapshots rejoin the retention pool — so a forgotten audit
        branch cannot pin table history forever. Default None = pinned
        until dropped explicitly (previous behavior)."""
        if name == "main":
            raise LoadError("branch 'main' always exists")
        tips = self.branches()
        if name in tips:
            raise LoadError(f"branch {name!r} already exists")
        snap = self.current()
        if version is None:
            # fork at the creation commit itself: the fork point must BE
            # the parent branch's tip or the branch is born behind it
            # (this creation commit advances the parent) and could never
            # fast-forward back
            v: int = self._SLOT
        else:
            v = int(version)
            try:
                self.snapshot(v)
            except FileNotFoundError:
                raise LoadError(f"branch target version {v} does not exist")
        child = snap.child(operation="branch")
        if max_age_ms is not None:
            child.__dict__["_ref_retention_edits"] = {
                f"branch:{name}": int(max_age_ms)
            }
        self._commit(child, branch_edits={name: v})
        return {"branch": name, "at": child.branches[name]}

    def drop_branch(self, name: str) -> dict[str, Any]:
        """Remove a branch ref (Iceberg DROP BRANCH) — its unpublished
        snapshots and files rejoin the retention pool at the next
        expire_snapshots/vacuum. The discard half of WAP."""
        if name == "main":
            raise LoadError("cannot drop branch 'main'")
        tips = self.branches()
        if name not in tips:
            raise LoadError(f"no such branch {name!r}")
        if name == self._branch:
            raise LoadError("cannot drop the branch this handle is on")
        self._commit(
            self.current().child(operation="branch"),
            branch_edits={name: None},
        )
        return {"dropped": name, "was_at": tips[name]}

    def fast_forward(self, branch: str) -> dict[str, Any]:
        """Publish: move THIS handle's branch (typically main) to
        ``branch``'s tip — Iceberg's fast_forward procedure, the
        write-audit-publish commit. Metadata-only and atomic: the new
        snapshot's content IS the branch tip's state (files, schema,
        bucket spec, applied-batch log, watermark), so consumers see
        the audited state in one swing and CDC replay bookkeeping moves
        with it.

        Fast-forward-only, verified in O(1) metadata reads with no
        manifest walking (robust to expired intermediates): the target
        tip must be the branch's fork point (first publish), or itself
        a previous fast-forward from the same branch (``ff_source``
        stamp — repeated WAP cycles off one long-lived branch). If the
        target branch advanced independently since the fork, the
        publish is rejected — rebase by recreating the branch."""
        cur = self.current()  # target (this handle's) branch tip
        tips = self.branches()
        if branch not in tips:
            raise LoadError(f"no such branch {branch!r}")
        bt = int(tips[branch])
        if bt == cur.version or (
            bool(cur.ff_source)
            and cur.ff_source[0] == branch
            and int(cur.ff_source[1]) == bt
        ):  # tip already published (possibly by a previous fast_forward)
            return {"version": cur.version, "noop": True}
        bs = self.snapshot(bt)
        if bs.branch != branch:
            raise LoadError(
                f"branch {branch!r} has no commits ahead of "
                f"{cur.branch!r}; nothing to fast-forward"
            )
        # incarnation guard on the repeated-WAP path: the recorded
        # publish must come from the SAME life of the branch name — a
        # ref dropped and recreated (possibly behind this tip, from
        # another branch handle) gets a fresh epoch and must re-qualify
        # via the fork-point check instead of riding the stale stamp.
        # 2-element ff_source = pre-epoch manifest: accept as before.
        epoch_now = self._head_snapshot().branch_epochs.get(branch, -1)
        ff_same_life = (
            bool(cur.ff_source)
            and cur.ff_source[0] == branch
            and int(cur.ff_source[1]) <= bt
            and (
                len(cur.ff_source) < 3
                or epoch_now < 0
                or int(cur.ff_source[2]) == epoch_now
            )
        )
        ancestor = bs.fork_version == cur.version or ff_same_life
        if not ancestor:
            raise LoadError(
                f"not fast-forwardable: {cur.branch!r} advanced since "
                f"{branch!r} forked (tip {cur.version}, fork "
                f"{bs.fork_version}); recreate the branch from the "
                f"current tip and re-apply"
            )
        new_snap = bs.child(
            branch=cur.branch,
            parent_version=cur.version,
            fork_version=cur.fork_version,
            ff_source=[branch, bt, epoch_now],
            operation="fast-forward",
        )
        self._commit(new_snap)
        return {
            "version": new_snap.version,
            "published": branch,
            "from_version": bt,
        }

    def rollback(self, version: int) -> dict[str, Any]:
        """Roll the table back to an earlier snapshot — the CDC
        operator's undo for a bad deploy / poisoned batch. Iceberg
        parity: ``rollback_to_snapshot`` — a METADATA-ONLY commit (no
        data rewrite): the new snapshot is version N+1 whose entire
        content (file set, schema, field ids, bucket spec, applied-batch
        log, LSN watermark) is the target's, so history is preserved
        (the undone versions remain time-travelable until
        ``expire_snapshots``) and the restore itself is atomic under the
        same claim-slot arbitration as every other commit.

        Restoring ``applied`` and ``watermark_lsn`` is what makes the
        recovery story complete: the exactly-once (run_id, batch_id) log
        forgets the rolled-back batches, so re-running the stream from
        the pre-rollback checkpoint (or replaying the binlog window with
        a fixed pipeline) re-applies them cleanly instead of being
        silently skipped. Undone data files stay on disk referenced by
        their version manifests; ``expire_snapshots`` + ``vacuum``
        reclaim them on the normal schedule.

        The target must be an ANCESTOR of this handle's branch tip
        (Iceberg rollback_to_snapshot rejects non-ancestors). Version
        slots are global across branches, so "smaller version" is not
        enough: an interleaved commit from another branch must not be
        adoptable by rollback — that would silently publish unaudited
        branch state. Ancestry is checked in O(1) metadata (no manifest
        walking, robust to expired intermediates) via the same lineage
        rule ``version_as_of`` uses: the target was committed on this
        branch IN THIS INCARNATION (same ``fork_version`` — a
        dropped-then-recreated branch name must not resurrect its
        previous life's state), or it is the fork point / pre-fork
        parent-chain history."""
        cur = self.current()
        if version >= cur.version:
            raise LoadError(
                f"rollback target {version} is not an ancestor of "
                f"current version {cur.version}"
            )
        target = self.snapshot(version)
        fork = cur.fork_version
        on_chain = (
            target.branch == cur.branch
            and (fork < 0 or target.fork_version == fork)
        ) or (
            fork >= 0
            and version <= fork
            and (version == fork or target.branch == "main")
        )
        if not on_chain:
            raise LoadError(
                f"rollback target {version} (committed on branch "
                f"{target.branch!r}) is not an ancestor of "
                f"{cur.branch!r}@{cur.version}; targets must be prior "
                f"commits on this branch or its pre-fork lineage"
            )
        # derive from the TARGET's state but commit onto THIS branch's
        # tip: parent/branch/fork describe the commit's position in the
        # branch chain, not where its content came from
        new_snap = target.child(
            branch=cur.branch,
            parent_version=cur.version,
            fork_version=cur.fork_version,
            operation="rollback",
        )
        self._commit(new_snap)
        return {
            "version": new_snap.version,
            "restored": version,
            "undone": cur.version - version,
        }

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        with_version: bool = False,
    ) -> DataFrame:
        """Change data feed: the NET row-level changes between two
        snapshots — (payload columns, _change_type in upsert|delete,
        _lsn). A row whose key was touched several times in the window
        appears once with its final state (net semantics, like Iceberg's
        changelog scan / Delta CDF with coalesced changes).

        Mechanics: every merged row carries the LSN of its winning
        event, and each snapshot records the high-water LSN applied up
        to it — so the feed is ``_lsn > watermark(from_version)`` over
        the target snapshot, with METADATA PRUNING first: the manifest
        stores each file's max_lsn (parquet footer stats captured at
        write time), so files wholly at or below the watermark are never
        opened. An increment that touched 1 of N buckets reads only that
        bucket's rewritten files — O(changed data), not O(table).
        Tombstones surface as deletes. Covers rows written through
        ``merge`` (the CDC path — appends without an lsn column carry
        _lsn=-1 and never appear). Files from pre-stats manifests (no
        max_lsn key) are conservatively read.

        ``with_version``: adds ``_commit_version`` (Delta-CDF parity) —
        the snapshot that applied each row's winning event. Attribution
        reads the TO-snapshot's embedded ``wm_history`` (the full list
        of watermark-advancing commits every snapshot carries), so any
        window costs O(1) driver metadata reads — no per-version
        ``snapshot()`` calls, and expire_snapshots removing intermediate
        version files cannot break it — and the plan is one broadcast
        range join against the tiny (version, lsn-range) table instead
        of an O(window)-deep nested CASE (which falls out of codegen
        for long windows). Legacy manifests without history fall back
        to walking SURVIVING version files; a version expired away
        there attributes its rows to the next surviving version."""
        snap = self.current() if to_version is None else self.snapshot(to_version)
        try:
            wm = self.snapshot(from_version).watermark_lsn
        except FileNotFoundError:
            # from-snapshot expired: its watermark is recoverable from
            # the to-snapshot's history (last advance at or before it).
            # Deep windows may need rolled segments — O(segments) reads.
            full_hist = self._full_wm_history(snap)
            if not full_hist:
                raise
            wm = max(
                (w for v, w in full_hist if v <= from_version),
                default=-1,
            )
        def _scan(fs: list[dict[str, Any]]) -> DataFrame:
            return self._scan_files(snap, fs)

        # merge-on-read: a bucket carrying UNRESOLVED delta files that
        # advanced past the watermark needs a full per-key LWW pass over
        # ALL its files before the watermark filter — a newer delta row
        # may LOSE to an older stored row (out-of-order replay), in
        # which case the key has no net change in the window. Cost is
        # O(dirty buckets); compaction restores the pruned O(changed
        # data) path. Clean buckets (base files hold resolved winners)
        # keep the metadata-pruned scan.
        # bucket identity under the CURRENT spec (exact across bucket-
        # spec evolution: _expand_to_current)
        # a sharded snapshot prunes at the MANIFEST level, deltas or
        # not: delta coverage and dirty buckets come from the summary
        # line's per-group delta counts and lsn ranges (EXACT — every
        # file in a group shares the group's bucket coverage, so
        # group-level overlap is file-level overlap), groups wholly at
        # or below the watermark are never even loaded, and dirty
        # groups' manifests load only for the LWW-resolve pool below.
        # An incremental window on a long MoR table therefore reads
        # O(changed groups) driver metadata, never O(table files).
        lazy_meta = "files" not in snap.__dict__ and bool(snap.manifest_list)
        delta_cov: set[int] = set()
        dirty: set[int] = set()
        if lazy_meta:
            for m in snap.manifest_list:
                if m.get("deltas"):
                    delta_cov |= _expand_to_current(m, snap)
            for m in snap.manifest_list:
                if (
                    m.get("max_lsn") is None or m["max_lsn"] > wm
                ) and _file_overlaps(m, delta_cov, snap):
                    dirty |= _expand_to_current(m, snap) & delta_cov
            files = [
                f
                for m in snap.manifest_list
                if not _file_overlaps(m, dirty, snap)
                and (m.get("max_lsn") is None or m["max_lsn"] > wm)
                for f in _load_manifest(self.meta_dir, m["path"])
                if f.get("max_lsn") is None or f["max_lsn"] > wm
            ]
        else:
            scan_pool = snap.files
            for f in scan_pool:
                if f.get("kind") == "delta":
                    delta_cov |= _expand_to_current(f, snap)
            for f in scan_pool:
                if (
                    f.get("max_lsn") is None or f["max_lsn"] > wm
                ) and _file_overlaps(f, delta_cov, snap):
                    dirty |= _expand_to_current(f, snap) & delta_cov
            files = [
                f
                for f in scan_pool
                if not _file_overlaps(f, dirty, snap)
                and (f.get("max_lsn") is None or f["max_lsn"] > wm)
            ]
        df = _scan(files)
        changed = df.where(F.col(LSN_COL) > wm)
        if dirty:
            types = {f.name: f.dataType for f in snap.schema().fields}
            resolved = _lww_resolve(
                _scan(
                    [
                        f
                        for f in self._candidate_files(snap, buckets=dirty)
                        if _file_overlaps(f, dirty, snap)
                    ]
                ),
                snap.key_cols,
                snap.order_cols[0],
                types,
            )
            changed = changed.unionByName(
                resolved.where(F.col(LSN_COL) > wm).select(*df.columns)
            )
        cols = [
            *[
                c
                for c in df.columns
                if c not in (LSN_COL, DELETED_COL, SUB_COL)
            ],
            F.when(
                F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("delete")
            )
            .otherwise(F.lit("upsert"))
            .alias("_change_type"),
            F.col(LSN_COL).alias("_lsn"),
        ]
        if not with_version:
            return changed.select(*cols)
        # a row with lsn L was applied by the first version whose
        # watermark reached L; watermarks are monotone, so the window's
        # (prev_wm, wm] ranges partition the LSN line and each changed
        # row matches exactly one range
        # windows inside the inline tail attribute with zero extra
        # reads; only a window reaching past the tail pays O(segments)
        wm_line = snap.wm_history
        if wm_line and snap.wm_segments and (
            from_version < wm_line[0][0]
        ):
            wm_line = self._full_wm_history(snap)
        if wm_line:
            hist = [
                (v, w)
                for v, w in wm_line
                if from_version < v <= snap.version
            ]
        else:  # legacy manifest: walk surviving version files
            hist = []
            for v in range(from_version + 1, snap.version + 1):
                try:
                    hist.append((v, self.snapshot(v).watermark_lsn))
                except FileNotFoundError:
                    continue
        ranges, prev_wm = [], wm
        for v, v_wm in hist:
            if v_wm > prev_wm:
                ranges.append((v, prev_wm, v_wm))
                prev_wm = v_wm
        out = changed.select(*cols)
        if not ranges:
            return out.withColumn(
                "_commit_version", F.lit(None).cast("int")
            )
        rdf = self.spark.createDataFrame(
            ranges, "_cv int, _cv_lo long, _cv_hi long"
        )
        return (
            out.join(
                F.broadcast(rdf),
                (F.col("_lsn") > F.col("_cv_lo"))
                & (F.col("_lsn") <= F.col("_cv_hi")),
                "left",
            )
            .withColumn("_commit_version", F.col("_cv"))
            .drop("_cv", "_cv_lo", "_cv_hi")
        )

    # ----------------------------------------------------------- writes --
    def _cores(self) -> int:
        return int(self.spark.conf.get("spark.sql.shuffle.partitions", "16"))

    def _write_files(
        self,
        df: DataFrame,
        version: int,
        n_buckets_touched: int,
        write_partitions: int | None = None,
        bucket_volume: dict[int, int] | None = None,
        props: dict[str, Any] | None = None,
        epoch: int = 0,
        ts_col: str | None = None,
        sort_cols: Sequence[str] | None = None,
        key_col: str | None = None,
    ) -> list[dict[str, Any]]:
        """Write df (which must carry _BUCKET) under a fresh commit dir
        and return [{path, bucket, rows, min_lsn, max_lsn, min_ts,
        max_ts, min_key, max_key, epoch}] for the manifest (``epoch`` records which
        rename/drop epoch's physical column names the files carry — see
        Snapshot.epoch; ``ts_col`` is the event-time column whose
        footer min/max feed ``read(ts_range=...)`` file skipping).

        Skew-aware write planning: when ``bucket_volume`` (expected rows
        per bucket — existing + incoming, known exactly from manifest
        row counts + the batch stats pass) is provided, each bucket gets
        ceil(volume / target_rows_per_task) salt slots, so a hot
        conversation's bucket is written by proportionally many tasks
        while cold buckets stay one-file-per-bucket. Without stats, one
        partition per touched bucket. File->bucket purity is preserved
        either way (partitionBy on the bucket), which is what keeps
        merge-time partition pruning exact.

        Table write properties (``props``, normally the snapshot's):
        ``write.target-file-rows`` caps expected rows per file — a
        bucket whose volume exceeds it is salted into proportionally
        many files even on an unskewed write (a 100-TB table wants
        bounded file sizes, not one giant file per bucket; the
        reference's DeltaLoader stores the analogous max_rows_per_file
        and never applies it, /root/reference/src/load/delta.rs:62-69).
        ``write.compression`` picks the parquet codec (snappy default,
        zstd/gzip/...). ``write.distribution-mode`` = ``hash`` (default:
        hash partition + LSN-salt splitting, splits hot single keys) or
        ``range`` (Iceberg range distribution: repartitionByRange on
        (bucket, sort keys) — files get tight disjoint key bounds, so
        min_key/max_key file pruning works inside multi-file buckets).

        ``sort_cols`` (normally the snapshot's key columns via
        ``_sort_order``, Iceberg WRITE ORDERED BY parity): rows are
        sorted WITHIN each write task before hitting parquet, so every
        row group's min/max stats on the keys are tight ranges instead
        of the whole key space — a pushed key-equality predicate (point
        lookup) then skips row groups inside a big bucket's files, and
        sorted keys dictionary/RLE-compress better. Costs one in-task
        sort per written bucket (no extra shuffle: sortWithinPartitions
        rides the existing repartition); disable per table with
        ``write.sort-order = none``."""
        props = props or {}
        target_rows = props.get("write.target-file-rows")
        compression = props.get("write.compression")
        dist_mode = str(props.get("write.distribution-mode", "hash"))
        # scale-adaptive parallelism floor: splitting a write below this
        # many rows per task costs more in task scheduling, parquet
        # writer setup and tiny output files than the parallelism buys
        # (a 15k-row batch salted across 32 cores is 34 files of ~450
        # rows). Only binds when the batch is smaller than cores x floor
        # — a production-scale write always clears it. Explicit
        # write.target-file-rows still wins below (file-size control is
        # the caller's call).
        min_task_rows = int(
            os.environ.get("ETL_WRITE_MIN_TASK_ROWS", "4096")
        )
        # unique per write ATTEMPT, not per version: two writers racing
        # the same slot must never share a staging dir — a shared dir
        # lets one clobber the other's _temporary output and, worse,
        # lets the winner's manifest glob up the loser's files
        commit_dir = os.path.join(
            self.data_dir, f"commit-{version:08d}-{uuid.uuid4().hex[:8]}"
        )
        wp = max(write_partitions or max(n_buckets_touched, 1), 1)
        if dist_mode == "range":
            # Iceberg write.distribution-mode=range: range-partition on
            # (bucket, sort keys) instead of hash+LSN-salt. Each file
            # then covers a NARROW, largely disjoint key interval, so
            # the manifest's min_key/max_key prune files for lookups
            # even inside a multi-file bucket (hash-salted splits each
            # span the whole key range — bounds can't discriminate).
            # Spark samples the data to pick boundaries, so partition
            # row counts self-balance without the manual salt math.
            # Tradeoff vs hash mode: rows EQUAL on all range keys stay
            # in one partition, so a single conversation hotter than
            # target-file-rows cannot be split across writers — keep
            # hash mode for extreme single-key skew, range mode for
            # read-heavy tables.
            if bucket_volume:
                wp = max(wp, self._cores())
                total = sum(bucket_volume.values()) or 1
                target = max(total // wp, min_task_rows, 1)
                if target_rows:
                    target = min(target, int(target_rows))
                needed = (total + target - 1) // target
                # a small batch gets exactly the partitions it needs —
                # range-partitioning 15k rows 32 ways schedules 32
                # writer tasks for 32 tiny files; at scale needed >= wp
                # and the rule is unchanged
                wp = min(needed, 4096) if needed < wp else max(
                    wp, min(needed, 4096)
                )
                wp = max(wp, 1)
            range_cols = [F.col(_BUCKET)] + [
                F.col(c) for c in (sort_cols or []) if c in df.columns
            ]
            # repartitionByRange SAMPLES its input to pick boundaries —
            # without a cache that is one full extra computation of the
            # merge's fold leg (scan existing + resolve) before the
            # write job recomputes it again. Persist for the write's
            # lifetime; released right after the write job below.
            from pyspark import StorageLevel

            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            range_cached = df
            shuffled = df.repartitionByRange(wp, *range_cols)
        elif bucket_volume:
            wp = max(wp, self._cores())
            total = sum(bucket_volume.values()) or 1
            target = max(total // wp, min_task_rows, 1)
            salt_cap = wp
            if target_rows:
                target = min(target, int(target_rows))
                # file-size control may legitimately need more files
                # than cores; still bounded per bucket
                salt_cap = max(wp, 2048)
            salt_n = {
                b: max(min((v + target - 1) // target, salt_cap), 1)
                for b, v in bucket_volume.items()
            }
            # every salt slot needs its own shuffle partition, else the
            # slots of one bucket coalesce back into a single file;
            # MORE partitions than slots buys nothing (parallelism is
            # bounded by the distinct (bucket, salt) combos), so a
            # small batch gets its slot count instead of `cores` empty
            # writer tasks
            slots = sum(salt_n.values())
            wp = min(slots, 4096) if slots < wp else max(
                wp, min(slots, 4096)
            )
            wp = max(wp, 1)
            if any(n > 1 for n in salt_n.values()):
                salt_map = F.create_map(
                    *[
                        F.lit(x)
                        for kv in salt_n.items()
                        for x in kv
                    ]
                )
                salt = F.pmod(
                    F.xxhash64(F.col(LSN_COL)),
                    F.coalesce(F.element_at(salt_map, F.col(_BUCKET)), F.lit(1)),
                )
                shuffled = df.repartition(wp, F.col(_BUCKET), salt)
            else:
                shuffled = df.repartition(wp, F.col(_BUCKET))
        else:
            shuffled = df.repartition(wp, F.col(_BUCKET))
        if sort_cols:
            shuffled = shuffled.sortWithinPartitions(
                _BUCKET, *[c for c in sort_cols if c in df.columns]
            )
        t_w = time.monotonic()
        writer = shuffled.write.partitionBy(_BUCKET).mode("overwrite")
        if compression:
            writer = writer.option("compression", compression)
        # Iceberg parity: write.parquet.bloom-filter-enabled.column.<c>
        # (+ -fpp/-ndv variants) plant a PARQUET-NATIVE bloom filter in
        # every row group of column <c> — the reader's row-group filter
        # then skips groups a pushed equality predicate cannot match,
        # pruning INSIDE files the manifest-level stats had to keep
        _BF = "write.parquet.bloom-filter-"
        for pk, pv in props.items():
            if pk.startswith(_BF + "enabled.column."):
                writer = writer.option(
                    f"parquet.bloom.filter.enabled#{pk[len(_BF) + 15:]}",
                    str(pv).lower(),
                )
            elif pk.startswith(_BF + "fpp.column."):
                writer = writer.option(
                    f"parquet.bloom.filter.fpp#{pk[len(_BF) + 11:]}", str(pv)
                )
            elif pk.startswith(_BF + "ndv.column."):
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{pk[len(_BF) + 11:]}",
                    str(pv),
                )
        try:
            writer.parquet(commit_dir)
        finally:
            if dist_mode == "range":
                range_cached.unpersist()
        t_f = time.monotonic()
        paths = glob.glob(os.path.join(commit_dir, f"{_BUCKET}=*", "*.parquet"))
        if not paths:
            # empty input (possible on a deferred-stats seed merge of an
            # empty batch): nothing to register, drop the bare staging dir
            import shutil

            shutil.rmtree(commit_dir, ignore_errors=True)
            return []
        stats = _footer_stats_many(paths, ts_col, key_col)
        blooms = self._key_blooms(paths, key_col, props)
        if os.environ.get("ETL_DEBUG_MERGE"):
            print(
                f"[write] job: {t_f-t_w:.1f}s footers({len(paths)}): "
                f"{time.monotonic()-t_f:.1f}s wp={wp}"
            )
        out = []
        for p in paths:
            b = int(p.split(f"{_BUCKET}=")[1].split(os.sep)[0])
            out.append(
                {
                    "path": p,
                    "bucket": b,
                    "epoch": epoch,
                    **stats[p],
                    **blooms.get(p, {}),
                }
            )
        return out

    def _key_blooms(
        self,
        paths: list[str],
        key_col: str | None,
        props: dict[str, Any],
    ) -> dict[str, dict[str, Any]]:
        """Per-file key bloom for the manifest (opt-in table property
        ``write.key-bloom.bits``): one distributed pass over the
        just-written files' KEY COLUMN (column-pruned scan) collects,
        per file, the set positions ``pmod(xxhash64(key, i), bits)``
        for i < _KB_K; the driver packs them into a bits/8-byte bitmap
        stored base64 in the file's manifest entry.

        What it buys at scale: under the default hash distribution a
        hot bucket's many files all span the full key range, so
        min_key/max_key can't discriminate between them — the bloom
        skips files that definitely lack the key WITHOUT opening them
        (manifest-level, like Iceberg's puffin/ndv sketches feeding
        scan planning). Costs one O(batch) single-column job per
        commit, so it stays opt-in for read-heavy tables; probe hashes
        use the same Spark xxhash64 family, computed in lookup()'s
        existing micro-job."""
        bits = int(props.get("write.key-bloom.bits", 0) or 0)
        if bits <= 0 or not key_col or not paths:
            return {}
        import base64
        from urllib.parse import unquote, urlparse

        pos = F.array(
            *[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(bits))
                for i in range(_KB_K)
            ]
        )
        rows = (
            self.spark.read.parquet(*paths)
            .select(F.input_file_name().alias("f"), F.explode(pos).alias("p"))
            .groupBy("f")
            .agg(F.collect_set("p").alias("ps"))
            .collect()
        )
        out: dict[str, dict[str, Any]] = {}
        for r in rows:
            bm = bytearray((bits + 7) // 8)
            for p in r["ps"]:
                bm[p // 8] |= 1 << (p % 8)
            path = unquote(urlparse(r["f"]).path)
            out[path] = {
                "key_bloom": base64.b64encode(bytes(bm)).decode(),
                "kb_bits": bits,
                "kb_k": _KB_K,
            }
        return out

    def _with_bucket(self, df: DataFrame, snap: Snapshot) -> DataFrame:
        return df.withColumn(_BUCKET, bucket_expr(snap.bucket_col, snap.num_buckets))

    def append(self, df: DataFrame, lsn_col: str | None = None) -> dict[str, Any]:
        """Blind append (reference DeltaLoader Append mode).

        On a sharded table the commit is a group-edit: only the groups
        that RECEIVE new files have their manifests loaded and
        rewritten; every other group's manifest is reused by pointer —
        an append-only ingest on a 10^6-file table never hydrates the
        full file list."""
        snap = self.current()
        out = self._prepare_rows(df, snap, lsn_col)
        new_files = self._write_files(
            self._with_bucket(out, snap),
            snap.version + 1,
            snap.num_buckets,
            props=snap.props,
            epoch=snap.epoch,
            ts_col=snap.order_cols[0],
            sort_cols=_sort_order(snap),
            key_col=snap.bucket_col,
        )
        lazy = (
            "files" not in snap.__dict__
            and snap.__dict__.get("_files_loader") is not None
        )
        if lazy:
            by_path = {m["group"]: m["path"] for m in snap.manifest_list}
            edits: dict[str, list[dict[str, Any]]] = {}
            for f in new_files:
                gk = _group_key(f, snap)
                if gk not in edits:
                    edits[gk] = (
                        _load_manifest(self.meta_dir, by_path[gk])
                        if gk in by_path
                        else []
                    )
                edits[gk].append(f)
            new = snap.child()
            new.__dict__["_group_edits"] = edits
        else:
            new = snap.child(files=snap.files + new_files)
        new.operation = "append"
        new.__dict__["_data_commit"] = True  # rebase-eligible
        self._commit(new)
        return {"version": new.version, "mode": "append"}

    def add_files(self, paths: Sequence[str]) -> dict[str, Any]:
        """Register EXISTING parquet files into the table without
        reading or rewriting their data — Iceberg's ``add_files`` /
        ``migrate`` procedure, the onboarding path for a pre-existing
        corpus (at 100 TB an import must be a metadata-only commit, not
        a copy). ``paths`` are parquet files or directories (``*.parquet``
        globbed RECURSIVELY; hive-partitioned ``key=value`` layouts are
        rejected — their partition values live in the path, not the
        footers).

        The imported files join the manifest as one coarse group
        (``spec 1, bucket 0`` — a file whose keys were never routed by
        the table's bucket hash covers every bucket, the exact
        representation pre-evolution files already use) and are marked
        ``kind=delta``: reads LWW-resolve them against native files, so
        duplicate keys between the import and the table — or inside the
        import — collapse deterministically, with imported rows taking
        ``_lsn = -1`` (they lose to any genuine stream event at equal
        ts, append()'s convention). The first ``compact()`` (recommended
        immediately after a large import) or any merge touching a
        bucket folds them into properly bucketed, deduplicated base
        files — until then, point lookups still file-skip on the
        imported footers' own ``min_key``/``max_key`` bounds.

        Imported entries are stamped ``external`` and are NEVER deleted
        by ``expire_snapshots`` (the originals belong to the user; the
        same reason Iceberg's add_files docs warn about gc on imported
        locations). ``vacuum_orphans`` only walks the table's own
        directories, so externals are structurally safe there.

        Like ``append``, an import is a BULK load outside the change
        feed: ``changes()`` covers rows applied through ``merge`` (CDC
        events carrying LSNs); imported rows ride at ``_lsn = -1`` and
        never appear in a CDF window (documented contract, pinned by
        tests). Downstream consumers bootstrapping from the feed should
        seed from a full ``read()`` at the import version, exactly as
        they would for an appended backfill. Note the read-side cost
        until the import is folded: a CDF window over an uncompacted
        import LWW-resolves the import's coverage (it is one coarse
        delta group), so run ``compact()`` after large imports before
        resuming high-frequency incremental consumers.

        Every file must physically contain the key and event-time
        columns; other table columns may be absent (null-filled at
        scan, exactly like post-widening reads of old files) and each
        present column's type must be the table's or Iceberg-promotable
        to it (the widening parquet read handles the upcast). Extra
        columns are rejected — evolve the table first (add_column), or
        drop them upstream."""
        snap = self.current()
        files: list[str] = []
        for p in paths:
            if os.path.isdir(p):
                found = sorted(
                    glob.glob(
                        os.path.join(p, "**", "*.parquet"), recursive=True
                    )
                )
                if not found:
                    raise LoadError(
                        f"add_files: no parquet files under {p!r}"
                    )
                for fp in found:
                    # hive-partitioned layouts carry column VALUES in
                    # the directory names, not in the footers — a plain
                    # registration would silently import those columns
                    # as NULL. Reject with the remedy.
                    rel = os.path.relpath(fp, p)
                    if any(
                        "=" in seg for seg in rel.split(os.sep)[:-1]
                    ):
                        raise LoadError(
                            f"add_files: {fp!r} sits in a "
                            f"hive-partitioned layout (key=value "
                            f"directories); its partition values live "
                            f"in the path, not the footers. Read it "
                            f"with spark.read.parquet and append() it, "
                            f"or rewrite it unpartitioned first"
                        )
                files.extend(found)
            elif os.path.exists(p):
                # the same hive-layout guard for an EXPLICITLY passed
                # file: a path-borne key=value partition column would
                # silently import as NULL when it is a nullable table
                # column (ADVICE r05). Inspect the parent directory
                # segments (the filename itself may legitimately
                # contain '=').
                parent_segs = os.path.dirname(os.path.abspath(p)).split(
                    os.sep
                )
                if any("=" in seg for seg in parent_segs):
                    raise LoadError(
                        f"add_files: {p!r} sits in a hive-partitioned "
                        f"layout (key=value directories); its "
                        f"partition values live in the path, not the "
                        f"footers. Read it with spark.read.parquet and "
                        f"append() it, or rewrite it unpartitioned "
                        f"first"
                    )
                files.append(p)
            else:
                raise LoadError(f"add_files: no such path {p!r}")
        if not files:
            raise LoadError("add_files: no parquet files found")
        schema = snap.schema()
        types = {f.name: f.dataType for f in schema.fields}
        reserved = {LSN_COL, DELETED_COL, SUB_COL, _BUCKET}
        required = set(snap.key_cols) | {snap.order_cols[0]}
        # ONE concurrent footer pass yields stats AND physical names
        stats = _footer_stats_many(
            files, snap.order_cols[0], snap.bucket_col, with_names=True
        )
        for p, st in stats.items():
            cols = st.pop("cols")
            missing = required - cols
            if missing:
                raise LoadError(
                    f"add_files: {p!r} lacks required column(s) "
                    f"{sorted(missing)} (table keys + event time must "
                    f"be physically present)"
                )
            bad = cols & reserved
            if bad:
                raise LoadError(
                    f"add_files: {p!r} carries engine-managed "
                    f"column(s) {sorted(bad)}; strip them upstream"
                )
        # merged logical schema of the import vs the table — a second,
        # DISTRIBUTED footer read (Spark mergeSchema): at a 100-TB
        # import the schema union is executor work, not a driver loop
        imp = self.spark.read.option("mergeSchema", "true").parquet(*files)
        for f in imp.schema.fields:
            tt = types.get(f.name)
            if tt is None:
                raise LoadError(
                    f"add_files: column {f.name!r} is not in the table "
                    f"schema; add_column() it first or drop it upstream"
                )
            if f.dataType != tt and not _read_compatible(f.dataType, tt):
                raise LoadError(
                    f"add_files: column {f.name!r} has type "
                    f"{f.dataType.simpleString()} which is neither the "
                    f"table's {tt.simpleString()} nor promotable to it"
                )
        new_files = [
            {
                "path": p,
                "bucket": 0,
                "spec_n": 1,
                "epoch": snap.epoch,
                "kind": "delta",
                "external": True,
                **stats[p],
            }
            for p in files
        ]
        lazy = (
            "files" not in snap.__dict__
            and snap.__dict__.get("_files_loader") is not None
        )
        if lazy:
            by_path = {m["group"]: m["path"] for m in snap.manifest_list}
            gk = _group_key(new_files[0], snap)
            prior = (
                _load_manifest(self.meta_dir, by_path[gk])
                if gk in by_path
                else []
            )
            new = snap.child()
            new.__dict__["_group_edits"] = {gk: prior + new_files}
        else:
            new = snap.child(files=snap.files + new_files)
        new.operation = "add-files"
        new.__dict__["_data_commit"] = True  # rebase-eligible
        self._commit(new)
        return {
            "version": new.version,
            "mode": "add-files",
            "files_added": len(new_files),
            "rows_added": int(
                sum(s.get("rows") or 0 for s in stats.values())
            ),
        }

    def overwrite(self, df: DataFrame, lsn_col: str | None = None) -> dict[str, Any]:
        """Full replace (reference DeltaLoader Overwrite mode)."""
        snap = self.current()
        out = self._prepare_rows(df, snap, lsn_col)
        new = snap.child(
            files=self._write_files(
                self._with_bucket(out, snap),
                snap.version + 1,
                snap.num_buckets,
                props=snap.props,
                epoch=snap.epoch,
                ts_col=snap.order_cols[0],
                sort_cols=_sort_order(snap),
                key_col=snap.bucket_col,
            ),
        )
        new.operation = "overwrite"
        new.__dict__["_data_commit"] = True  # rebase-eligible
        self._commit(new)
        return {"version": new.version, "mode": "overwrite"}

    def _prepare_rows(
        self, df: DataFrame, snap: Snapshot, lsn_col: str | None
    ) -> DataFrame:
        fields = snap.schema().fields
        cols = [f.name for f in fields]
        types = {f.name: f.dataType for f in fields}
        lsn = F.col(lsn_col).cast("long") if lsn_col else F.lit(-1).cast("long")
        for c in cols:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast(types[c]))
        return df.select(
            *cols,
            lsn.alias(LSN_COL),
            F.lit(False).alias(DELETED_COL),
            F.lit(0).cast("int").alias(SUB_COL),
        )

    # ------------------------------------------------------ maintenance --
    def expire_snapshots(
        self, keep_last: int = 5, distributed: bool = False
    ) -> dict[str, Any]:
        """Drop old snapshot manifests and delete data files referenced
        ONLY by them (Iceberg expire_snapshots). Time travel remains
        available for the kept window; versions pinned by a REF — a tag
        (``create_tag``) or any branch's tip (``create_branch``) — are
        kept, with their files, regardless of age, exactly like Iceberg
        refs gate snapshot expiry. Tags are per-branch metadata, so the
        union of every tip's refs is protected.

        Refs created with ``max_age_ms`` (Iceberg's max-ref-age-ms) are
        DROPPED here first once the snapshot they point to is older
        than their limit — aged branches/tags stop pinning history, the
        un-aged ones keep the full contract above.

        ``distributed=True`` is the 100-TB shape (Iceberg's
        expire_snapshots Spark action): executors parse the live and
        dead-only manifests, the files-to-delete set is a left-anti
        join, and the deletes themselves run in executor tasks — the
        driver holds only O(manifests) paths and a per-partition delete
        count, never the file list. That matters exactly when expiry is
        biggest: right after a full-table compaction, the dead-only
        manifests hold every pre-compaction file."""
        dropped_refs: list[str] = []
        now_ms = int(time.time() * 1000)
        rr = self._head_snapshot().ref_retention
        if rr:
            for b, tip in list(self.branches().items()):
                ms = rr.get(f"branch:{b}")
                if ms is None or b in ("main", self._branch):
                    continue
                try:
                    committed = self.snapshot(int(tip)).committed_at_ms
                except FileNotFoundError:
                    continue
                if now_ms - committed > ms:
                    self._commit(
                        self.current().child(operation="expire-refs"),
                        branch_edits={b: None},
                    )
                    dropped_refs.append(f"branch:{b}")
            snap = self.current()
            aged_tags = []
            for tname, pinned in snap.refs.items():
                ms = rr.get(f"tag:{tname}")
                if ms is None:
                    continue
                try:
                    committed = self.snapshot(int(pinned)).committed_at_ms
                except FileNotFoundError:
                    continue
                if now_ms - committed > ms:
                    aged_tags.append(tname)
            if aged_tags:
                refs = {
                    k: v for k, v in snap.refs.items() if k not in aged_tags
                }
                child = snap.child(refs=refs, operation="expire-refs")
                child.__dict__["_ref_retention_edits"] = {
                    f"tag:{t}": None for t in aged_tags
                }
                self._commit(child)
                dropped_refs += [f"tag:{t}" for t in aged_tags]
        tips = _tips(self._head_snapshot())
        versions = sorted(
            int(p.split("version-")[1].split(".")[0])
            for p in glob.glob(os.path.join(self.meta_dir, "version-*.json"))
        )
        keep = set(versions[-keep_last:]) | {int(v) for v in tips.values()}
        for tv in set(tips.values()):
            keep |= {int(v) for v in self.snapshot(int(tv)).refs.values()}
        # each unique manifest is loaded at most ONCE: live data paths
        # come from manifests any kept snapshot references; candidate-
        # dead paths only from manifests referenced exclusively by
        # expired snapshots (files in a shared manifest are live by
        # construction). Legacy inline-files snapshots contribute
        # directly.
        live: set[str] = set()
        live_meta: set[str] = set()  # manifest + wm-segment files kept
        for v in keep:
            s = self.snapshot(v)
            live_meta.update(m["path"] for m in s.manifest_list)
            live_meta.update(s.wm_segments)
            if not s.manifest_list:
                live.update(f["path"] for f in s.files)
        dead_meta: set[str] = set()
        dead_candidates: set[str] = set()
        expired_snaps = [self.snapshot(v) for v in versions if v not in keep]
        for s in expired_snaps:
            dead_meta.update(m["path"] for m in s.manifest_list)
            dead_meta.update(s.wm_segments)
            if not s.manifest_list:
                # external (add_files-imported) files are the user's —
                # never deletion candidates, even once dead
                dead_candidates.update(
                    f["path"] for f in s.files if not f.get("external")
                )
        live_mf = [
            r for r in live_meta if r.split("/")[-1].startswith("mf-")
        ]
        dead_mf = [
            r
            for r in dead_meta - live_meta
            if r.split("/")[-1].startswith("mf-")
        ]
        if distributed:
            removed_files = self._expire_delete_distributed(
                live_mf, dead_mf, live, dead_candidates
            )
        else:
            for rel in live_mf:
                live.update(
                    e["path"] for e in _load_manifest(self.meta_dir, rel)
                )
            for rel in dead_mf:
                dead_candidates.update(
                    e["path"]
                    for e in _load_manifest(self.meta_dir, rel)
                    if not e.get("external")
                )
            removed_files = 0
            for path in dead_candidates - live:
                if os.path.exists(path):
                    os.remove(path)
                    removed_files += 1
        for v in versions:
            if v not in keep:
                os.remove(
                    os.path.join(self.meta_dir, f"version-{v:08d}.json")
                )
        # manifest files referenced ONLY by expired snapshots go with
        # them (Iceberg expire_snapshots deletes unreferenced manifests
        # the same way); wm-history segments are retained while any
        # surviving snapshot lists them
        removed_manifests = 0
        for rel in dead_meta - live_meta:
            p = os.path.join(self.meta_dir, rel)
            if os.path.exists(p):
                os.remove(p)
                removed_manifests += 1
        return {
            "expired_versions": len(versions) - len(keep),
            "files_deleted": removed_files,
            "manifests_deleted": removed_manifests,
        }

    def _manifest_paths_df(
        self,
        mf_rel: Sequence[str],
        inline: Sequence[str],
        include_external: bool = True,
    ) -> DataFrame | None:
        """Distributed DF of suffix-normalized data-file paths from the
        given manifest files (parsed on executors) plus any
        legacy-inline paths; the suffix (last three path components,
        uuid-bearing — ``commit-<uuid>/__b=N/part-<uuid>.parquet``) is
        collision-free and invariant to how the table root was spelled
        when each writer opened it. None when both inputs are empty."""
        sfx = lambda c: F.substring_index(c, "/", -3)  # noqa: E731
        out = None
        if mf_rel:
            raw = (
                self.spark.read.schema(
                    "files array<struct<path:string,external:boolean>>"
                )
                .option("multiLine", True)
                .json(
                    [os.path.join(self.meta_dir, r) for r in sorted(mf_rel)]
                )
            )
            exploded = raw.select(F.explode("files").alias("f"))
            if not include_external:
                # external (add_files) entries are the user's files —
                # never DELETION candidates. They stay in LIVE sets
                # (include_external=True) so liveness joins still
                # protect an import that happens to sit under the
                # table root.
                exploded = exploded.where(
                    ~F.coalesce(F.col("f.external"), F.lit(False))
                )
            out = exploded.select(
                sfx(F.col("f.path")).alias("sfx"),
                F.col("f.path").alias("path"),
            )
        if inline:
            idf = self.spark.createDataFrame(
                [(x,) for x in inline], "p string"
            ).select(sfx(F.col("p")).alias("sfx"), F.col("p").alias("path"))
            out = idf if out is None else out.unionAll(idf)
        return out

    def _expire_delete_distributed(
        self,
        live_mf: Sequence[str],
        dead_mf: Sequence[str],
        live_inline: set[str],
        dead_inline: set[str],
    ) -> int:
        """Delete dead-only data files as a Spark action: dead-manifest
        entries anti-joined against every kept snapshot's entries, the
        surviving doomed paths deleted inside executor tasks (only a
        per-partition count returns to the driver)."""
        dead_df = self._manifest_paths_df(
            dead_mf, sorted(dead_inline), include_external=False
        )
        if dead_df is None:
            return 0
        live_df = self._manifest_paths_df(live_mf, sorted(live_inline))
        doomed = dead_df
        if live_df is not None:
            doomed = dead_df.join(
                live_df.select("sfx"), on="sfx", how="left_anti"
            )
        # a path can ride several dead manifests (carried forward
        # across snapshots): dedupe before deleting so the count is
        # exact
        doomed = doomed.select("path").distinct()

        def rm(rows):
            import os as _os

            n = 0
            for r in rows:
                try:
                    _os.remove(r["path"])
                    n += 1
                except FileNotFoundError:
                    pass
            yield n

        return sum(doomed.rdd.mapPartitions(rm).collect())

    def vacuum_orphans(
        self,
        older_than_s: float = 3 * 3600,
        distributed: bool = False,
    ) -> dict[str, Any]:
        """Delete data files referenced by NO snapshot (Iceberg
        remove_orphan_files): a writer that crashed between
        _write_files and _commit leaves its files on disk but in no
        manifest — invisible to readers, but they accumulate. Safe
        against every retained snapshot (expire_snapshots first if old
        manifests should stop pinning files).

        ``older_than_s`` skips unreferenced files younger than the
        threshold: an IN-FLIGHT writer between _write_files and _commit
        has exactly such files on disk, and deleting them would corrupt
        its imminent commit (Iceberg's remove_orphan_files defaults to
        older-than-3-days for the same reason). Pass 0 only when no
        writer can be running.

        ``distributed=True`` is the 100-TB shape — exactly how
        Iceberg's remove_orphan_files runs as a Spark action: the
        storage LISTING is a parallelized walk over the table's
        commit directories, the LIVE set comes from executors parsing
        the manifest files (no driver-side file-list hydration — the
        driver never holds more than O(groups) manifest paths), and
        liveness is a left-anti join. Only the orphan rows — crash
        residue, small by construction — are collected and deleted.
        The join key is the path's last three components
        (``commit-<uuid>/__b=N/part-<uuid>.parquet``), which is
        collision-free by the uuids and invariant to how the table
        root was spelled when each writer opened it."""
        live_meta: set[str] = set()
        removed = skipped_young = 0
        cutoff = time.time() - older_than_s
        if distributed:
            mf_rel: set[str] = set()
            inline: list[str] = []
            for p in glob.glob(os.path.join(self.meta_dir, "version-*.json")):
                v = int(p.split("version-")[1].split(".")[0])
                s = self.snapshot(v)
                if s.manifest_list:
                    mf_rel.update(m["path"] for m in s.manifest_list)
                else:  # legacy inline-files snapshot: paths ride the JSON
                    inline.extend(f["path"] for f in s.files)
                live_meta.update(m["path"] for m in s.manifest_list)
                live_meta.update(s.wm_segments)

            def sfx(c: F.Column) -> F.Column:
                return F.substring_index(c, "/", -3)

            df = self._manifest_paths_df(sorted(mf_rel), inline)
            live_df = None if df is None else df.select("sfx")
            root = os.path.abspath(self.data_dir)
            subdirs = sorted(
                e.path for e in os.scandir(root) if e.is_dir()
            )

            def walk(dirs):
                import os as _os

                for d in dirs:
                    for dirpath, _unused, names in _os.walk(d):
                        for n in names:
                            if not n.endswith(".parquet"):
                                continue
                            p = _os.path.join(dirpath, n)
                            try:
                                yield (p, _os.path.getmtime(p))
                            except OSError:
                                pass  # raced with a concurrent delete

            loose = [  # parquet directly under data/: never written by
                # the engine, but the driver path would see them
                (e.path, os.path.getmtime(e.path))
                for e in os.scandir(root)
                if e.is_file() and e.name.endswith(".parquet")
            ]
            if subdirs or loose:
                listed = self.spark.createDataFrame(
                    self.spark.sparkContext.parallelize(
                        subdirs, max(1, len(subdirs))
                    ).mapPartitions(walk),
                    "path string, mtime double",
                )
                if loose:
                    listed = listed.unionAll(
                        self.spark.createDataFrame(
                            loose, "path string, mtime double"
                        )
                    )
                listed = listed.select(
                    "path", "mtime", sfx(F.col("path")).alias("sfx")
                )
                if live_df is not None:
                    orphans = listed.join(live_df, on="sfx", how="left_anti")
                else:
                    orphans = listed
                for r in orphans.select("path", "mtime").collect():
                    if r["mtime"] > cutoff:
                        skipped_young += 1
                        continue
                    try:
                        os.remove(r["path"])
                        removed += 1
                    except FileNotFoundError:
                        pass
        else:
            live: set[str] = set()
            for p in glob.glob(os.path.join(self.meta_dir, "version-*.json")):
                v = int(p.split("version-")[1].split(".")[0])
                s = self.snapshot(v)
                live.update(f["path"] for f in s.files)
                live_meta.update(m["path"] for m in s.manifest_list)
                live_meta.update(s.wm_segments)
            live_abs = {os.path.abspath(x) for x in live}
            for p in glob.glob(
                os.path.join(self.data_dir, "**", "*.parquet"),
                recursive=True,
            ):
                if os.path.abspath(p) in live_abs:
                    continue
                try:
                    if os.path.getmtime(p) > cutoff:
                        skipped_young += 1
                        continue
                    os.remove(p)
                    removed += 1
                except FileNotFoundError:
                    pass
        # manifest/segment files referenced by NO snapshot: residue of a
        # writer that crashed between _shard_manifests and _commit. Same
        # age gate — an in-flight writer has exactly such files.
        removed_manifests = 0
        live_meta_abs = {
            os.path.abspath(os.path.join(self.meta_dir, r))
            for r in live_meta
        }
        for p in glob.glob(os.path.join(self.meta_dir, "manifests", "*.json")):
            if os.path.abspath(p) in live_meta_abs:
                continue
            try:
                if os.path.getmtime(p) > cutoff:
                    skipped_young += 1
                    continue
                os.remove(p)
                removed_manifests += 1
            except FileNotFoundError:
                pass
        return {
            "orphans_deleted": removed,
            "skipped_young": skipped_young,
            "orphan_manifests_deleted": removed_manifests,
        }

    def compact(
        self,
        tombstone_lsn_horizon: int | None = None,
        buckets: Sequence[int] | None = None,
    ) -> dict[str, Any]:
        """Rewrite buckets into fresh base files (small-file
        compaction), folding away any merge-on-read delta files —
        ``read(include_meta=True)`` already returns the resolved one-row
        -per-key state, so compaction of a delta-carrying bucket is
        exactly Iceberg's RewriteDataFiles over a v2 MOR table.
        Optionally drops tombstones whose lsn <= horizon — safe once no
        replay can deliver events at or below that LSN (e.g. the
        stream's committed watermark). ``buckets`` restricts the rewrite
        to those buckets (targeted maintenance: fold only the dirty
        ones); the rest keep their files. A new snapshot is committed
        atomically; concurrent readers keep their snapshot."""
        snap = self.current()
        sel = None if buckets is None else set(buckets)
        # targeted compact on a sharded table stays O(selected buckets)
        # in the metadata plane: a group's files all share its
        # (spec, bucket), so group-level overlap IS file-level overlap
        # — only the selected groups' manifests are ever loaded, and
        # the commit below reuses every other group's manifest by
        # pointer (the StreamDriver's compact_every maintenance never
        # pays an O(table-files) metadata read)
        lazy = (
            sel is not None
            and "files" not in snap.__dict__
            and snap.__dict__.get("_files_loader") is not None
        )
        if lazy:
            target = []
            for m in snap.manifest_list:
                if _file_overlaps(m, sel, snap):
                    target.extend(_load_manifest(self.meta_dir, m["path"]))
        else:
            target = [
                f
                for f in snap.files
                if sel is None or _file_overlaps(f, sel, snap)
            ]
        if not target:
            return {"version": snap.version, "skipped": True}
        touched = sorted(
            {b for f in target for b in _expand_to_current(f, snap)}
        )
        # scan the target FILES directly (not read(buckets=...)): a
        # pre-evolution file overlapping the selection is rewritten
        # WHOLE — its sibling buckets' rows migrate to current-spec
        # files here, which is exactly how compaction finishes a
        # bucket-spec evolution
        df = self._resolved_scan(snap, target, include_meta=True)
        if tombstone_lsn_horizon is not None:
            df = df.where(
                ~F.coalesce(F.col(DELETED_COL), F.lit(False))
                | (F.col(LSN_COL) > tombstone_lsn_horizon)
            )
        out = self._with_bucket(df, snap)
        # default: one file per bucket. With write.target-file-rows set,
        # manifest row counts give per-bucket volume so the compacted
        # output honors the file-size cap instead (delta rows overcount
        # resolved state — an overestimate only splits a file early).
        vol: dict[int, int] | None = None
        if snap.props.get("write.target-file-rows"):
            vol = {}
            for f in target:
                dests = _expand_to_current(f, snap)
                share = max(f.get("rows", 0) // len(dests), 1)
                for b in dests:
                    vol[b] = vol.get(b, 0) + share
        new_files = self._write_files(
            out,
            snap.version + 1,
            len(touched),
            bucket_volume=vol,
            props=snap.props,
            epoch=snap.epoch,
            ts_col=snap.order_cols[0],
            sort_cols=_sort_order(snap),
            key_col=snap.bucket_col,
        )
        if lazy:
            # selected groups are fully rewritten (emptied); compacted
            # output lands in its current-spec groups — possibly ones
            # not selected, when a coarser old-spec file's sibling rows
            # migrate (the delta-append case loads that group's prior
            # entries once)
            edits: dict[str, list[dict[str, Any]]] = {
                m["group"]: []
                for m in snap.manifest_list
                if _file_overlaps(m, sel, snap)
            }
            by_path = {m["group"]: m["path"] for m in snap.manifest_list}
            for f in new_files:
                gk = _group_key(f, snap)
                if gk not in edits:
                    edits[gk] = (
                        _load_manifest(self.meta_dir, by_path[gk])
                        if gk in by_path
                        else []
                    )
                edits[gk].append(f)
            new_snap = snap.child()
            new_snap.__dict__["_group_edits"] = edits
        else:
            target_paths = {f["path"] for f in target}
            new_snap = snap.child(
                files=[f for f in snap.files if f["path"] not in target_paths]
                + new_files,
            )
        new_snap.operation = "compact"
        new_snap.__dict__["_data_commit"] = True  # rebase-eligible
        self._commit(new_snap)
        return {
            "version": new_snap.version,
            "buckets": touched,
            "files_before": len(target),
            "files_after": len(new_files),
        }

    # ------------------------------------------------------------ merge --
    def merge(
        self,
        winners: DataFrame,
        run_id: str | None = None,
        batch_id: int | None = None,
        op_col: str = _OP,
        lsn_col: str = "lsn",
        write_partitions: int | None = None,
        batch_stats: dict[str, Any] | None = None,
        mode: str | None = None,
        sub_lsn: int = 1,
        operation: str = "merge",
    ) -> dict[str, Any]:
        """Key-partitioned LWW MERGE (the real version of the reference's
        stubbed write_merge, /root/reference/src/load/delta.rs:255-267).

        ``winners`` must hold at most one row per key (run lww_dedup
        first) with columns: key_cols + op_col (I|U|D) + order cols +
        payload. Semantics per key:
          incoming (ts,lsn) >  stored (ts,_lsn): op D deletes, I/U upserts
          incoming (ts,lsn) <= stored           : no-op (idempotent replay)
        New payload columns widen the schema in place (additive
        evolution), and an existing column arriving with an
        Iceberg-promotable wider type (int->long, float->double,
        decimal precision growth) promotes the table column in place
        (see _promote_type); deletes resurrect if a later-LSN insert
        follows.

        ``mode`` (or the table property ``write.merge.mode``):
        ``copy-on-write`` (default) folds incoming winners with every
        affected bucket's current state and rewrites those buckets —
        write amplification O(state of touched buckets) per batch, zero
        read amplification. ``merge-on-read`` appends the batch winners
        as per-bucket DELTA files instead — write cost O(batch), with
        per-key LWW resolution deferred to ``read()``/``changes()``/
        compaction (the Iceberg v2 merge-on-read pattern). Read
        amplification stays bounded: a bucket whose delta-file count
        would exceed ``write.delta.max-files`` (default 8) is folded
        inline in the same commit (per-bucket copy-on-write fallback),
        so no scheduler is needed and steady state rewrites each
        bucket's base at most every max-files batches instead of every
        batch.

        ``batch_stats`` (optional): precomputed per-bucket source stats,
        ``{"bucket_counts": {bucket: n_rows}, "hi_lsn": int}`` — e.g.
        from cdc.normalize.prescan_batch, whose single job over the raw
        envelope already knows them. When given, the merge skips its own
        stats aggregation, so the whole apply makes exactly one full
        pass over the batch (the write job). Counts may be upstream
        *event* counts rather than winner counts — they only steer the
        skew-aware write plan, where an overestimate is safe.

        ``sub_lsn``: the hidden tie-break tier persisted on incoming
        rows (see SUB_COL). Stream merges keep the default 1; row DML
        (delete_where/update_where) passes 0, so a genuine binlog event
        later arriving with the DML's borrowed (ts, lsn) coordinates
        wins instead of being dropped as idempotent replay.
        """
        t0 = time.monotonic()
        snap = self.current()

        # -- exactly-once: skip microbatches this table already committed
        if run_id is not None and batch_id is not None:
            if snap.applied.get(run_id, -1) >= batch_id:
                return {
                    "version": snap.version,
                    "skipped": True,
                    "reason": f"batch {batch_id} already applied for {run_id}",
                }

        schema = snap.schema()
        table_cols = [f.name for f in schema.fields]
        ts_col = snap.order_cols[0]

        # -- additive schema evolution: widen with new incoming columns
        reserved = {op_col, lsn_col, _BUCKET, LSN_COL}
        incoming_payload = [
            f for f in winners.schema.fields if f.name not in reserved
        ]
        new_fields = [f for f in incoming_payload if f.name not in table_cols]
        # -- in-place type promotion: an existing column arriving with an
        # Iceberg-promotable wider type (int->long, float->double,
        # decimal precision growth) widens the table column rather than
        # down-casting the incoming values. Non-promotable mismatches
        # keep the table type (incoming is cast to it below), matching
        # Iceberg's rule that only widening changes the schema.
        promotions = {}
        if incoming_payload:
            by_name = {f.name: f for f in schema.fields}
            for f in incoming_payload:
                cur_f = by_name.get(f.name)
                if cur_f is None:
                    continue
                p = _promote_type(cur_f.dataType, f.dataType)
                if p is not None:
                    promotions[f.name] = p
        # the BUCKET column's type is load-bearing for every hash in the
        # table: bucket routing (bucket_expr), manifest key blooms, and
        # lookup()'s probe all use Spark xxhash64, which hashes int and
        # long (or float and double) DIFFERENTLY — a promoted bucket
        # column would route the same key to a different bucket than its
        # pre-promotion files and make blooms/bounds silently reject
        # probe hashes (false-negative lookups, split LWW identity).
        # Promotion of the bucket column is therefore rejected outright;
        # migrate by casting upstream and rewriting through overwrite()
        # (Iceberg has the identical constraint: bucket transform hashes
        # are type-specific, so a bucket-partition source column cannot
        # be promoted in place).
        if snap.bucket_col in promotions:
            raise LoadError(
                f"cannot promote bucket column {snap.bucket_col!r} "
                f"in place: bucket hashing (xxhash64) is type-sensitive, "
                f"so existing files' bucket ids, key bounds and blooms "
                f"would no longer match the promoted type; cast the "
                f"stream to the table type upstream, or migrate via a "
                f"full overwrite() under the widened schema"
            )
        if promotions:
            schema = T.StructType(
                [
                    T.StructField(
                        f.name,
                        promotions.get(f.name, f.dataType),
                        f.nullable,
                        f.metadata,
                    )
                    for f in schema.fields
                ]
            )
        if new_fields:
            for f in new_fields:
                schema = schema.add(f.name, f.dataType)
            table_cols = [f.name for f in schema.fields]
        schema_json = json.dumps(schema.jsonValue())
        types = {f.name: f.dataType for f in schema.fields}

        # -- per-bucket source counts + max lsn: taken from the caller's
        # prescan when provided (the CDC apply path — zero extra jobs
        # here), else computed in one tiny aggregation (at most
        # num_buckets result rows; Catalyst prunes the recompute down to
        # the (bucket, lsn) columns). The counts feed the skew-aware
        # write plan; the bucket set drives partition pruning.
        debug = os.environ.get("ETL_DEBUG_MERGE")
        stage_ms: dict[str, int] = {}
        src = self._with_bucket(winners, snap)
        # caller-provided stats are only valid under the bucket spec
        # they were computed with; a set_num_buckets committed between
        # the caller's prescan and this merge would otherwise route the
        # fold/delta split on stale bucket ids (and silently drop rows
        # from both legs). Stats carrying a mismatched spec_n — or none,
        # from a pre-evolution caller — are recomputed here.
        if batch_stats is not None and (
            batch_stats.get("spec_n", snap.num_buckets) != snap.num_buckets
        ):
            batch_stats = None
        src_cached = False
        # seed merge into a table with NO data files: the stats job's
        # only pre-write consumers are the affected-bucket set (prunes
        # the current-state scan — there is nothing to scan) and the
        # skew-aware write volumes (file-size splitting — deferred to
        # the explicit write.target-file-rows case, which keeps stats).
        # Everything else (affected set, hi_lsn for the watermark) is
        # read back from the written files' parquet footers, so the
        # whole merge is ONE job over the batch instead of two.
        defer_stats = (
            batch_stats is None
            and not snap.props.get("write.target-file-rows")
            and not snap.manifest_list
            and not snap.files
        )
        if defer_stats:
            incoming_counts = {}
            hi_lsn = None
        elif batch_stats is not None:
            incoming_counts = dict(batch_stats["bucket_counts"])
            hi_lsn = batch_stats.get("hi_lsn")
        else:
            # without caller stats, the stats aggregation AND the write
            # job would each recompute the caller's full winners
            # pipeline (typically a dedup over the raw batch) — cache
            # the bucketed winners for the merge's lifetime instead:
            # O(batch) rows, the batch's smallest representation. The
            # CDC apply path achieves the same sharing by persisting
            # raw_winners and passing batch_stats; this covers direct
            # merge() callers.
            from pyspark import StorageLevel

            src = src.persist(StorageLevel.MEMORY_AND_DISK)
            src_cached = True
            t_stats = time.monotonic()
            stats_rows = (
                src.groupBy(_BUCKET)
                .agg(F.count("*").alias("n"), F.max(F.col(lsn_col)).alias("hi"))
                .collect()
            )
            stage_ms["stats"] = int((time.monotonic() - t_stats) * 1000)
            if debug:
                print(f"[merge] bucket/lsn stats: {time.monotonic()-t_stats:.1f}s")
            incoming_counts = {r[_BUCKET]: r["n"] for r in stats_rows}
            hi_lsn = max((r["hi"] for r in stats_rows), default=None)
        affected = sorted(incoming_counts)
        if not affected and not defer_stats:
            if src_cached:
                src.unpersist()
            return {"version": snap.version, "skipped": True, "reason": "empty batch"}

        try:
            # -- merge-mode routing: which affected buckets FOLD (read
            # current state, resolve, rewrite base) vs take a DELTA append.
            # Copy-on-write folds everything; merge-on-read folds only the
            # buckets whose delta chain would outgrow write.delta.max-files.
            mode = mode or snap.props.get("write.merge.mode", "copy-on-write")
            if mode not in ("copy-on-write", "merge-on-read"):
                raise LoadError(
                    f"unknown merge mode {mode!r} "
                    "(copy-on-write | merge-on-read)"
                )
            # sharded + still-lazy snapshot: the whole merge (routing,
            # current-state selection, and the commit below) runs off
            # manifest summaries + the TOUCHED groups' manifests only —
            # O(touched buckets) driver metadata, never O(table files)
            lazy = (
                "files" not in snap.__dict__
                and bool(snap.manifest_list)
                and snap.__dict__.get("_files_loader") is not None
            )
            if mode == "merge-on-read":
                max_delta = int(snap.props.get("write.delta.max-files", 8))
                n_delta: dict[int, int] = {}
                if lazy:
                    # per-group delta counts ride the manifest list; a
                    # coarse group's count lands on every covered bucket
                    # (overcount folds early — safe)
                    for m in snap.manifest_list:
                        if m.get("deltas"):
                            for b in _expand_to_current(m, snap):
                                n_delta[b] = n_delta.get(b, 0) + m["deltas"]
                else:
                    for f in snap.files:
                        if f.get("kind") == "delta":
                            for b in _expand_to_current(f, snap):
                                n_delta[b] = n_delta.get(b, 0) + 1
                fold = [b for b in affected if n_delta.get(b, 0) + 1 > max_delta]
            else:
                fold = list(affected)
            fold_set = set(fold)
            cold = [b for b in affected if b not in fold_set]
            # deferred-stats seed merge: the affected set is unknown
            # until the write's footers come back — route EVERYTHING
            # down the leg an empty table implies (CoW folds all, MoR
            # delta-appends all; n_delta is empty so no bucket can
            # exceed max_delta) and reconcile fold/cold/affected below.
            fold_all = defer_stats and mode == "copy-on-write"
            cold_all = defer_stats and mode == "merge-on-read"

            # -- current rows of FOLD buckets only (partition pruning);
            # delta-append buckets are never read — that is the point
            # a pre-evolution (coarser-spec) file overlapping the fold set
            # is folded WHOLE: its sibling buckets' rows ride the LWW
            # resolve unopposed and land in current-spec files — merges
            # migrate the table toward the new spec as buckets get touched
            cur_files = [
                f
                for f in self._candidate_files(snap, buckets=fold_set)
                if _file_overlaps(f, fold_set, snap)
            ]
            # scanned under the WIDENED/PROMOTED logical schema, with
            # per-epoch physical-name translation for pre-rename files
            cur = self._scan_files(snap, cur_files, schema=schema)

            def norm(
                df: DataFrame, lsn: F.Column, deleted: F.Column, sub: F.Column
            ) -> DataFrame:
                src_types = {f.name: f.dataType for f in df.schema.fields}
                sel = []
                for c in table_cols:
                    if c in df.columns:
                        # struct-aware alignment: after a nested widening
                        # the incoming struct is narrower than the table's
                        # — plain cast would reject it (field-count rule)
                        sel.append(_align_cast(F.col(c), src_types[c], types[c]).alias(c))
                    else:
                        sel.append(F.lit(None).cast(types[c]).alias(c))
                return df.select(
                    *sel,
                    lsn.cast("long").alias(LSN_COL),
                    deleted.cast("boolean").alias(DELETED_COL),
                    sub.cast("int").alias(SUB_COL),
                )

            existing = norm(
                cur,
                F.col(LSN_COL),
                F.coalesce(F.col(DELETED_COL), F.lit(False)),
                F.coalesce(F.col(SUB_COL), F.lit(0)),
            )
            incoming = norm(
                src, F.col(lsn_col), F.col(op_col) == "D", F.lit(int(sub_lsn))
            )
            _bexpr = bucket_expr(snap.bucket_col, snap.num_buckets)

            t_write = time.monotonic()
            new_files: list[dict[str, Any]] = []
            if fold or fold_all:
                # -- FOLD leg: LWW across {stored row/tombstone, incoming
                # winner} per key — one associative max aggregation (partial
                # map-side combine before the shuffle); AQE handles residual
                # skew. Rewrites the fold buckets' base files; any delta
                # files those buckets carried are resolved away here.
                inc_fold = (
                    incoming if not cold else incoming.where(_bexpr.isin(fold))
                )
                final = _lww_resolve(
                    existing.unionByName(inc_fold), snap.key_cols, ts_col, types
                )
                # expected write volume per bucket = existing rows (manifest
                # footer counts) + incoming winners — drives the skew-aware
                # salt plan
                volume: dict[int, int] = {
                    b: n for b, n in incoming_counts.items() if b in fold_set
                }
                for f in cur_files:
                    dests = _expand_to_current(f, snap)
                    share = max(f.get("rows", 0) // len(dests), 1)
                    for b in dests:
                        volume[b] = volume.get(b, 0) + share
                new_files += self._write_files(
                    self._with_bucket(final, snap),
                    snap.version + 1,
                    snap.num_buckets if fold_all else len(fold),
                    write_partitions,
                    bucket_volume=volume or None,
                    props=snap.props,
                    epoch=snap.epoch,
                    ts_col=snap.order_cols[0],
                    sort_cols=_sort_order(snap),
                    key_col=snap.bucket_col,
                )
            if cold or cold_all:
                # -- DELTA leg: append the batch winners as delta files for
                # the cold buckets without reading their current state.
                # Tombstone payload is nulled on disk (parity with the fold
                # representation); resolution happens at read/compaction.
                delta_rows = (
                    incoming if not fold else incoming.where(_bexpr.isin(cold))
                )
                for c in table_cols:
                    if c in snap.key_cols or c == ts_col:
                        continue
                    delta_rows = delta_rows.withColumn(
                        c,
                        F.when(
                            F.col(DELETED_COL), F.lit(None).cast(types[c])
                        ).otherwise(F.col(c)),
                    )
                # one delta file per touched bucket per batch (the chain the
                # max-files cap counts); volume-driven splitting only when
                # the table caps file sizes explicitly
                dvol = (
                    {b: n for b, n in incoming_counts.items() if b in set(cold)}
                    if snap.props.get("write.target-file-rows")
                    else None
                )
                dfiles = self._write_files(
                    self._with_bucket(delta_rows, snap),
                    snap.version + 1,
                    snap.num_buckets if cold_all else len(cold),
                    None,
                    bucket_volume=dvol,
                    props=snap.props,
                    epoch=snap.epoch,
                    ts_col=snap.order_cols[0],
                    sort_cols=_sort_order(snap),
                    key_col=snap.bucket_col,
                )
                for f in dfiles:
                    f["kind"] = "delta"
                new_files += dfiles
            stage_ms["write"] = int((time.monotonic() - t_write) * 1000)
            if defer_stats:
                # reconcile from the written files' footers: affected =
                # buckets that produced rows, hi_lsn = max footer lsn
                # (identical to the skipped stats job — SQL max and
                # parquet stats both ignore nulls; winners are
                # one-row-per-key so fold output carries the same rows)
                if not new_files:
                    return {
                        "version": snap.version,
                        "skipped": True,
                        "reason": "empty batch",
                    }
                affected = sorted({f["bucket"] for f in new_files})
                fold = affected if mode == "copy-on-write" else []
                fold_set = set(fold)
                cold = affected if mode == "merge-on-read" else []
                his = [
                    f.get("max_lsn")
                    for f in new_files
                    if f.get("max_lsn") is not None
                ]
                hi_lsn = max(his) if his else None
        finally:
            if src_cached:
                src.unpersist()
        if debug:
            print(
                f"[merge] write ({mode}, fold={len(fold)} "
                f"delta={len(cold)}): {time.monotonic()-t_write:.1f}s"
            )
        # fold buckets are fully replaced; cold buckets KEEP their
        # existing base+delta files (the new deltas stack on top)
        if lazy:
            # group-edit commit: untouched groups' manifests are reused
            # by pointer; fold-overlapping groups are emptied (every
            # entry was rewritten above); new files land in their
            # current-spec groups, loading at most the touched groups'
            # prior entries (the delta-append case)
            edits: dict[str, list[dict[str, Any]]] = {
                m["group"]: []
                for m in snap.manifest_list
                if _file_overlaps(m, fold_set, snap)
            }
            by_path = {m["group"]: m["path"] for m in snap.manifest_list}
            for f in new_files:
                gk = _group_key(f, snap)
                if gk not in edits:
                    edits[gk] = (
                        _load_manifest(self.meta_dir, by_path[gk])
                        if gk in by_path
                        else []
                    )
                edits[gk].append(f)
        else:
            fold_paths = {f["path"] for f in cur_files}
            kept = [
                f for f in snap.files if f["path"] not in fold_paths
            ]

        applied = dict(snap.applied)
        if run_id is not None and batch_id is not None:
            applied[run_id] = max(applied.get(run_id, -1), batch_id)

        # widened columns get fresh field ids, registered under the
        # CURRENT epoch (their physical name == logical name; older
        # files of this epoch simply lack the column -> null backfill)
        field_ids = dict(snap.field_ids)
        nfi = snap.next_field_id
        epoch_names = {e: dict(m) for e, m in snap.epoch_names.items()}
        for f in new_fields:
            field_ids[f.name] = nfi
            epoch_names.setdefault(str(snap.epoch), {})[str(nfi)] = f.name
            nfi += 1
        child_kw: dict[str, Any] = dict(
            schema_json=schema_json,
            applied=applied,
            watermark_lsn=max(snap.watermark_lsn, int(hi_lsn if hi_lsn is not None else -1)),
            field_ids=field_ids,
            next_field_id=nfi,
            epoch_names=epoch_names,
        )
        if not lazy:
            child_kw["files"] = kept + new_files
        child_kw["operation"] = operation
        new_snap = snap.child(**child_kw)
        if lazy:
            new_snap.__dict__["_group_edits"] = edits
        if new_snap.watermark_lsn > snap.watermark_lsn:
            new_snap.wm_history.append(
                [new_snap.version, new_snap.watermark_lsn]
            )
            # _commit retargets this entry to the slot actually taken
            new_snap.__dict__["_wm_pending"] = True
        new_snap.__dict__["_data_commit"] = True  # rebase-eligible
        t_commit = time.monotonic()
        self._commit(new_snap)
        stage_ms["commit"] = int((time.monotonic() - t_commit) * 1000)
        rows_per_bucket: dict[int, int] = {}
        for f in new_files:
            rows_per_bucket[f["bucket"]] = rows_per_bucket.get(f["bucket"], 0) + f["rows"]
        out_stats = {
            "version": new_snap.version,
            "skipped": False,
            "mode": mode,
            # True when a same-branch slot race was resolved by the
            # metadata-level rebase instead of redoing the merge
            "rebased": bool(new_snap.__dict__.get("_rebased")),
            "buckets_touched": affected,
            "folded_buckets": fold,
            "delta_buckets": cold,
            "files_written": len(new_files),
            # footer rows of this commit's files: post-merge state rows
            # for folded buckets, appended winners for delta buckets
            "rows_per_bucket": rows_per_bucket,
            "schema_widened": [f.name for f in new_fields],
            "schema_promoted": {
                k: v.simpleString() for k, v in promotions.items()
            },
            "watermark_lsn": new_snap.watermark_lsn,
            "wall_ms": int((time.monotonic() - t0) * 1000),
            "stage_ms": stage_ms,
        }
        from etl_rs_spark import telemetry

        telemetry.record(
            "merge", {"wall_ms": out_stats["wall_ms"], "stage_ms": stage_ms}
        )
        return out_stats
