"""Merge-on-read mode: delta-file appends, read-side LWW resolution,
bounded delta chains with inline folds, targeted compaction, CDF over
delta windows, and state parity with copy-on-write.

The reference's DeltaLoader has a single (stubbed) merge mode
(/root/reference/src/load/delta.rs:255-267); merge-on-read is the
Iceberg v2 write-mode pair (write.merge.mode copy-on-write vs
merge-on-read + RewriteDataFiles) rebuilt on the LakeTable format.
"""

import pandas.testing as pdt
import pytest
from pyspark.sql import functions as F

from etl_rs_spark.cdc.apply import apply_batch
from etl_rs_spark.config import CdcConfig
from etl_rs_spark.errors import LoadError
from etl_rs_spark.generator import gen_change_stream, to_envelope
from etl_rs_spark.sinks.lake import LakeTable

DDL = "conv_id string, turn_idx int, text string, ts timestamp"
ENV_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
KEY = ["conv_id", "turn_idx"]


def _w(spark, rows):
    """Winner rows: (conv_id, turn_idx, lsn, op, text); ts rides lsn so
    (ts, lsn) ordering matches lsn ordering unless a test overrides."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, lsn long, op string, text string"
    ).select(
        "conv_id",
        "turn_idx",
        F.timestamp_seconds(F.lit(1700000000) + F.col("lsn")).alias("ts"),
        "lsn",
        "op",
        "text",
    )


def _delta_counts(t):
    out = {}
    for f in t.current().files:
        if f.get("kind") == "delta":
            out[f["bucket"]] = out.get(f["bucket"], 0) + 1
    return out


def _sorted_pdf(df):
    pdf = df.toPandas()
    return (
        pdf.sort_values(sorted(pdf.columns))
        .reset_index(drop=True)[sorted(pdf.columns)]
    )


def _apply_stream(spark, tmp_path, name, merge_mode, n_batches=4):
    """Apply the same generated change stream in n interleaved-LSN
    batches (cross-batch out-of-order by construction) under the given
    merge mode; returns the table."""
    cfg = CdcConfig(num_buckets=4, merge_mode=merge_mode)
    t = LakeTable.create(spark, str(tmp_path / name), ENV_DDL, num_buckets=4)
    ev = to_envelope(
        gen_change_stream(
            spark, n_events=800, n_convs=24, turns_per_conv=5, seed=7
        )
    ).cache()
    for b in range(n_batches):
        apply_batch(
            t,
            ev.where(F.col("lsn") % n_batches == b),
            batch_id=b,
            run_id="r",
            cfg=cfg,
        )
    return t


def test_mor_state_matches_cow(spark, tmp_path):
    """Final table state after an out-of-order multi-batch replay is
    byte-identical between merge-on-read and copy-on-write."""
    cow = _apply_stream(spark, tmp_path, "cow", None)
    mor = _apply_stream(spark, tmp_path, "mor", "merge-on-read")
    assert _delta_counts(mor), "merge-on-read produced no delta files"
    pdt.assert_frame_equal(
        _sorted_pdf(cow.read()), _sorted_pdf(mor.read()), check_dtype=False
    )


def test_mor_changes_matches_cow(spark, tmp_path):
    """The change data feed over a window that ends on unresolved delta
    files equals the copy-on-write feed (net semantics, delete parity,
    losing late events absent)."""
    cow = _apply_stream(spark, tmp_path, "cow", None, n_batches=3)
    mor = _apply_stream(spark, tmp_path, "mor", "merge-on-read", n_batches=3)
    # window = after batch 0 in each table
    a = _sorted_pdf(cow.changes(1))
    b = _sorted_pdf(mor.changes(1))
    assert len(b) > 0
    pdt.assert_frame_equal(a, b, check_dtype=False)


def test_mor_cold_merge_never_reads_or_rewrites_base(spark, tmp_path):
    """A below-threshold merge-on-read batch appends delta files only:
    no bucket folds, prior files (base and delta) stay in the manifest
    untouched — write cost O(batch), independent of state size."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=4,
        props={"write.merge.mode": "merge-on-read"},
    )
    t.merge(_w(spark, [("c1", i, i, "U", f"v{i}") for i in range(20)]),
            run_id="r", batch_id=0)
    before = {f["path"] for f in t.current().files}
    stats = t.merge(
        _w(spark, [("c1", i, 100 + i, "U", f"w{i}") for i in range(20)]),
        run_id="r",
        batch_id=1,
    )
    assert stats["mode"] == "merge-on-read"
    assert stats["folded_buckets"] == []
    assert stats["delta_buckets"] == stats["buckets_touched"]
    after = {f["path"] for f in t.current().files}
    assert before <= after  # nothing rewritten, only new delta files
    # resolution: every key shows its batch-1 value
    rows = {r["turn_idx"]: r["text"] for r in t.read().collect()}
    assert rows == {i: f"w{i}" for i in range(20)}


def test_mor_delta_chain_bounded_by_inline_fold(spark, tmp_path):
    """Once a bucket's delta chain would exceed write.delta.max-files,
    the merge folds that bucket inline (same commit): per-bucket delta
    counts never exceed the cap and state stays correct."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=2,
        props={"write.merge.mode": "merge-on-read", "write.delta.max-files": 2},
    )
    folded = False
    for b in range(6):
        stats = t.merge(
            _w(spark, [("c1", i, b * 100 + i, "U", f"b{b}v{i}") for i in range(8)]),
            run_id="r",
            batch_id=b,
        )
        folded = folded or bool(stats["folded_buckets"])
        counts = _delta_counts(t)
        assert all(n <= 2 for n in counts.values()), counts
    assert folded, "cap never triggered an inline fold"
    rows = {r["turn_idx"]: r["text"] for r in t.read().collect()}
    assert rows == {i: f"b5v{i}" for i in range(8)}


def test_mor_delete_resurrect_and_late_loser(spark, tmp_path):
    """Delta tombstones delete at read time; a later-LSN insert
    resurrects; a late OLDER event for a deleted key still loses."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=2,
        props={"write.merge.mode": "merge-on-read"},
    )
    t.merge(_w(spark, [("a", 1, 10, "U", "hello"), ("b", 1, 11, "U", "keep")]),
            run_id="r", batch_id=0)
    t.merge(_w(spark, [("a", 1, 20, "D", None)]), run_id="r", batch_id=1)
    assert {r["conv_id"] for r in t.read().collect()} == {"b"}
    # late event OLDER than the tombstone: must stay deleted
    t.merge(_w(spark, [("a", 1, 15, "U", "too-late")]), run_id="r", batch_id=2)
    assert {r["conv_id"] for r in t.read().collect()} == {"b"}
    # newer insert resurrects
    t.merge(_w(spark, [("a", 1, 30, "I", "back")]), run_id="r", batch_id=3)
    rows = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert rows == {"a": "back", "b": "keep"}


def test_mor_losing_delta_key_absent_from_changes(spark, tmp_path):
    """A key whose only in-window delta event LOSES to stored state has
    no net change — resolution must keep it out of the feed."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=2,
        props={"write.merge.mode": "merge-on-read"},
    )
    t.merge(_w(spark, [("a", 1, 50, "U", "current"), ("b", 1, 10, "U", "old")]),
            run_id="r", batch_id=0)
    v = t.current().version
    # batch 1: 'a' gets an OLDER losing event, 'b' a winning one
    t.merge(_w(spark, [("a", 1, 40, "U", "stale"), ("b", 1, 60, "U", "new")]),
            run_id="r", batch_id=1)
    feed = t.changes(v).toPandas()
    assert set(feed.conv_id) == {"b"}
    assert feed[feed.conv_id == "b"].text.iloc[0] == "new"
    # and the losing event did not clobber state
    rows = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert rows == {"a": "current", "b": "new"}


def test_mor_compact_folds_only_requested_buckets(spark, tmp_path):
    """Targeted compaction folds the chosen buckets' delta files into
    base and leaves every other bucket's files untouched."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=4,
        props={"write.merge.mode": "merge-on-read"},
    )
    t.merge(
        _w(spark, [(f"c{i}", i, i, "U", f"v{i}") for i in range(40)]),
        run_id="r", batch_id=0,
    )
    t.merge(
        _w(spark, [(f"c{i}", i, 100 + i, "U", f"w{i}") for i in range(40)]),
        run_id="r", batch_id=1,
    )
    before_state = _sorted_pdf(t.read())
    dirty = sorted(_delta_counts(t))
    assert len(dirty) >= 2
    pick, rest = dirty[:1], dirty[1:]
    untouched_before = {
        f["path"] for f in t.current().files if f["bucket"] != pick[0]
    }
    t.compact(buckets=pick)
    snap = t.current()
    assert pick[0] not in _delta_counts(t)
    assert set(rest) <= set(_delta_counts(t))
    assert untouched_before == {
        f["path"] for f in snap.files if f["bucket"] != pick[0]
    }
    pdt.assert_frame_equal(before_state, _sorted_pdf(t.read()), check_dtype=False)
    # full compact clears the rest
    t.compact()
    assert _delta_counts(t) == {}
    pdt.assert_frame_equal(before_state, _sorted_pdf(t.read()), check_dtype=False)


def test_mor_schema_widen_and_promote_via_delta(spark, tmp_path):
    """Additive widening and int->long promotion arriving on a delta
    batch: old base files read through the widened schema (null
    backfill + Spark 4 widening read) under read-side resolution."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        "conv_id string, turn_idx int, score int, ts timestamp",
        num_buckets=2,
        props={"write.merge.mode": "merge-on-read"},
    )
    base = spark.createDataFrame(
        [("a", 1, 10, 5), ("b", 1, 11, 7)],
        "conv_id string, turn_idx int, lsn long, score int",
    ).select(
        "conv_id", "turn_idx",
        F.timestamp_seconds(F.lit(1700000000) + F.col("lsn")).alias("ts"),
        "lsn", F.lit("U").alias("op"), "score",
    )
    t.merge(base, run_id="r", batch_id=0)
    widened = spark.createDataFrame(
        [("a", 1, 20, 2**40, "x")],
        "conv_id string, turn_idx int, lsn long, score long, extra string",
    ).select(
        "conv_id", "turn_idx",
        F.timestamp_seconds(F.lit(1700000000) + F.col("lsn")).alias("ts"),
        "lsn", F.lit("U").alias("op"), "score", "extra",
    )
    stats = t.merge(widened, run_id="r", batch_id=1)
    assert stats["delta_buckets"], "expected a delta append"
    assert stats["schema_widened"] == ["extra"]
    assert stats["schema_promoted"] == {"score": "bigint"}
    rows = {r["conv_id"]: (r["score"], r["extra"]) for r in t.read().collect()}
    assert rows == {"a": (2**40, "x"), "b": (7, None)}


def test_mor_time_travel_resolves_per_version(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=2,
        props={"write.merge.mode": "merge-on-read"},
    )
    t.merge(_w(spark, [("a", 1, 10, "U", "v1")]), run_id="r", batch_id=0)
    v1 = t.current().version
    t.merge(_w(spark, [("a", 1, 20, "U", "v2")]), run_id="r", batch_id=1)
    assert t.read(version=v1).collect()[0]["text"] == "v1"
    assert t.read().collect()[0]["text"] == "v2"


def test_mor_exactly_once_and_idempotent_replay(spark, tmp_path):
    """A replayed (run_id, batch_id) is skipped; the same events under
    a NEW run id append duplicate delta rows that resolution absorbs."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=2,
        props={"write.merge.mode": "merge-on-read"},
    )
    batch = _w(spark, [("a", 1, 10, "U", "x"), ("b", 2, 11, "U", "y")])
    t.merge(batch, run_id="r", batch_id=0)
    assert t.merge(batch, run_id="r", batch_id=0)["skipped"]
    t.merge(batch, run_id="r2", batch_id=0)  # replay under another run
    assert t.read().count() == 2
    rows = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert rows == {"a": "x", "b": "y"}


def test_cow_merge_folds_existing_deltas(spark, tmp_path):
    """Switching a delta-carrying table back to copy-on-write: the next
    CoW merge resolves the affected buckets' delta chains away."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        DDL,
        num_buckets=1,  # one bucket => every key shares it
        props={"write.merge.mode": "merge-on-read"},
    )
    t.merge(_w(spark, [("a", 1, 10, "U", "x")]), run_id="r", batch_id=0)
    t.merge(_w(spark, [("a", 1, 20, "U", "y")]), run_id="r", batch_id=1)
    assert _delta_counts(t)
    stats = t.merge(
        _w(spark, [("b", 1, 30, "U", "z")]),
        run_id="r", batch_id=2, mode="copy-on-write",
    )
    assert stats["folded_buckets"] == [0]
    assert _delta_counts(t) == {}
    rows = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert rows == {"a": "y", "b": "z"}


def test_merge_rejects_unknown_mode(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), DDL, num_buckets=2)
    with pytest.raises(LoadError, match="unknown merge mode"):
        t.merge(_w(spark, [("a", 1, 1, "U", "x")]), mode="upsert-maybe")
