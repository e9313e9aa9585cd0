"""Streaming driver: checkpoint resume, exactly-once, schema evolution,
hot-key skew — the north-rule behaviors (BASELINE.json north_star)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.cdc.lineage import read_lineage
from etl_rs_spark.cdc.stream import StreamDriver
from etl_rs_spark.config import CdcConfig
from etl_rs_spark.generator import (
    gen_change_stream,
    to_envelope,
    write_event_files,
)
from etl_rs_spark.oracle import replay
from etl_rs_spark.sinks.lake import LakeTable
from tests.util import assert_state_equal

TABLE_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

N_EVENTS = 4000
EVOLVE_AT = 2500


@pytest.fixture(scope="module")
def stream(spark):
    ev = gen_change_stream(
        spark,
        n_events=N_EVENTS,
        n_convs=40,
        turns_per_conv=8,
        seed=11,
        hot_conv_frac=0.5,  # skew fixture: one conv ~50% of events
        evolve_after_lsn=EVOLVE_AT,  # additive lang column mid-stream
    ).cache()
    yield ev
    ev.unpersist()


@pytest.fixture(scope="module")
def binlog(spark, stream, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog"))
    files = write_event_files(to_envelope(stream), d, n_files=6)
    return d, files


def _mk_table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "table"), TABLE_DDL, num_buckets=8)


def test_restart_resumes_and_matches_oracle(spark, tmp_path, stream, binlog):
    """Kill/restart mid-stream: run phase 1 over a partial binlog, then a
    brand-new driver on the same checkpoint over the full binlog. Batch
    ids must continue (no reprocessing) and the final state must equal
    the full-replay oracle — including the evolved column."""
    _, files = binlog
    live = str(tmp_path / "live")
    os.makedirs(live)
    for f in files[:3]:
        shutil.copy(f, live)

    table = _mk_table(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    lineage = str(tmp_path / "lineage")

    d1 = StreamDriver(
        spark, table, live, ckpt, max_files_per_trigger=1, lineage_dir=lineage
    )
    s1 = d1.run_available_now(timeout_s=300)
    assert [s["batch_id"] for s in s1] == [0, 1, 2]

    for f in files[3:]:
        shutil.copy(f, live)
    d2 = StreamDriver(
        spark, table, live, ckpt, max_files_per_trigger=1, lineage_dir=lineage
    )
    s2 = d2.run_available_now(timeout_s=300)
    assert [s["batch_id"] for s in s2] == [3, 4, 5]  # resumed, not replayed

    oracle = replay(stream.toPandas())
    assert_state_equal(table.read().toPandas(), oracle)

    # drained re-run: nothing new, table untouched
    v = table.current().version
    s3 = StreamDriver(spark, table, live, ckpt).run_available_now(timeout_s=120)
    assert s3 == []
    assert table.current().version == v

    # lineage audit: every batch wrote per-bucket rows; skewed bucket is
    # visibly the heaviest
    ln = read_lineage(spark, lineage).toPandas()
    assert set(ln["batch_id"]) == {0, 1, 2, 3, 4, 5}
    per_bucket = ln.groupby("bucket")["n_events"].sum()
    assert per_bucket.max() >= 0.4 * per_bucket.sum()  # hot bucket present
    assert int(ln["n_events"].sum()) == N_EVENTS


def test_schema_evolution_widen_and_null_backfill(spark, tmp_path, stream, binlog):
    events_dir, _ = binlog
    table = _mk_table(spark, tmp_path)
    driver = StreamDriver(
        spark, table, events_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    stats = driver.run_available_now(timeout_s=300)

    widened_at = [s["batch_id"] for s in stats if s.get("schema_widened")]
    assert widened_at, "lang column never widened the schema"
    # before the widening batch, schema had no lang
    pre = table.snapshot(widened_at[0]).schema().fieldNames()
    assert "lang" not in pre
    post = table.current().schema().fieldNames()
    assert "lang" in post

    final = table.read()
    assert final.where(F.col("lang").isNotNull()).count() > 0
    # keys last touched before evolution read as null lang (backfill)
    assert final.where(F.col("lang").isNull()).count() > 0

    assert_state_equal(final.toPandas(), replay(stream.toPandas()))


def test_skewed_stream_with_salted_dedup(spark, tmp_path, stream):
    table = _mk_table(spark, tmp_path)
    cfg = CdcConfig(salt_buckets=8)
    from etl_rs_spark.cdc.apply import apply_batch

    apply_batch(table, to_envelope(stream), batch_id=0, run_id="r", cfg=cfg)
    assert_state_equal(table.read().toPandas(), replay(stream.toPandas()))


def test_auto_compaction_bounds_files(spark, tmp_path, stream, binlog):
    """compact_every keeps the table's file count and manifest
    O(buckets) under sustained ingest, without changing final state."""
    events_dir, _ = binlog
    table = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        num_buckets=4,
    )
    StreamDriver(
        spark,
        table,
        events_dir,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        compact_every=2,
    ).run_available_now(timeout_s=240)
    snap = table.current()
    # most recent compaction bounds files near O(buckets); a trailing
    # uncompacted batch may add at most one commit's worth
    assert len(snap.files) <= 3 * snap.num_buckets
    oracle = replay(stream.toPandas())
    assert_state_equal(table.read().toPandas(), oracle)


def test_auto_retention_bounds_snapshots(spark, tmp_path, stream, binlog):
    """retention_every runs distributed snapshot expiry + orphan vacuum
    inline with the stream: surviving version files stay bounded by
    retention_keep_last (+ maintenance commits since the last sweep),
    dead pre-compaction data files are reclaimed, and the final state
    still equals the oracle replay — metadata growth is O(keep_last),
    not O(batches), over an unbounded run."""
    import glob as _glob
    import os as _os

    events_dir, _ = binlog
    table = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        num_buckets=4,
    )
    stats = StreamDriver(
        spark,
        table,
        events_dir,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        compact_every=2,
        retention_every=2,
        retention_keep_last=2,
    ).run_available_now(timeout_s=240)
    applied = [s for s in stats if not s.get("skipped")]
    assert len(applied) >= 4  # enough batches that expiry actually ran
    versions = _glob.glob(
        _os.path.join(table.meta_dir, "version-*.json")
    )
    # keep_last=2 plus at most one compaction + retention round of
    # commits since the last sweep (merge + compact + up to 2 ref
    # bookkeeping commits)
    assert len(versions) <= 6, sorted(versions)[-8:]
    oracle = replay(stream.toPandas())
    assert_state_equal(table.read().toPandas(), oracle)
    # retention reclaimed dead files: disk holds only files the
    # surviving snapshots reference, plus possibly young uncommitted
    live = {
        f["path"]
        for p in versions
        for f in table.snapshot(
            int(p.split("version-")[1].split(".")[0])
        ).files
    }
    on_disk = set(
        _glob.glob(
            _os.path.join(table.data_dir, "**", "*.parquet"),
            recursive=True,
        )
    )
    # every live file exists; dead files from expired snapshots are gone
    assert live <= on_disk
    assert len(on_disk - live) <= len(live)  # no unbounded dead residue


def test_maintenance_cadence_survives_driver_restarts(
    spark, tmp_path, stream, binlog
):
    """Retention/compaction cadence is keyed on the checkpoint's global
    batch_id, not an in-memory counter: a fleet where every driver
    lifetime is SHORTER than the cadence (rolling restarts, spot churn)
    must still run maintenance. Regression for the 2x10^8-event
    endurance run, where per-wave driver restarts reset the old
    counters and retention never fired (snapshots grew linearly)."""
    import glob as _glob
    import os as _os

    events_dir, files = binlog
    table = _mk_table(spark, tmp_path)
    staged = str(tmp_path / "staged-binlog")
    _os.makedirs(staged)
    ckpt = str(tmp_path / "ckpt")
    # 6 phases x 1 file x 1 batch each: no driver ever lives past ONE
    # applied batch, while retention_every=2 — a per-driver counter
    # could never reach the cadence
    for f in files:
        shutil.copy(f, staged)
        StreamDriver(
            spark,
            table,
            staged,
            ckpt,
            max_files_per_trigger=1,
            retention_every=2,
            retention_keep_last=2,
        ).run_available_now(timeout_s=240)
    versions = _glob.glob(_os.path.join(table.meta_dir, "version-*.json"))
    n_batches = len(files)
    # without cross-restart cadence: create + one merge commit per batch
    # all survive = 1 + n_batches version files; with it, expiry fired
    # and deleted old versions
    assert len(versions) < 1 + n_batches, sorted(versions)
    assert_state_equal(table.read().toPandas(), replay(stream.toPandas()))


def test_stateful_running_stats_across_batches(spark, tmp_path, stream, binlog):
    """applyInPandasWithState: per-conversation running totals maintain
    state ACROSS microbatches (update mode); the last emitted row per
    conversation equals the batch ground truth."""
    events_dir, _ = binlog
    from etl_rs_spark.generator import ENVELOPE_SCHEMA
    from etl_rs_spark.streaming.stateful import running_conversation_stats

    src = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", 2)  # force >1 microbatch
        .parquet(events_dir)
    )
    out_dir = str(tmp_path / "stats-out")
    q = (
        running_conversation_stats(src)
        .writeStream.format("memory")
        .queryName("conv_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(240), "availableNow drain did not finish"
    finally:
        q.stop()
    got = spark.sql(
        "SELECT * FROM conv_stats"
    ).toPandas()
    # update mode emits one row per (conv, batch-it-appeared-in); the
    # LAST emission per conv carries the final running totals
    final = got.groupby("conv_id").last()

    truth = (
        stream.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("turn_idx").alias("n_turns"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert len(final) == len(truth)
    merged = final.join(truth, lsuffix="_got")
    assert (merged["n_events_got"] == merged["n_events"]).all()
    assert (merged["n_turns_got"] == merged["n_turns"]).all()
    # cross-batch statefulness: with 6 files at 2/trigger, the hot conv
    # appears in multiple batches, so it must emit MORE than one row
    hot = got["conv_id"].value_counts().max()
    assert hot >= 2


def test_lsn_gap_detection(spark, tmp_path, stream):
    """A lost binlog segment surfaces as a run-level LSN coverage hole
    (and a contiguous stream reports none). Detection rides the dedup
    scan via df.observe — no extra job per batch."""
    env = to_envelope(stream)
    lo, hi = [
        int(x)
        for x in env.agg(F.min("lsn"), F.max("lsn")).first()
    ]
    cut_lo, cut_hi = lo + (hi - lo) // 3, lo + (hi - lo) // 2

    # contiguous run: full stream, no holes
    d_ok = str(tmp_path / "binlog_ok")
    write_event_files(env, d_ok, n_files=4)
    t1 = LakeTable.create(
        spark, str(tmp_path / "t1"), TABLE_DDL, num_buckets=8
    )
    drv1 = StreamDriver(
        spark, t1, d_ok, str(tmp_path / "ck1"), max_files_per_trigger=2
    )
    drv1.run_available_now()
    cov = drv1.lsn_coverage()
    assert cov["holes"] == [] and cov["covered"] == [[lo, hi]], cov
    assert cov["missing_in_batch_ranges"] == 0
    for s in drv1.batch_stats:
        assert s["lsn_span"]["missing_in_range"] == 0

    # lossy run: a middle LSN segment never arrives
    d_bad = str(tmp_path / "binlog_bad")
    write_event_files(
        env.where(~F.col("lsn").between(cut_lo, cut_hi)), d_bad, n_files=4
    )
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"), TABLE_DDL, num_buckets=8
    )
    drv2 = StreamDriver(
        spark, t2, d_bad, str(tmp_path / "ck2"), max_files_per_trigger=2
    )
    drv2.run_available_now()
    cov2 = drv2.lsn_coverage()
    total_missing = cov2["missing_in_batch_ranges"] + sum(
        b - a + 1 for a, b in cov2["holes"]
    )
    assert total_missing == cut_hi - cut_lo + 1, cov2

    # opt-out: track_lsn_gaps=False records nothing
    t3 = LakeTable.create(
        spark, str(tmp_path / "t3"), TABLE_DDL, num_buckets=8
    )
    drv3 = StreamDriver(
        spark, t3, d_ok, str(tmp_path / "ck3"),
        cfg=CdcConfig(track_lsn_gaps=False),
    )
    drv3.run_available_now()
    assert drv3.lsn_coverage()["covered"] == []
    assert all(s.get("lsn_span") is None for s in drv3.batch_stats)


def test_live_rename_with_stream_column_map(spark, tmp_path, stream, binlog):
    """The live-rename operational pair: phase 1 streams into the
    original schema; the table renames text->body WITHOUT stopping
    ingestion (metadata-only, admin surface); phase 2 resumes the same
    checkpoint with CdcConfig.column_map={'text': 'body'} so the
    source's unchanged payload key lands on the renamed column. Final
    state equals the full-replay oracle with the column renamed, and
    the stale name must NOT re-widen the schema."""
    _, files = binlog
    live = str(tmp_path / "live")
    os.makedirs(live)
    for f in files[:3]:
        shutil.copy(f, live)
    table = _mk_table(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")

    d1 = StreamDriver(spark, table, live, ckpt, max_files_per_trigger=1)
    d1.run_available_now(timeout_s=300)

    table.rename_column("text", "body")  # live, no stream stop

    for f in files[3:]:
        shutil.copy(f, live)
    d2 = StreamDriver(
        spark, table, live, ckpt,
        cfg=CdcConfig(column_map={"text": "body"}),
        max_files_per_trigger=1,
    )
    s2 = d2.run_available_now(timeout_s=300)
    assert [s["batch_id"] for s in s2] == [3, 4, 5]

    cols = [f.name for f in table.current().schema().fields]
    assert "body" in cols and "text" not in cols, cols

    oracle = replay(stream.toPandas()).rename(columns={"text": "body"})
    assert_state_equal(table.read().toPandas(), oracle)


def test_rollback_then_fresh_checkpoint_replay_converges(
    spark, tmp_path, stream, binlog
):
    """The full bad-deploy recovery runbook: stream the binlog in, roll
    the table back to an early snapshot, then replay the WHOLE binlog
    through a FRESH checkpoint (fresh run_id). The restored applied-log
    plus (ts, lsn) LWW idempotence make the replay converge to exactly
    the oracle state — already-present rows re-merge as no-ops, undone
    rows re-apply — with no manual event surgery."""
    _, files = binlog
    live = str(tmp_path / "live")
    os.makedirs(live)
    for f in files:
        shutil.copy(f, live)

    table = _mk_table(spark, tmp_path)
    d1 = StreamDriver(
        spark, table, live, str(tmp_path / "ckpt1"), max_files_per_trigger=2
    )
    s1 = d1.run_available_now(timeout_s=300)
    assert len(s1) == 3
    # roll back to the state after the FIRST microbatch
    versions = sorted(
        int(p.split("version-")[1].split(".")[0])
        for p in __import__("glob").glob(
            os.path.join(table.meta_dir, "version-*.json")
        )
    )
    target = versions[1]  # v0 = create, v1 = first merge
    table.rollback(target)
    assert table.current().applied == table.snapshot(target).applied

    # fresh checkpoint -> fresh run_id -> all batches re-apply, LWW makes
    # the already-present two-thirds a no-op and restores the undone rest
    d2 = StreamDriver(
        spark, table, live, str(tmp_path / "ckpt2"), max_files_per_trigger=2
    )
    s2 = d2.run_available_now(timeout_s=300)
    assert len(s2) == 3

    oracle = replay(stream.toPandas())
    assert_state_equal(table.read().toPandas(), oracle)
