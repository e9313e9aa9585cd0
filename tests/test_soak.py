"""Maintenance-loop soak: ~100 microbatches through the StreamDriver
with periodic compaction, then snapshot expiry + orphan vacuum. The
long-run invariants: the manifest stays O(buckets), disk stays bounded,
lineage is complete, state still equals the replay oracle, and late
batches are not slower than early ones (no per-batch cost creep)."""

from __future__ import annotations

import glob
import os
import statistics

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

DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
N_BATCHES = int(os.environ.get("ETL_SOAK_BATCHES", "100"))
N_EVENTS = 30_000
N_BUCKETS = 8
COMPACT_EVERY = 10


def test_soak_maintenance_loop(spark, tmp_path):
    ev = gen_change_stream(
        spark,
        n_events=N_EVENTS,
        n_convs=120,
        turns_per_conv=8,
        seed=23,
        hot_conv_frac=0.3,
        evolve_after_lsn=N_EVENTS // 2,
    ).cache()
    binlog = str(tmp_path / "binlog")
    write_event_files(to_envelope(ev), binlog, n_files=N_BATCHES)
    table = LakeTable.create(
        spark, str(tmp_path / "table"), DDL, num_buckets=N_BUCKETS
    )
    lineage_dir = str(tmp_path / "lineage")
    driver = StreamDriver(
        spark,
        table,
        binlog,
        str(tmp_path / "ckpt"),
        cfg=CdcConfig(num_buckets=N_BUCKETS),
        max_files_per_trigger=1,  # one file per microbatch
        lineage_dir=lineage_dir,
        compact_every=COMPACT_EVERY,
    )
    driver.run_available_now()
    applied = [s for s in driver.batch_stats if not s.get("skipped")]
    assert len(applied) == N_BATCHES

    # ---- manifest stays O(buckets) under sustained ingest ----------
    snap = table.current()
    # between compactions at most COMPACT_EVERY merges add files; after
    # the last compaction cycle the manifest must be near one file per
    # bucket per recent merge, never O(total batches)
    assert len(snap.files) <= N_BUCKETS * (COMPACT_EVERY + 2), len(snap.files)
    table.compact()
    assert len(table.current().files) <= 2 * N_BUCKETS

    # ---- lineage complete: one row per (batch, touched bucket) -----
    lin = read_lineage(spark, lineage_dir).toPandas()
    want_rows = sum(len(s.get("buckets_touched", [])) for s in applied)
    assert len(lin) == want_rows
    assert lin["batch_id"].nunique() == N_BATCHES

    # ---- state equality vs the replay oracle -----------------------
    assert_state_equal(table.read().toPandas(), replay(ev.toPandas()))

    # ---- snapshot expiry + vacuum bound disk -----------------------
    stats = table.expire_snapshots(keep_last=3)
    assert stats["expired_versions"] > N_BATCHES // 2
    vac = table.vacuum_orphans(older_than_s=0)
    live = {
        os.path.abspath(f["path"])
        for v in range(
            table.current().version - 2, table.current().version + 1
        )
        for f in table.snapshot(v).files
        if os.path.exists(os.path.join(table.meta_dir, f"version-{v:08d}.json"))
    }
    on_disk = {
        os.path.abspath(p)
        for p in glob.glob(
            os.path.join(table.data_dir, "**", "*.parquet"), recursive=True
        )
    }
    assert on_disk <= live | on_disk  # sanity
    assert len(on_disk) <= len(live) + 2 * N_BUCKETS, (
        f"disk not bounded: {len(on_disk)} files for {len(live)} live"
    )
    # table still reads correctly after maintenance
    assert_state_equal(table.read().toPandas(), replay(ev.toPandas()))

    # ---- no per-batch cost creep over the run ----------------------
    # Gate on WORK, not wall-clock: per-batch CPU of the whole Spark
    # runtime (python driver + JVM + UDF workers, via /proc process-
    # tree deltas) is immune to the 2-4x external-load swings that made
    # every wall-ratio limit on this shared VM flake eventually. A
    # state/manifest leak compounds multiplicatively by batch ~100
    # (O(batches) manifest scans measured 3-5x pre-compaction), far
    # above the gate; GC/JIT variance stays well inside it.
    cpus = [s.get("apply_cpu_ms") for s in applied]
    walls = [s["apply_wall_ms"] for s in applied]
    if all(c is not None for c in cpus):
        early = statistics.median(cpus[5:20])
        late = statistics.median(cpus[-15:])
        limit = 1.5
        kind = "cpu"
    else:  # no /proc (non-Linux): fall back to the noisy wall gate
        early = statistics.median(walls[5:20])
        late = statistics.median(walls[-15:])
        limit = 1.8
        kind = "wall"
    print(
        f"soak cost-creep [{kind}]: early={early}ms late={late}ms "
        f"ratio={late / max(early, 1):.2f} "
        f"(wall medians {statistics.median(walls[5:20])}/"
        f"{statistics.median(walls[-15:])}ms)"
    )
    assert late <= limit * early, (
        f"{kind} cost creep: early={early}ms late={late}ms"
    )

    ev.unpersist()
