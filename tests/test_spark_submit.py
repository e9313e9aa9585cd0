"""The north-star launch story, actually exercised: package the engine
as a zip, launch `spark-submit --py-files etl_rs_spark.zip
jobs/cdc_apply_job.py` in a fresh process (with the repo scrubbed from
PYTHONPATH, so the package can ONLY come from the shipped zip), replay
a binlog end-to-end, and compare the resulting table state against the
pure-pandas replay oracle."""

import os
import subprocess
import sys
import zipfile

import pyspark
import pytest

from etl_rs_spark.generator import (
    gen_change_stream,
    to_envelope,
    write_event_files,
)
from etl_rs_spark.oracle import replay
from etl_rs_spark.sinks.lake import LakeTable
from tests.util import assert_state_equal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.path.dirname(pyspark.__file__), "bin", "spark-submit"
)


def _package_zip(path: str) -> None:
    """`cd /root/repo && zip -r etl_rs_spark.zip etl_rs_spark` — the
    exact packaging step the job docstring prescribes."""
    pkg = os.path.join(REPO, "etl_rs_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not shipped"
)
def test_spark_submit_py_files_replay(spark, tmp_path):
    ev = gen_change_stream(
        spark,
        n_events=3000,
        n_convs=20,
        turns_per_conv=6,
        seed=7,
        evolve_after_lsn=1500,  # additive column appears mid-binlog
    ).cache()
    binlog = str(tmp_path / "binlog")
    write_event_files(to_envelope(ev), binlog, n_files=3)

    zip_path = str(tmp_path / "etl_rs_spark.zip")
    _package_zip(zip_path)

    table_path = str(tmp_path / "table")
    env = dict(os.environ)
    # the submitted driver must import the engine from the zip alone
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CPUS"] = "4"
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "cdc_apply_job.py"),
            "--events-dir", binlog,
            "--table", table_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--lineage", str(tmp_path / "lineage"),
            "--create-table",
            "--num-buckets", "4",
        ],
        env=env,
        cwd=str(tmp_path),  # not the repo: no accidental cwd import
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])

    t = LakeTable.load(spark, table_path)
    oracle = replay(ev.toPandas())
    assert_state_equal(t.read().toPandas(), oracle)
    ev.unpersist()
