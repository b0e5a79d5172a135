"""Approximate-sketch accuracy checks (engine-specific estimates, so
pytest-verified against exact answers rather than oracle-hashed) and the
spark-submit --py-files packaging smoke (north-rule requirement)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"


class TestSketches:
    def test_approx_count_distinct_within_5pct(self, spark):
        ev = spark.read.parquet(f"{SF}/lineitem.parquet")
        row = ev.agg(
            F.approx_count_distinct("l_partkey").alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        ).collect()[0]
        assert abs(row.approx - row.exact) / row.exact < 0.05

    def test_percentile_approx_brackets_exact(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        row = ev.agg(
            F.percentile_approx("value", 0.5, 10000).alias("approx"),
            F.expr("percentile(value, 0.5)").alias("exact"),
        ).collect()[0]
        assert abs(row.approx - row.exact) <= 0.05 * abs(row.exact) + 1e-9


@pytest.mark.skipif(
    shutil.which("spark-submit") is None and not os.path.exists("/opt/spark/bin/spark-submit"),
    reason="spark-submit not available",
)
def test_spark_submit_pyfiles_job(tmp_path):
    """Build the zip, run the packaged job via spark-submit at local[4],
    rerun on the same cube -> resume writes 0 (the north-rule execution
    mode, end-to-end)."""
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    subprocess.run([os.path.join(REPO, "scripts", "make_pyfiles.sh")], check=True, timeout=120)
    cube = str(tmp_path / "cube")

    def run():
        p = subprocess.run(
            [
                submit, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--py-files", os.path.join(REPO, "dist", "smart_geocubes_spark.zip"),
                os.path.join(REPO, "scripts", "submit_job.py"),
                "--cube", cube, "--sf-dir", "/root/testdata/sf0.001",
            ],
            capture_output=True, text=True, timeout=400,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        return json.loads(line)

    first = run()
    assert first["chunks_written"] > 0
    assert first["join_patches"] > 0
    second = run()
    assert second["chunks_written"] == 0  # resumable through the packaged path
    assert second["cube_rows_visible"] == first["cube_rows_visible"]
