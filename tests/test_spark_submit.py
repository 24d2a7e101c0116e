"""North-rule packaging evidence: the job runs via
``spark-submit --py-files osm2shp_spark.zip`` — the exact multi-
executor submission shape — with the package resolved FROM THE ZIP
(the driver script is copied to a scratch dir so the repo checkout is
not importable)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

from conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box"
)
def test_cli_via_spark_submit_pyfiles(spark, tmp_path):
    # 1. input tables from the synthetic fixtures
    from osm2shp_spark.sources.synthetic import synthetic_nodes, synthetic_ways

    in_dir = str(tmp_path / "tables")
    synthetic_nodes(spark, SF_SMALL).write.parquet(os.path.join(in_dir, "nodes.parquet"))
    synthetic_ways(spark, SF_SMALL).write.parquet(os.path.join(in_dir, "ways.parquet"))

    # 2. package zip (what --py-files ships to every executor)
    zip_path = str(tmp_path / "osm2shp_spark.zip")
    pkg = os.path.join(REPO, "osm2shp_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # 3. driver script copied OUT of the repo so imports must come
    #    from the zip
    driver = str(tmp_path / "driver.py")
    shutil.copy(os.path.join(pkg, "cli.py"), driver)

    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            driver,
            in_dir,
            out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["counts"]["exported_ways"] > 0
    assert res["counts"]["exported_nodes"] > 0
    assert os.path.exists(os.path.join(out_dir, "crs.txt"))
