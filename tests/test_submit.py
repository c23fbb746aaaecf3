"""`spark-submit --py-files` deployment smoke.

The north rule requires the pipeline to run via ``spark-submit
--py-files`` on a multi-executor cluster (`/root/repo/BASELINE.json`,
README deployment section). This test is that claim made executable in
the sandbox: it builds the ``surfactant_spark.zip`` artifact exactly as
the README documents, then submits a driver script whose ONLY access to
the package is the zip (the subprocess runs from an empty cwd with no
repo on its path), runs the full KG pipeline over the synthetic corpus,
and checks the emitted triples against the pure-pandas oracle at
P/R = 1.0. Local mode stands in for the cluster — what the test pins is
the packaging + import + UDF-distribution path, which is identical
under YARN/k8s.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

DRIVER = """\
import json, sys
from pyspark.sql import SparkSession

pages_path, alias_path, workdir, out_json = sys.argv[1:5]
spark = SparkSession.builder.getOrCreate()
from surfactant_spark.plans.pipeline import run_pipeline

res = run_pipeline(
    spark, spark.read.parquet(pages_path), spark.read.parquet(alias_path), workdir
)
rows = [[r.subj_uuid, r.pred, r.obj_uuid] for r in res.edges.collect()]
stages = {"run": res.stages_run, "resumed": res.stages_resumed}
with open(out_json, "w") as f:
    json.dump({"edges": rows, "stages": stages}, f)
spark.stop()
"""


def _build_zip(dest: str) -> str:
    """Package surfactant_spark/ the way the README tells operators to
    (`cd repo && zip -r surfactant_spark.zip surfactant_spark`)."""
    zip_path = os.path.join(dest, "surfactant_spark.zip")
    pkg = os.path.join(REPO, "surfactant_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return zip_path


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit in this environment"
)
def test_spark_submit_py_files_runs_pipeline(spark_pages, spark_alias, corpus, tmp_path):
    pages_path = str(tmp_path / "pages")
    alias_path = str(tmp_path / "alias")
    spark_pages.write.parquet(pages_path)
    spark_alias.write.parquet(alias_path)

    zip_path = _build_zip(str(tmp_path))
    driver_path = str(tmp_path / "driver.py")
    with open(driver_path, "w", encoding="utf-8") as f:
        f.write(DRIVER)
    out_json = str(tmp_path / "result.json")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            driver_path,
            pages_path, alias_path, str(tmp_path / "wd"), out_json,
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must resolve from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    with open(out_json, encoding="utf-8") as f:
        result = json.load(f)
    assert {"extract", "nodes", "edges"} <= set(result["stages"]["run"])

    from surfactant_spark.oracle import precision_recall, run_oracle

    pages_pdf, alias_pdf = corpus
    _, _, want = run_oracle(pages_pdf, alias_pdf)
    got = {tuple(row) for row in result["edges"]}
    precision, recall = precision_recall(got, want)
    assert (precision, recall) == (1.0, 1.0)
