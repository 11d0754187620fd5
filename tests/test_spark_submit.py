"""Deployment-path integration test: the package must run under
``spark-submit --py-files dist/crawler4j_spark.zip`` with NO repo checkout
on the import path — the driver imports from the zip, and the pandas-UDF
query (`url_canonicalize`) forces the Python workers to import the shipped
kernels too. This is the north rule's submission shape, evidenced the only
way a single box can: a real spark-submit subprocess from a neutral cwd.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
SF_DIR = "/root/testdata/sf0.001"

# pandas-UDF query (executor-side package import) + pure-DataFrame query.
QUERIES = ["url_canonicalize", "frontier_claim"]


def test_pyfiles_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    from package_pyfiles import build

    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.slow
def test_spark_submit_pyfiles_runs_registry_queries(tmp_path, spark):
    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "crawler4j_spark.zip"))
    job = tmp_path / "submit_job.py"
    shutil.copy(os.path.join(REPO_ROOT, "tools", "submit_job.py"), job)

    # Neutral cwd + scrubbed PYTHONPATH: the ONLY way `crawler4j_spark`
    # can resolve, driver or worker, is the --py-files archive.
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        str(job),
        "--sf-dir", SF_DIR,
        "--queries", ",".join(QUERIES),
    ]
    proc = subprocess.run(
        cmd, cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    result_lines = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("RESULT ")]
    assert result_lines, proc.stdout[-2000:]
    got = json.loads(result_lines[-1][len("RESULT "):])

    # Same counts as an in-process run of the same registry entries.
    from crawler4j_spark.operators.analytics import REGISTRY
    expected = {n: REGISTRY[n][0](spark, SF_DIR).count() for n in QUERIES}
    assert got == expected
