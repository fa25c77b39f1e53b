"""Deployment-shape evidence for the north rule: the engine must run via
``spark-submit --py-files`` on a multi-executor cluster. The sandbox's
closest form is ``local-cluster[2,2,2048]`` — two SEPARATE executor JVMs,
each forking its own Python workers, which import the package from the
--py-files zip alone (no repo on sys.path, no PYTHONPATH help)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def test_spark_submit_pyfiles_on_local_cluster(tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        import pytest

        pytest.skip("spark-submit not on this host")
    zip_path = str(tmp_path / "ybcdc.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package_pyfiles.py"), zip_path],
        check=True,
        capture_output=True,
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            str(tmp_path / "work"),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ok = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_OK")]
    assert ok, out.stdout[-2000:] + out.stderr[-1000:]
    assert "sha_ok=True" in ok[0]
    assert int(ok[0].split("rows=")[1].split()[0]) > 0
