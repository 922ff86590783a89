"""Deployment-mode smoke: the pipeline runs under ``spark-submit
--py-files vector_spark.zip`` — the north rule's cluster invocation —
in a clean working directory where only the zip provides the package."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SCRIPT = """
import sys, json
from vector_spark.session import get_spark
from vector_spark.data.transcripts import transcripts_table
from vector_spark.plans.transcript_pipeline import pipeline_stats

spark = get_spark("submit_smoke", master="local[4]", shuffle_partitions=4)
t = transcripts_table(spark, 6000)
rows = pipeline_stats(spark, t).collect()
sinks = sorted({r["sink"] for r in rows})
print("SUBMIT_RESULT " + json.dumps({"rows": len(rows), "sinks": sinks}))
"""


@pytest.mark.slow
def test_spark_submit_with_pyfiles(tmp_path):
    import package

    zip_path = package.build()
    assert os.path.exists(zip_path)

    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER_SCRIPT)

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         str(driver)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: the zip must supply the package
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_RESULT")]
    assert line, proc.stdout[-2000:]
    result = json.loads(line[0].split(" ", 1)[1])
    assert result["rows"] > 0
    assert set(result["sinks"]) >= {"sink_errors", "sink_tools", "_dropped"}
