"""Launch-artifact test: jobs/streaming_job.py runs as its own process
(the spark-submit shape), drains available input exactly-once, and
RESUMES from the checkpoint in a second process without replaying."""

import glob
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(src, out, ckpt):
    return subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--available-now",
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
        timeout=420,
    )


@pytest.mark.slow
def test_streaming_job_resumes_from_checkpoint(spark, tmp_path):
    from sliding_window_aggregators_spark.sources import transcripts_pandas

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = transcripts_pandas(300, 10)
    spark.createDataFrame(pdf.iloc[:150]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "c0"))

    r1 = _run_job(src, out, ckpt)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "committed batches: [0]" in r1.stderr

    spark.createDataFrame(pdf.iloc[150:]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "c1"))
    r2 = _run_job(src, out, ckpt)
    assert r2.returncode == 0, r2.stderr[-2000:]
    # batch 0 NOT recomputed; batch 1 appended
    assert "committed batches: [0, 1]" in r2.stderr

    total = spark.read.parquet(*glob.glob(out + "/batch_id=*")).count()
    assert total == 300
