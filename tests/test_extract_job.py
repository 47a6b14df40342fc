"""Smoke test for the spark-submit job entrypoint (reference U2/U3 analog)."""

import json
import os
import subprocess
import sys

from autoscan_spark.sources.transcripts import synthesize_transcripts

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_extract_job_cli(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("job"))
    src = os.path.join(base, "transcripts")
    out = os.path.join(base, "out")
    synthesize_transcripts(spark, 15, seed=21).write.parquet(src)

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "jobs", "extract_job.py"),
            "--input", src,
            "--output", out,
            "--mode", "low",
            "--buckets", "4",
            "--waves", "2",
        ],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["committed_buckets"] == 4
    assert stats["n_turns"] > 0

    ex = spark.read.parquet(os.path.join(out, "extracted"))
    docs = spark.read.parquet(os.path.join(out, "doc_markdown"))
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    assert ex.count() == stats["n_turns"]
    assert docs.count() == 15
    assert lineage.count() == 4

    # re-run resumes to a no-op
    res2 = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "jobs", "extract_job.py"),
         "--input", src, "--output", out, "--buckets", "4"],
        capture_output=True, text=True, env=env, check=True,
    )
    stats2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert stats2["committed_buckets"] == 0
