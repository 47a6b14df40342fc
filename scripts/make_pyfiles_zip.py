"""Build the ``--py-files`` archive for spark-submit runs.

Zips the ``autoscan_spark`` package (sources only, no __pycache__) so a
cluster submission ships the code to executors the standard way:

    python scripts/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files autoscan_spark.zip jobs/extract_job.py ...

Executors import the package FROM THE ZIP (PySpark puts py-files on the
worker PYTHONPATH); the driver script adds the repo root itself. The
scaling harness (scripts/scaling.py) builds this archive and launches
every ladder rung through spark-submit from a NEUTRAL working directory,
so worker-side imports provably resolve from the archive alone — the
same packaging a real multi-executor cluster run uses.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    """Write the package zip; returns ``out_path``."""
    pkg = os.path.join(REPO_ROOT, "autoscan_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO_ROOT))
    return out_path


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/autoscan_bench"),
        "autoscan_spark.zip",
    )
    path = build_zip(out)
    with zipfile.ZipFile(path) as z:
        n = len(z.namelist())
    print(f"{path} ({n} entries)")


if __name__ == "__main__":
    main()
