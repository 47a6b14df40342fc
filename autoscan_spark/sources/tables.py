"""Test-data table loaders.

The driver ships TPC-H-ish parquet at /root/testdata/sf*/ (TESTDATA.md).
At production scale these reads become Iceberg catalog tables
(``spark.table("cat.db.transcripts")``); the loaders keep that swap to one
place. The reference's source operator analog is S1
(get_or_download_file, autoscan/common.py:10-58) — here the data is already
tabular, so "acquire" is a catalog/parquet scan with pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (used by SQL-side checks)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
