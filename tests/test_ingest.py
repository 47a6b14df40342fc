"""URL ingest tests (reference S1 http branch) — offline via file:// URLs."""

import os

import pandas as pd
from pyspark.sql import functions as F

from autoscan_spark.sources.ingest import (
    drop_failed_fetches,
    ingest_urls,
    spread_by_host,
)


def test_ingest_file_urls_roundtrip(spark, tmp_path):
    payloads = {f"doc{i}": (f"payload-{i}\n" * (i + 1)).encode() for i in range(5)}
    urls = []
    for name, data in payloads.items():
        p = tmp_path / name
        p.write_bytes(data)
        urls.append((name, f"file://{p}"))
    df = spark.createDataFrame(pd.DataFrame(urls, columns=["name", "url"]))

    fetched = ingest_urls(df, allowed_schemes=("file",))
    rows = {r["url"]: r for r in fetched.collect()}
    assert len(rows) == 5
    for name, data in payloads.items():
        r = rows[f"file://{tmp_path / name}"]
        assert r["status"] == "ok"
        assert bytes(r["content"]) == data
        assert r["n_bytes"] == len(data)


def test_ingest_error_rows_not_job_failure(spark, tmp_path):
    ok = tmp_path / "ok.txt"
    ok.write_bytes(b"fine")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": [f"file://{ok}", f"file://{tmp_path}/missing.txt"]}
        )
    )
    fetched = ingest_urls(df, max_retries=0, allowed_schemes=("file",))
    rows = {r["url"]: r for r in fetched.collect()}
    assert rows[f"file://{ok}"]["status"] == "ok"
    bad = rows[f"file://{tmp_path}/missing.txt"]
    assert bad["status"].startswith("error:")
    assert bad["content"] is None and bad["n_bytes"] == 0

    kept = drop_failed_fetches(fetched).collect()
    assert len(kept) == 1 and kept[0]["status"] == "ok"


def test_ingest_max_bytes_cap(spark, tmp_path):
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * 2048)
    df = spark.createDataFrame(pd.DataFrame({"url": [f"file://{big}"]}))
    r = ingest_urls(df, max_bytes=1024, allowed_schemes=("file",)).collect()[0]
    assert r["status"].startswith("error:payload exceeds")
    assert r["content"] is None


def test_spread_by_host_partitioning(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": [f"https://host{i % 4}.example.com/p/{i}" for i in range(64)]}
        )
    )
    spread = spread_by_host(df, partitions=8)
    assert spread.rdd.getNumPartitions() == 8
    # all URLs of one host land in ONE partition (politeness unit)
    host_parts = (
        spread.withColumn("pid", F.spark_partition_id())
        .withColumn("host", F.parse_url("url", F.lit("HOST")))
        .groupBy("host")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .collect()
    )
    assert all(r["n_parts"] == 1 for r in host_parts)

def test_ingest_blocks_disallowed_schemes(spark, tmp_path):
    """Default scheme allowlist is http(s): file:// from an untrusted crawl
    list must become an error row, never a local file read."""
    secret = tmp_path / "secret.txt"
    secret.write_bytes(b"do-not-read")
    df = spark.createDataFrame(
        pd.DataFrame({"url": [f"file://{secret}", "ftp://example.com/x"]})
    )
    rows = ingest_urls(df).collect()  # default allowlist
    assert all(r["status"] == "error:scheme not allowed" for r in rows)
    assert all(r["content"] is None for r in rows)


def test_ingest_null_and_empty_urls_are_error_rows(spark):
    import pandas as pd

    from autoscan_spark.sources.ingest import ingest_urls

    df = spark.createDataFrame(
        pd.DataFrame({"url": [None, "", "   ", "notaurl", "http://[bad"]})
    )
    rows = {r["url"]: r["status"] for r in ingest_urls(df).collect()}
    assert rows[None] == "error:null or empty url"
    assert rows[""] == "error:null or empty url"
    assert rows["   "] == "error:null or empty url"
    assert rows["notaurl"] == "error:scheme not allowed"
    # urlsplit raises ValueError on the invalid IPv6 bracket — must be an
    # error ROW, never a job failure
    assert rows["http://[bad"] == "error:malformed url"
