"""Distributed URL ingest (reference S1 http branch: autoscan/common.py:27-46
fetches a source URL to local bytes before processing).

Spark-first shape: the URL list is a DataFrame column; each PARTITION fetches
its own URLs inside ``mapInPandas`` — no driver-side downloading, no collect.
Failures follow the engine's low-mode error contract: a ``status`` column
("ok" / "error:<reason>") plus ``drop_failed_fetches``, so a 10⁹-URL crawl
survives individual fetch failures exactly like extraction survives bad
pages.

Scale notes:
- Repartition the URL table by ``xxhash64(host)`` (``spread_by_host``) so one
  host's URLs land together — per-host politeness/rate-limiting is then a
  per-partition concern, and no two executors hammer the same host.
- ``file://`` URLs work offline (tests use them); http(s) goes through
  urllib with timeout + bounded retries. Payloads stream to memory with a
  ``max_bytes`` cap so one huge object can't OOM an executor.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("content", BinaryType()),
        StructField("status", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def ingest_urls(
    urls: DataFrame,
    url_col: str = "url",
    timeout_s: float = 30.0,
    max_retries: int = 2,
    max_bytes: int = 64 * 1024 * 1024,
    allowed_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """Fetch every URL in ``urls[url_col]`` → (url, content, status, n_bytes).

    Fetch errors produce ``status='error:<reason>'`` rows with null content
    (never a job failure); retries with backoff are per-URL inside the
    executor. Keep other columns by joining back on ``url``.

    ``allowed_schemes`` defaults to http(s) only: an untrusted crawl list
    containing ``file://`` (or other local-handler) URLs must not make
    executors read arbitrary local files into the corpus (SSRF/local-read
    hazard). Anything else yields ``status='error:scheme not allowed'``.
    Tests opt into ``("file",)`` explicitly for offline roundtrips.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time
        import urllib.error
        import urllib.parse
        import urllib.request

        def fetch(url: str) -> tuple[bytes | None, str]:
            # a null/NaN URL in a 10⁹-row crawl table must be an error ROW,
            # not a TypeError that fails the job
            if url is None or not isinstance(url, str) or not url.strip():
                return None, "error:null or empty url"
            try:
                # urlsplit raises on malformed URLs (e.g. 'http://[bad' —
                # invalid IPv6 bracket); an untrusted crawl list must
                # degrade those to error rows like every other failure
                scheme = urllib.parse.urlsplit(url).scheme.lower()
            except ValueError:
                return None, "error:malformed url"
            if scheme not in allowed_schemes:
                return None, "error:scheme not allowed"
            last = "error:unknown"
            for attempt in range(max_retries + 1):
                try:
                    with urllib.request.urlopen(url, timeout=timeout_s) as r:
                        data = r.read(max_bytes + 1)
                    if len(data) > max_bytes:
                        return None, f"error:payload exceeds max_bytes={max_bytes}"
                    return data, "ok"
                except (urllib.error.URLError, OSError, ValueError) as e:
                    last = f"error:{type(e).__name__}: {e}"
                    if attempt < max_retries:
                        time.sleep(min(2**attempt * 0.1, 2.0))
            return None, last

        for pdf in batches:
            contents, statuses, sizes = [], [], []
            for url in pdf[url_col]:
                data, status = fetch(url)
                contents.append(data)
                statuses.append(status)
                sizes.append(len(data) if data is not None else 0)
            # reset the index: mixing an indexed Series with plain lists
            # would silently misalign rows if a batch ever carries a
            # non-default index
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].reset_index(drop=True),
                    "content": contents,
                    "status": statuses,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return urls.select(url_col).mapInPandas(run, schema=FETCH_SCHEMA)


def drop_failed_fetches(fetched: DataFrame) -> DataFrame:
    """Low-mode error semantics for ingest: keep only ok rows."""
    return fetched.filter(F.col("status") == "ok")


def spread_by_host(urls: DataFrame, url_col: str = "url", partitions: int | None = None) -> DataFrame:
    """Partition the URL table by host hash: co-locates each host's URLs
    (politeness is per-partition) and spreads distinct hosts evenly."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    n = partitions or urls.sparkSession.sparkContext.defaultParallelism
    return urls.repartition(n, F.xxhash64(host))
