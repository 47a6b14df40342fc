"""Driver-contract query registry.

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an ANSI-SQL oracle DuckDB runs on the same
parquet tables. Column names/aliases match exactly on both sides; the
driver's compare is row-count + schema + order-insensitive value hash.

The transcript queries all derive the transcripts table from ``documents``
with the SQL-replicable fixed-width chunking in
``sources.transcripts.transcripts_from_documents`` so DuckDB can build the
identical table (CTE ``TR`` below).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from autoscan_spark.operators.extract import drop_failed, extract_turns
from autoscan_spark.operators.fold import fold_documents
from autoscan_spark.operators.metrics import conversation_metrics
from autoscan_spark.sources.transcripts import (
    TRANSCRIPTS_FROM_DOCUMENTS_DUCKDB,
    transcripts_from_documents,
)

# shared CTE header for every DuckDB transcript oracle
_TR = f"WITH tr AS ({TRANSCRIPTS_FROM_DOCUMENTS_DUCKDB})"

_MARKER = "---PAGE BREAK---"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


# ---------------------------------------------------------------------------
# transcript pipeline queries (SURVEY.md §2 operators)
# ---------------------------------------------------------------------------


def q_turn_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 analog: documents → transcript turns (scan + fan-out)."""
    return transcripts_from_documents(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text"
    )


_Q_TURN_SYNTHESIS_SQL = f"{_TR} SELECT conv_id, turn_idx, role, text FROM tr"


def q_turn_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ordering: stable (conv_id, turn_idx) row numbering."""
    tr = transcripts_from_documents(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return tr.select(
        "conv_id", "turn_idx", F.row_number().over(w).cast("int").alias("rn")
    )


_Q_TURN_ORDERING_SQL = f"""{_TR}
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS INTEGER) AS rn
FROM tr"""


def q_turn_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 scan-range pushdown: turns 2..3 only."""
    tr = transcripts_from_documents(spark, sf_dir)
    return tr.filter((F.col("turn_idx") >= 2) & (F.col("turn_idx") <= 3)).select(
        "conv_id", "turn_idx", "text"
    )


_Q_TURN_RANGE_SQL = f"""{_TR}
SELECT conv_id, turn_idx, text FROM tr WHERE turn_idx BETWEEN 2 AND 3"""


def q_marker_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: page-break marker scrub + right-strip (marker injected so the
    scrub provably fires)."""
    tr = transcripts_from_documents(spark, sf_dir)
    with_marker = F.concat(F.col("text"), F.lit(f" {_MARKER} tail {_MARKER}"))
    return tr.select(
        "conv_id",
        "turn_idx",
        F.regexp_replace(
            F.replace(with_marker, F.lit(_MARKER), F.lit("")), r"\s+$", ""
        ).alias("scrubbed"),
    )


_Q_MARKER_SCRUB_SQL = f"""{_TR}
SELECT conv_id, turn_idx,
       regexp_replace(replace(text || ' {_MARKER} tail {_MARKER}', '{_MARKER}', ''),
                      '\\s+$', '') AS scrubbed
FROM tr"""


def q_empty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: count of non-whitespace-only turns per conversation."""
    tr = transcripts_from_documents(spark, sf_dir)
    return (
        tr.filter(F.regexp_replace(F.col("text"), r"\s+$", "") != "")
        .groupBy("conv_id")
        .agg(F.count("*").cast("long").alias("n_valid"))
    )


_Q_EMPTY_FILTER_SQL = f"""{_TR}
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_valid
FROM tr WHERE regexp_replace(text, '\\s+$', '') <> ''
GROUP BY conv_id"""


def q_lag_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 (SQL slice): lag-1 previous-turn text per conversation."""
    tr = transcripts_from_documents(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return tr.select(
        "conv_id", "turn_idx", F.lag("text", 1).over(w).alias("prev_text")
    )


_Q_LAG_CONTEXT_SQL = f"""{_TR}
SELECT conv_id, turn_idx,
       lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
FROM tr"""


def q_extract_low(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M4: the real mapInArrow extraction kernel (plain payloads here, so
    the envelope reduces to the byte-exact fence-strip/rstrip — which DuckDB
    can oracle)."""
    tr = transcripts_from_documents(spark, sf_dir)
    return extract_turns(tr, mode="low").select(
        "conv_id", "turn_idx", "extracted_text", "status"
    )


_Q_EXTRACT_LOW_SQL = f"""{_TR}
SELECT conv_id, turn_idx,
       regexp_replace(text, '\\s+$', '') AS extracted_text,
       'ok' AS status
FROM tr"""


def q_doc_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the real distributed ordered fold (applyInPandas), cross-checked
    against an independent pure-SQL implementation of the same adjacency
    -dependent separator rule."""
    tr = transcripts_from_documents(spark, sf_dir)
    extracted = drop_failed(extract_turns(tr, mode="low"))
    return fold_documents(extracted).select("conv_id", "markdown")


_Q_DOC_FOLD_SQL = f"""{_TR},
c AS (
  SELECT conv_id, turn_idx,
         regexp_replace(replace(text, '{_MARKER}', ''), '\\s+$', '') AS page
  FROM tr
),
v AS (SELECT * FROM c WHERE page <> ''),
s AS (
  SELECT conv_id, turn_idx, page,
    CASE WHEN lag(page) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL THEN ''
         WHEN right(lag(page) OVER (PARTITION BY conv_id ORDER BY turn_idx), 1) = '|'
              AND left(page, 1) = '|' THEN chr(10)
         ELSE chr(10) || chr(10) END AS sep
  FROM v
)
SELECT conv_id, string_agg(sep || page, '' ORDER BY turn_idx) AS markdown
FROM s GROUP BY conv_id"""


def q_conv_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: per-conversation sums + guarded averages over extracted turns."""
    tr = transcripts_from_documents(spark, sf_dir)
    extracted = extract_turns(tr, mode="low")
    return conversation_metrics(extracted)


_Q_CONV_METRICS_SQL = f"""{_TR},
e AS (
  SELECT conv_id,
         CAST(length(text) AS BIGINT) AS in_chars,
         CAST(length(regexp_replace(text, '\\s+$', '')) AS BIGINT) AS out_chars
  FROM tr
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(in_chars) AS BIGINT) AS total_in_chars,
       CAST(sum(out_chars) AS BIGINT) AS total_out_chars,
       sum(in_chars) / greatest(count(*), 1) AS avg_in_chars,
       sum(out_chars) / greatest(count(*), 1) AS avg_out_chars
FROM e GROUP BY conv_id"""


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / events tables)
# ---------------------------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-group documents by content, keep min doc_id."""
    docs = _docs(spark, sf_dir)
    return docs.groupBy(F.md5(F.col("text")).alias("text_hash")).agg(
        F.count("*").cast("long").alias("n_dups"),
        F.min("doc_id").cast("long").alias("keeper_id"),
    )


_Q_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_dups,
       CAST(min(doc_id) AS BIGINT) AS keeper_id
FROM documents GROUP BY md5(text)"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting over documents."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )


_Q_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
FROM documents"""


_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: length, word count, stopword ratio (×1e6 rounded,
    so cross-engine float hashing is stable)."""
    docs = _docs(spark, sf_dir)
    stop_list = ",".join(f"'{w}'" for w in _STOPWORDS)
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_words = F.size(words)
    n_stop = F.size(F.expr(
        f"filter(split(trim(lower(text)), '\\\\s+'), w -> w in ({stop_list}))"
    ))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        n_words.cast("long").alias("n_words"),
        F.round(n_stop * 1000000.0 / F.greatest(n_words, F.lit(1)), 0)
        .cast("long")
        .alias("stop_ppm"),
    )


_Q_QUALITY_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_m,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
       CAST(round(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                  w -> w in ({",".join(f"'{w}'" for w in _STOPWORDS)})))
                  * 1000000.0
                  / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 0)
            AS BIGINT) AS stop_ppm
FROM documents"""


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window delta over the events stream table (per-user ordered by ts)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.coalesce(F.lag("value", 1).over(w), F.lit(0.0)), 6)
        .alias("value_delta"),
    )


_Q_EVENTS_WINDOW_SQL = """
SELECT event_id, user_id,
       round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 6)
         AS value_delta
FROM events"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "turn_synthesis": q_turn_synthesis,
    "turn_ordering": q_turn_ordering,
    "turn_range": q_turn_range,
    "marker_scrub": q_marker_scrub,
    "empty_filter": q_empty_filter,
    "lag_context": q_lag_context,
    "extract_low": q_extract_low,
    "doc_fold": q_doc_fold,
    "conv_metrics": q_conv_metrics,
    "exact_dedup": q_exact_dedup,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "events_window": q_events_window,
}

ORACLES: Dict[str, str] = {
    "turn_synthesis": _Q_TURN_SYNTHESIS_SQL,
    "turn_ordering": _Q_TURN_ORDERING_SQL,
    "turn_range": _Q_TURN_RANGE_SQL,
    "marker_scrub": _Q_MARKER_SCRUB_SQL,
    "empty_filter": _Q_EMPTY_FILTER_SQL,
    "lag_context": _Q_LAG_CONTEXT_SQL,
    "extract_low": _Q_EXTRACT_LOW_SQL,
    "doc_fold": _Q_DOC_FOLD_SQL,
    "conv_metrics": _Q_CONV_METRICS_SQL,
    "exact_dedup": _Q_EXACT_DEDUP_SQL,
    "token_count": _Q_TOKEN_COUNT_SQL,
    "quality_score": _Q_QUALITY_SQL,
    "events_window": _Q_EVENTS_WINDOW_SQL,
}
