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
from autoscan_spark.sources.tables import load_table
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
    from autoscan_spark.operators.textstats import _with_words

    stop_list = ",".join(f"'{w}'" for w in _STOPWORDS)
    # hoisted words column: one split per row, not one per consumer expr
    docs = _with_words(_docs(spark, sf_dir), "text", "__w")
    n_words = F.expr("size(__w)")
    n_stop = F.expr(f"size(filter(__w, w -> w in ({stop_list})))")
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


# ---------------------------------------------------------------------------
# dedup / similarity / text analysis (phase 2)
# ---------------------------------------------------------------------------


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-3-gram Jaccard between consecutive documents (JVM arrays)."""
    from autoscan_spark.operators.dedup import ngram_jaccard

    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = docs.select(
        (F.col("doc_id") - 1).alias("id_a"), F.col("text").alias("text_b")
    )
    pairs = a.join(b, on="id_a")
    return ngram_jaccard(pairs).select(
        "id_a", F.round(F.col("jaccard"), 6).alias("jaccard_r")
    )


_Q_NGRAM_JACCARD_SQL = """
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, length(text) - 2),
                                      i -> substr(text, i, 3))) AS grams
  FROM documents
)
SELECT a.doc_id AS id_a,
       round(len(list_intersect(a.grams, b.grams))
             / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard_r
FROM g a JOIN g b ON b.doc_id = a.doc_id + 1"""


def q_content_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercased text."""
    from autoscan_spark.operators.textstats import content_fingerprint

    return content_fingerprint(_docs(spark, sf_dir)).select("doc_id", "content_fp")


_Q_CONTENT_FP_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_fp
FROM documents"""


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer counts (word pieces + punctuation)."""
    from autoscan_spark.operators.textstats import token_counts

    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "n_ws_tokens", "n_bpe_tokens"
    )


_Q_TOKEN_BPE_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (argmax over per-language hit counts)."""
    from autoscan_spark.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def _langid_oracle() -> str:
    from autoscan_spark.operators.textstats import LANG_STOPWORDS

    structs = []
    for lang, stops in LANG_STOPWORDS.items():
        stop_list = ",".join(f"'{w}'" for w in stops)
        structs.append(
            f"{{'score': len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
            f"w -> w in ({stop_list}))), 'lang': '{lang}'}}"
        )
    argmax = f"list_sort([{', '.join(structs)}])[-1].lang"
    cjk = r"length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g'))"
    return f"""
SELECT doc_id,
       CASE WHEN {cjk} * 2 > length(text) THEN 'zh' ELSE {argmax} END AS lang_pred
FROM documents"""


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-heuristic gate columns (ints + boolean; ratios are internal)."""
    from autoscan_spark.operators.textstats import quality_features

    return quality_features(_docs(spark, sf_dir)).select(
        "doc_id", F.col("n_chars").alias("n_chars_q"), F.col("n_words").alias("n_words_q"), "quality_ok"
    )


def _quality_oracle() -> str:
    from autoscan_spark.operators.textstats import LANG_STOPWORDS

    all_stops = ",".join(f"'{w}'" for stops in LANG_STOPWORDS.values() for w in stops)
    words = r"regexp_split_to_array(trim(lower(text)), '\s+')"
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_q,
         CAST(len({words}) AS BIGINT) AS n_words_q,
         length(regexp_replace(text, '\\s+', '', 'g')) / greatest(len({words}), 1) AS mean_word_len,
         length(regexp_replace(text, '[^!-/:-@\\[-`]', '', 'g')) / greatest(length(text), 1) AS punct_ratio,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) / greatest(length(text), 1) AS upper_ratio
  FROM documents
)
SELECT doc_id, n_chars_q, n_words_q,
       (n_words_q >= 5 AND mean_word_len >= 2 AND mean_word_len <= 15
        AND punct_ratio <= 0.3 AND upper_ratio <= 0.3) AS quality_ok
FROM f"""


def q_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (query, corpus) cosine similarities for the first 10 vec_ids
    (JVM zip_with/aggregate; query side broadcast)."""
    from autoscan_spark.operators.similarity import cosine_pairs

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_pairs(emb, queries).select(
        "query_id", "neighbor_id", F.round(F.col("cosine"), 6).alias("cosine_r")
    )


_Q_EMB_COSINE_SQL = """
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
         AS cosine_r
FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 10) q"""


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query (rank by rounded cosine then id so
    the ordering is engine-portable)."""
    from autoscan_spark.operators.similarity import cosine_pairs

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 10)
    scored = cosine_pairs(emb, queries).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn("cosine_r", F.round(F.col("cosine"), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_r"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine_r", "rank")
    )


_Q_EMB_TOPK_SQL = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
           AS cosine_r
  FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 10) q
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine_r,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_r DESC, neighbor_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact variant for the oracle; the
    LSH-bucketed scale path is exercised by tests/test_dedup_similarity)."""
    from autoscan_spark.operators.similarity import embedding_near_dups

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pairs = embedding_near_dups(emb, threshold=0.25, exact=True)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine_r")
    )


_Q_EMB_NEAR_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
         AS cosine_r
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: new session when the per-user gap exceeds 300s
    (cumulative-sum window — the batch form of the streaming session op)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    is_new = F.when(gap.isNull() | (gap > 300), 1).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_id"),
    )


_Q_EVENTS_SESSION_SQL = """
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 300
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM g"""


def q_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational breadth check: broadcast join orders⋈customer⋈nation + agg."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


_Q_ORDERS_NATION_SQL = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name"""


def q_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 analog (reference _calculate_cost, base_llm_processor.py:83-102):
    per-turn cost from a broadcast kind→rate lookup × char counts, summed per
    conversation. Rates are constants folded into the plan."""
    from autoscan_spark.operators.extract import extract_turns

    tr = transcripts_from_documents(spark, sf_dir)
    ex = extract_turns(tr, mode="low")
    rate = (
        F.when(F.col("kind") == "html", 3.0)
        .when(F.col("kind") == "pdf", 5.0)
        .when(F.col("kind") == "tool", 2.0)
        .otherwise(1.0)
    )
    return (
        ex.withColumn("cost", F.round(F.col("in_chars") * rate / 1e6, 9))
        .groupBy("conv_id")
        .agg(F.round(F.sum("cost"), 9).alias("total_cost"))
    )


_Q_COST_MODEL_SQL = f"""{_TR}
SELECT conv_id,
       round(sum(round(length(text) * 1.0 / 1e6, 9)), 9) AS total_cost
FROM tr GROUP BY conv_id"""
# (documents-derived payloads are all 'plain' → rate 1.0; the kind dispatch
# itself is pinned by pytest on the fixture corpus)


def q_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 analog (image_to_base64, image_processing.py:61-64): base64
    projection of the payload + roundtrip identity check."""
    tr = transcripts_from_documents(spark, sf_dir)
    # Spark's base64 uses the MIME encoder (wraps at 76 chars with \r\n);
    # normalize to the unwrapped RFC 4648 form DuckDB emits
    b64 = F.regexp_replace(
        F.base64(F.to_binary(F.col("text"), F.lit("utf-8"))), r"[\r\n]", ""
    )
    return tr.select(
        "conv_id",
        "turn_idx",
        b64.alias("payload_b64"),
        (F.col("text") == F.unbase64(b64).cast("string")).alias("roundtrip_ok"),
    )


_Q_BASE64_SQL = f"""{_TR}
SELECT conv_id, turn_idx,
       to_base64(text::BLOB) AS payload_b64,
       text = CAST(from_base64(to_base64(text::BLOB)) AS VARCHAR) AS roundtrip_ok
FROM tr"""


def q_topk_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort / top-k: 3 longest documents per language (window + rank)."""
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("lang", "doc_id", "n_chars", "rank")
    )


_Q_TOPK_SQL = """
SELECT lang, doc_id, n_chars,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rank
FROM documents
QUALIFY rank <= 3"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: long docs ∩ english, short docs ∖ english, union-all
    distinct count per branch label."""
    docs = _docs(spark, sf_dir)
    long_en = docs.filter("n_chars >= 300").select("doc_id").intersect(
        docs.filter("lang = 'en'").select("doc_id")
    )
    short_non_en = docs.filter("n_chars < 300").select("doc_id").exceptAll(
        docs.filter("lang = 'en'").select("doc_id")
    )
    return (
        long_en.withColumn("branch", F.lit("long_en"))
        .unionByName(short_non_en.withColumn("branch", F.lit("short_non_en")))
        .groupBy("branch")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


_Q_SET_OPS_SQL = """
WITH long_en AS (
  SELECT doc_id FROM documents WHERE n_chars >= 300
  INTERSECT
  SELECT doc_id FROM documents WHERE lang = 'en'
), short_non_en AS (
  SELECT doc_id FROM documents WHERE n_chars < 300
  EXCEPT ALL
  SELECT doc_id FROM documents WHERE lang = 'en'
)
SELECT branch, CAST(count(*) AS BIGINT) AS n_docs FROM (
  SELECT doc_id, 'long_en' AS branch FROM long_en
  UNION ALL
  SELECT doc_id, 'short_non_en' AS branch FROM short_non_en
) GROUP BY branch"""


def q_grouping_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation breadth: multi-key grouping with distinct + conditional
    aggregates over the events table."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.round(F.sum(F.when(F.col("value") > 0, F.col("value")).otherwise(0.0)), 6).alias("pos_value"),
        F.max("ts").alias("last_ts"),
    )


_Q_GROUPING_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(sum(CASE WHEN value > 0 THEN value ELSE 0.0 END), 6) AS pos_value,
       max(ts) AS last_ts
FROM events GROUP BY event_type"""


def q_polish_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: whole-document consolidation pass over folded markdown
    (rows-only: the heading-dedupe loop is not SQL-expressible; semantics
    pinned by tests/test_pipeline_e2e.py::test_polish_pass)."""
    from autoscan_spark.operators.extract import drop_failed, extract_turns
    from autoscan_spark.operators.fold import fold_documents
    from autoscan_spark.operators.polish import polish_documents

    tr = transcripts_from_documents(spark, sf_dir)
    docs = fold_documents(drop_failed(extract_turns(tr, mode="low")))
    return polish_documents(docs).select("conv_id", "markdown", "n_turns")


# Polish injection: one string exercising all four polish rules —
# hyphenation repair (cross-\n\nword), table re-stitch (| a |\n\n| b |),
# consecutive-heading dedupe (## T twice), blank-run collapse (\n{4}).
_POLISH_INJ = "\n\n## T\n## T\ncross-\n\nword\n| a |\n\n| b |\n\n\n\nend"


def q_polish_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 polish pass, fully oracle-checked: fold output + deterministic
    injected structure exercising every polish rule. The oracle replicates
    the heading-dedupe state machine with a reset-group window (running
    count of non-blank non-heading lines partitions heading runs; lag
    within the group is the kernel's prev_heading), so the 'not
    SQL-expressible' claim held only for arbitrary regex semantics — on
    ASCII markdown the kernel is exactly mirrorable."""
    from autoscan_spark.operators.polish import polish_documents

    docs = q_doc_fold(spark, sf_dir)  # (conv_id, markdown)
    injected = docs.withColumn(
        "markdown", F.concat(F.col("markdown"), F.lit(_POLISH_INJ))
    )
    return polish_documents(injected).select(
        "conv_id", F.md5("markdown").alias("polished_md5")
    )


def _polish_inj_sql() -> str:
    parts = [f"'{seg}'" if seg else "''" for seg in _POLISH_INJ.split("\n")]
    return " || chr(10) || ".join(parts)


def _polish_oracle() -> str:
    return f"""{_TR},
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
),
folded AS (
  SELECT conv_id,
         string_agg(sep || page, '' ORDER BY turn_idx) || ({_polish_inj_sql()}) AS md
  FROM s GROUP BY conv_id
),
p1 AS (
  SELECT conv_id,
         regexp_replace(
           regexp_replace(md, '(\\w)-\\n\\n([a-z])', '\\1\\2', 'g'),
           '(\\|)\\n\\n(\\|)', '\\1' || chr(10) || '\\2', 'g') AS md
  FROM folded
),
lines AS (
  SELECT conv_id,
         unnest(string_split(md, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(md, chr(10))))) AS pos
  FROM p1
),
g AS (
  SELECT conv_id, line, pos,
         sum(CASE WHEN trim(line) <> '' AND NOT starts_with(line, '#')
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM lines
),
h AS (
  SELECT conv_id, pos,
         lag(line) OVER (PARTITION BY conv_id, grp ORDER BY pos) AS prev_head
  FROM g WHERE starts_with(line, '#')
),
kept AS (
  SELECT g.conv_id, g.pos, g.line
  FROM g LEFT JOIN h ON g.conv_id = h.conv_id AND g.pos = h.pos
  WHERE NOT (starts_with(g.line, '#') AND h.prev_head IS NOT NULL
             AND g.line = h.prev_head)
),
dd AS (
  SELECT conv_id, string_agg(line, chr(10) ORDER BY pos) AS md
  FROM kept GROUP BY conv_id
)
SELECT conv_id,
       md5(regexp_replace(md, '\\n{{3,}}', chr(10) || chr(10), 'g')) AS polished_md5
FROM dd"""


# rows-only checks (not SQL-expressible; the driver records a weaker check)


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs over documents (banded LSH + exact verify).

    Oracle-backed: the DuckDB oracle brute-forces exact 3-shingle Jaccard
    over ALL pairs ≥ threshold, which equals the LSH output because the
    fixture corpus's pair-similarity distribution is bimodal (every true
    pair has J ≥ 0.9, where 32-band × 2-row recall is 1 − (1−0.81)³² ≈ 1;
    nothing sits in the LSH-risky mid range — verified in-gate: a missed
    candidate would surface as a row/hash mismatch, not silently pass)."""
    from autoscan_spark.operators.dedup import minhash_dedup

    docs = _docs(spark, sf_dir)
    pairs = minhash_dedup(docs, threshold=0.1, n=3, num_hashes=64, bands=32)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard_r")
    )


_Q_MINHASH_PAIRS_SQL = r"""
WITH sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(ws) >= 3 THEN
      list_transform(generate_series(1, len(ws) - 2),
                     i -> array_to_string(ws[i:i+2], ' '))
      ELSE [array_to_string(ws, ' ')] END) AS shingles
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.shingles, b.shingles))::DOUBLE /
             len(list_distinct(list_concat(a.shingles, b.shingles))), 6)
         AS jaccard_r
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.1"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (8×8-bit banding, Hamming ≤ 7 — pigeonhole
    guarantees exact recall at this radius; see simhash_near_pairs).
    Deliberately NO pre-repartition: unlike minhash (whose num_hashes JVM
    lambda expressions dominate), the simhash kernel is cheap enough that
    shuffling the full text corpus costs more than the parallelism buys at
    bench scale (measured 0.8s vs 2.1s at sf0.1); at 100 TB the scan has
    many input splits, so kernel parallelism comes for free."""
    from autoscan_spark.operators.dedup import simhash64, simhash_near_pairs

    docs = _docs(spark, sf_dir)
    return simhash_near_pairs(simhash64(docs), max_hamming=7, n_chunks=8)


def _simhash_oracle() -> str:
    """Brute-force DuckDB mirror of the simhash pipeline: per-token md5
    8-byte hashes (the kernel's exact hash), 64 signed bit sums per doc,
    fingerprint packed with the bit-63 two's-complement term so the value
    equals Spark's signed int64, then ALL-pairs hamming ≤ 7 — a superset
    check of the banded candidate generation, which is exact-recall at
    this radius by pigeonhole (so the outputs must be identical; a
    banding bug would surface as a row mismatch)."""
    sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(64)
    )
    fp_terms = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(63)
    ) + " + CASE WHEN s63 > 0 THEN -9223372036854775808 ELSE 0 END"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
  FROM toks WHERE tok <> ''
), bits AS (
  SELECT doc_id, {sums} FROM th GROUP BY doc_id
), fp AS (
  SELECT d.doc_id, CAST({fp_terms} AS BIGINT) AS f
  FROM documents d LEFT JOIN bits USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= 7"""


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data prep composition, fully oracle-checked:
    language filter (en) → quality gate → exact dedup (keep min doc_id per
    content hash among survivors) → whitespace token counts of the kept
    docs. Exercises operator COMPOSITION under the value-equality gate, not
    just each operator in isolation."""
    from autoscan_spark.operators.dedup import exact_dedup
    from autoscan_spark.operators.textstats import (
        _with_words,
        lang_id,
        quality_features,
        token_counts,
    )

    # one shared words projection for both word-level ops (lang + quality)
    docs = _with_words(_docs(spark, sf_dir), "text", "__words")
    en = lang_id(docs, words_col="__words").filter(F.col("lang_pred") == "en")
    gated = (
        quality_features(en, words_col="__words")
        .filter("quality_ok")
        .select("doc_id", "text")
    )
    kept = exact_dedup(gated)
    return token_counts(kept).select(
        "doc_id", F.col("n_ws_tokens").alias("n_tokens_kept")
    )


def _corpus_prep_oracle() -> str:
    from autoscan_spark.operators.textstats import LANG_STOPWORDS

    structs = []
    for lang, stops in LANG_STOPWORDS.items():
        stop_list = ",".join(f"'{w}'" for w in stops)
        structs.append(
            f"{{'score': len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
            f"w -> w in ({stop_list}))), 'lang': '{lang}'}}"
        )
    argmax = f"list_sort([{', '.join(structs)}])[-1].lang"
    cjk = r"length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g'))"
    words = r"regexp_split_to_array(trim(lower(text)), '\s+')"
    return f"""
WITH langd AS (
  SELECT doc_id, text,
         CASE WHEN {cjk} * 2 > length(text) THEN 'zh' ELSE {argmax} END AS lang_pred,
         CAST(len({words}) AS BIGINT) AS n_words,
         length(regexp_replace(text, '\\s+', '', 'g')) / greatest(len({words}), 1) AS mean_word_len,
         length(regexp_replace(text, '[^!-/:-@\\[-`]', '', 'g')) / greatest(length(text), 1) AS punct_ratio,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) / greatest(length(text), 1) AS upper_ratio
  FROM documents
), gated AS (
  SELECT doc_id, text FROM langd
  WHERE lang_pred = 'en' AND n_words >= 5 AND mean_word_len >= 2
    AND mean_word_len <= 15 AND punct_ratio <= 0.3 AND upper_ratio <= 0.3
), keepers AS (
  SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)
)
SELECT g.doc_id,
       CAST(len(regexp_split_to_array(trim(g.text), '\\s+')) AS BIGINT) AS n_tokens_kept
FROM gated g JOIN keepers k USING (doc_id)"""


def q_near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup dedup END TO END: MinHash-LSH verified pairs →
    large/small-star connected components → keep the min id per duplicate
    cluster (handles transitive chains). Oracle-backed since r5: DuckDB
    brute-forces exact-Jaccard pairs (valid on this corpus's bimodal
    similarity — see q_minhash_pairs) and resolves components by
    recursive-CTE transitive closure, so a star-contraction bug surfaces
    as a survivor-set mismatch; the iterative CC is additionally
    differential-fuzzed against union-find in pytest."""
    from autoscan_spark.operators.dedup import dedup_connected, minhash_dedup

    docs = _docs(spark, sf_dir)
    pairs = minhash_dedup(docs, threshold=0.1, n=3, num_hashes=64, bands=32)
    return dedup_connected(docs, pairs).select("doc_id").orderBy("doc_id")


_Q_NEAR_DUP_SURVIVORS_SQL = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(ws) >= 3 THEN
      list_transform(generate_series(1, len(ws) - 2),
                     i -> array_to_string(ws[i:i+2], ' '))
      ELSE [array_to_string(ws, ' ')] END) AS shingles
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        FROM documents)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.1
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
)
SELECT doc_id FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM reach WHERE reach.a = d.doc_id AND reach.b < d.doc_id
)"""


def q_embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k (scale path of embedding_topk).
    Rows-only: seeded, deterministic; recall vs exact pinned in pytest."""
    from autoscan_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, queries, k=5, n_planes=12, n_tables=6).select(
        "query_id", "neighbor_id", "rank"
    )


def q_embedding_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with spherical-k-means-refined coarse
    quantizer. Rows-only: deterministic (seeded sample + Lloyd); overlap
    vs exact pinned in pytest."""
    from autoscan_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=4, kmeans_iterations=3
    ).select("query_id", "neighbor_id", "rank")


def q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (max 10 docs per source, deterministic hash
    order) — the anti-domination rule of web-corpus construction."""
    from autoscan_spark.operators.sampling import cap_per_group

    docs = _docs(spark, sf_dir)
    return cap_per_group(docs, "source", "doc_id", 10).select(
        "doc_id", "source"
    )


_Q_CAP_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substring(md5(concat('cap-v1', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
                    % 1000000 ASC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= 10"""


def q_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIVE-operator end-to-end composition under the value gate: language
    filter → quality gate → exact dedup → whitespace token count →
    deterministic train/val/test split. What a user's actual prep job looks
    like; the oracle replays the identical pipeline in DuckDB."""
    from autoscan_spark.operators.sampling import hash_split

    base = q_corpus_prep(spark, sf_dir)  # doc_id, n_tokens_kept
    return hash_split(base, "doc_id").select("doc_id", "split", "n_tokens_kept")


def _prep_pipeline_oracle() -> str:
    return f"""
WITH base AS ({_corpus_prep_oracle()})
SELECT doc_id,
       CASE WHEN b < 980000 THEN 'train'
            WHEN b < 990000 THEN 'val'
            ELSE 'test' END AS split,
       n_tokens_kept
FROM (SELECT doc_id, n_tokens_kept,
             ('0x' || substring(md5(concat('split-v1', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
             % 1000000 AS b
      FROM base)"""


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with deterministic synthetic PII injected
    per row (the raw corpus has none): counts per kind + md5 of the fully
    scrubbed text, both oracle-checked cross-engine (Java regex vs RE2 —
    the patterns are restricted to shared syntax)."""
    from autoscan_spark.operators.textstats import scrub_pii

    docs = _docs(spark, sf_dir)
    injected = docs.withColumn(
        "text",
        F.expr(
            "concat(text, ' contact user', cast(doc_id as string), "
            "'@example.com or 10.0.', cast(pmod(doc_id, 256) as string), "
            "'.7 tel +1 (415) 555-01', "
            "lpad(cast(pmod(doc_id, 100) as string), 2, '0'))"
        ),
    )
    return scrub_pii(injected).select(
        "doc_id", "n_email", "n_ipv4", "n_phone", F.md5("scrubbed").alias("scrub_md5")
    )


def _scrub_pii_oracle() -> str:
    from autoscan_spark.operators.textstats import PII_PATTERNS

    pats = dict(PII_PATTERNS)
    return f"""
WITH injected AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@example.com or 10.0.', CAST(doc_id % 256 AS VARCHAR),
                '.7 tel +1 (415) 555-01',
                lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')) AS text
  FROM documents
), s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{pats["email"]}')) AS BIGINT) AS n_email,
         regexp_replace(text, '{pats["email"]}', '<EMAIL>', 'g') AS t
  FROM injected
), s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t, '{pats["ipv4"]}')) AS BIGINT) AS n_ipv4,
         regexp_replace(t, '{pats["ipv4"]}', '<IPV4>', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         CAST(len(regexp_extract_all(t, '{pats["phone"]}')) AS BIGINT) AS n_phone,
         regexp_replace(t, '{pats["phone"]}', '<PHONE>', 'g') AS t
  FROM s2
)
SELECT doc_id, n_email, n_ipv4, n_phone, md5(t) AS scrub_md5 FROM s3"""


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-repetition quality signals (gopher-style): distinct-word ratio
    (ppm) and top single-word occurrence count."""
    from autoscan_spark.operators.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir)).select(
        "doc_id", "distinct_ppm", "top_word_freq"
    )


_Q_REPETITION_SQL = r"""
SELECT doc_id,
       CAST(round(len(list_distinct(words)) * 1000000.0 / greatest(len(words), 1), 0)
            AS BIGINT) AS distinct_ppm,
       CAST(list_max(list_transform(list_distinct(words),
                                    w -> len(list_filter(words, x -> x = w))))
            AS BIGINT) AS top_word_freq
FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
      FROM documents)"""


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated 5-word-window rate per doc (substring-dedup
    signal; one shuffle on window hash)."""
    from autoscan_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_docs(spark, sf_dir), n=5)


_Q_DUP_SPANS_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(words) - 4),
                               i -> unhex(md5(array_to_string(words[i:i+4], ' '))))) AS wh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents)
), c AS (
  SELECT wh, count(*) AS cnt FROM w GROUP BY wh
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       CAST(round(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) * 1000000.0
                  / count(*), 0) AS BIGINT) AS dup_ppm
FROM w JOIN c USING (wh)
GROUP BY w.doc_id"""


def q_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span REMOVAL (Lee-et-al/RefinedWeb style): every
    5-word window duplicated corpus-wide keeps only its first occurrence;
    covered words are cut and docs rebuilt from survivors."""
    from autoscan_spark.operators.dedup import remove_duplicate_spans

    return remove_duplicate_spans(_docs(spark, sf_dir), n=5)


_Q_REMOVE_SPANS_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents WHERE text IS NOT NULL
), wp AS (
  SELECT doc_id, unnest(ws) AS word,
         unnest(generate_series(1, len(ws))) AS wpos
  FROM w
), wins AS (
  SELECT doc_id,
         unnest(generate_series(1, len(ws) - 4)) AS wstart,
         unnest(list_transform(generate_series(1, len(ws) - 4),
                i -> md5(array_to_string(ws[i:i+4], ' ')))) AS wh
  FROM w
), tag AS (
  SELECT doc_id, wstart, wh,
         count(*) OVER (PARTITION BY wh) AS cnt,
         row_number() OVER (PARTITION BY wh ORDER BY doc_id, wstart) AS rn
  FROM wins
), cov AS (
  SELECT DISTINCT doc_id, unnest(generate_series(wstart, wstart + 4)) AS wpos
  FROM tag WHERE cnt > 1 AND rn > 1
), kept AS (
  SELECT wp.doc_id, wp.wpos, wp.word
  FROM wp LEFT JOIN cov ON wp.doc_id = cov.doc_id AND wp.wpos = cov.wpos
  WHERE cov.wpos IS NULL
), rebuilt AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(word, ' ' ORDER BY wpos) AS txt
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN d.text IS NULL THEN 0
                 ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END
            AS BIGINT) AS n_words_total,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_words_kept,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE coalesce(r.txt, '') END AS clean_text
FROM documents d LEFT JOIN rebuilt r USING (doc_id)"""


def q_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChatML-style per-conversation training text: turns folded in order
    under <|im_start|>role ... <|im_end|> markers (one conv shuffle)."""
    from autoscan_spark.operators.conversations import render_chat_template

    return render_chat_template(transcripts_from_documents(spark, sf_dir))


_Q_CHAT_TEMPLATE_SQL = f"""{_TR}
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       string_agg('<|im_start|>' || role || chr(10) || text
                  || '<|im_end|>' || chr(10), '' ORDER BY turn_idx)
         AS training_text
FROM tr GROUP BY conv_id"""


def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT (context, response) pair per assistant turn: context = all prior
    turns via a framed window collect_list (one conv shuffle)."""
    from autoscan_spark.operators.conversations import sft_pairs

    return sft_pairs(transcripts_from_documents(spark, sf_dir))


_Q_SFT_PAIRS_SQL = f"""{_TR},
ctx AS (
  SELECT conv_id, turn_idx, role, text,
         string_agg(role || ': ' || text, chr(10)) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS context
  FROM tr
)
SELECT conv_id, turn_idx, coalesce(context, '') AS context, text AS response
FROM ctx WHERE role = 'assistant'"""


def q_response_echo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT response-echo filter signal: distinct word 3-gram overlap
    between each assistant response and its context, as exact integer
    ppm (one conversation-window shuffle; arrays never shuffle)."""
    from autoscan_spark.operators.conversations import response_echo

    return response_echo(transcripts_from_documents(spark, sf_dir))


_Q_RESPONSE_ECHO_SQL = f"""{_TR},
ctx AS (
  SELECT conv_id, turn_idx, role, text,
         string_agg(role || ': ' || text, chr(10)) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS context
  FROM tr
), pairs AS (
  SELECT conv_id, turn_idx,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS rw,
         regexp_split_to_array(trim(lower(coalesce(context, ''))), '\\s+')
           AS cw
  FROM ctx WHERE role = 'assistant'
), g AS (
  SELECT conv_id, turn_idx,
    list_distinct(CASE WHEN len(rw) >= 3 THEN
      list_transform(generate_series(1, len(rw) - 2),
                     i -> array_to_string(rw[i:i+2], ' '))
      ELSE [array_to_string(rw, ' ')] END) AS rg,
    list_distinct(CASE WHEN len(cw) >= 3 THEN
      list_transform(generate_series(1, len(cw) - 2),
                     i -> array_to_string(cw[i:i+2], ' '))
      ELSE [array_to_string(cw, ' ')] END) AS cg
  FROM pairs
)
SELECT conv_id, turn_idx,
       CAST(len(rg) AS BIGINT) AS n_resp_ngrams,
       CAST(len(list_intersect(rg, cg)) AS BIGINT) AS n_echoed,
       CAST((1000000 * len(list_intersect(rg, cg))) // len(rg) AS BIGINT)
         AS echo_ppm
FROM g"""


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/rejection-sampling data prep: per conversation, (chosen,
    rejected) assistant responses ranked by an exact integer
    alphabetic-word-ppm quality proxy (one groupBy-conv shuffle)."""
    from autoscan_spark.operators.conversations import preference_pairs

    return preference_pairs(transcripts_from_documents(spark, sf_dir))


_Q_PREFERENCE_PAIRS_SQL = f"""{_TR},
scored AS (
  SELECT conv_id, turn_idx, text,
    CAST((1000000 * len(list_filter(ws, w -> regexp_full_match(w, '[a-z]+'))))
         // len(ws) AS BIGINT) AS score
  FROM (SELECT conv_id, turn_idx, text,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
        FROM tr WHERE role = 'assistant')
), ranked AS (
  SELECT conv_id, turn_idx, text, score,
    row_number() OVER (PARTITION BY conv_id
                       ORDER BY score DESC, turn_idx ASC) AS rn_b,
    row_number() OVER (PARTITION BY conv_id
                       ORDER BY score ASC, turn_idx DESC) AS rn_w,
    count(*) OVER (PARTITION BY conv_id) AS n
  FROM scored
)
SELECT b.conv_id, b.turn_idx AS chosen_turn, w.turn_idx AS rejected_turn,
       b.score AS chosen_score_ppm, w.score AS rejected_score_ppm,
       b.text AS chosen_response, w.text AS rejected_response
FROM ranked b JOIN ranked w USING (conv_id)
WHERE b.rn_b = 1 AND w.rn_w = 1 AND b.n >= 2"""


def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge LEARNING over the documents corpus (Sennrich
    loop on the word-frequency table; iterative — not SQL-expressible,
    merge-for-merge differential vs a reference implementation in
    pytest). Returns the learned rank-ordered merge table."""
    from autoscan_spark.operators.textstats import learn_bpe_merges

    merges = learn_bpe_merges(_docs(spark, sf_dir), n_merges=16)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        schema="rank int, piece_a string, piece_b string",
    )


def q_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (CCNet/fastText pattern): distill the
    gopher heuristic gate into an MLlib hashing-TF logistic scorer and
    score the corpus (iterative L-BFGS training — not SQL-expressible;
    accuracy + agreement pinned in pytest)."""
    from autoscan_spark.operators.classify import distill_heuristic_gate

    return distill_heuristic_gate(_docs(spark, sf_dir)).select(
        "doc_id", "gate_label", "quality_keep"
    )


def q_bpe_token_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL merge-based BPE token counts over documents (rank-greedy merge
    apply loop — not SQL-expressible; merge semantics pinned by pytest)."""
    from autoscan_spark.operators.textstats import bpe_token_count

    docs = _docs(spark, sf_dir)
    return bpe_token_count(docs).select("doc_id", "n_bpe_real").orderBy("doc_id")


def q_extract_fixture_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full kernel suite over the rich fixture corpus (html/pdf/tool/fenced
    payload classes) — per-turn extraction + per-class counts."""
    from autoscan_spark.operators.extract import extract_turns
    from autoscan_spark.sources.transcripts import synthesize_transcripts

    tr = synthesize_transcripts(spark, 110, seed=42)
    ex = extract_turns(tr, mode="low")
    return ex.groupBy("kind", "status").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.length("extracted_text")).cast("long").alias("total_out_chars"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed as-of join (union-tag + single window shuffle — Spark has
    no native ASOF): each click event gets the value of the user's most
    recent purchase at-or-before it. Oracle: DuckDB's native ASOF LEFT
    JOIN over the identically deduped right side."""
    from autoscan_spark.operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # determinism: one purchase per (user_id, ts) — keep the max event_id's
    # value (ASOF tie-winners are engine-defined otherwise)
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return asof_join(
        clicks,
        purchases,
        by="user_id",
        left_ts="ts",
        right_ts="p_ts",
        value_cols=["purchase_value"],
    ).select("event_id", "user_id", "ts", "purchase_value")


_Q_ASOF_SQL = """
WITH p AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
), pd AS (SELECT user_id, ts, value FROM p WHERE rn = 1)
SELECT l.event_id, l.user_id, l.ts, r.value AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN pd r ON l.user_id = r.user_id AND l.ts >= r.ts"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5 key hash — stable
    across runs/engines/partitionings (leakage-safe dataset splits)."""
    from autoscan_spark.operators.sampling import hash_split

    return hash_split(_docs(spark, sf_dir), "doc_id").select("doc_id", "split")


_Q_HASH_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN b < 980000 THEN 'train'
            WHEN b < 990000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             ('0x' || substring(md5(concat('split-v1', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
             % 1000000 AS b
      FROM documents)"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (keep 100% de, 50% en, 25% rest)
    — one JVM CASE expression, no shuffle."""
    from autoscan_spark.operators.sampling import stratified_hash_sample

    return stratified_hash_sample(
        _docs(spark, sf_dir),
        "doc_id",
        "lang",
        {"en": 0.5, "de": 1.0},
        default_fraction=0.25,
    ).select("doc_id", "lang")


_Q_STRATIFIED_SQL = """
SELECT doc_id, lang
FROM (SELECT doc_id, lang,
             ('0x' || substring(md5(concat('strata-v1', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
             % 1000000 AS b
      FROM documents)
WHERE CASE WHEN lang = 'en' THEN b < 500000
           WHEN lang = 'de' THEN b < 1000000
           ELSE b < 250000 END"""


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL stats (allow/deny-list signal). The raw corpus has no
    URLs, so deterministic synthetic ones are injected per row — same
    pattern as scrub_pii."""
    from autoscan_spark.operators.textstats import url_domain_stats

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.expr(
            "concat(text, ' see https://site', cast(pmod(doc_id, 20) as string), "
            "'.example.com/page and http://Mirror', "
            "cast(pmod(doc_id, 7) as string), '.example.org/x')"
        ),
    )
    return url_domain_stats(docs)


_Q_DOMAIN_STATS_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         concat(text, ' see https://site', CAST(doc_id % 20 AS VARCHAR),
                '.example.com/page and http://Mirror',
                CAST(doc_id % 7 AS VARCHAR), '.example.org/x') AS text
  FROM documents
), u AS (
  SELECT doc_id,
         lower(regexp_replace(unnest(regexp_extract_all(text, 'https?://[^/\s]+')),
                              '^https?://', '')) AS domain
  FROM injected
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM u GROUP BY domain"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency top-100 (vocabulary/BPE-training input);
    TakeOrdered top-k with deterministic (n DESC, token ASC) tie-break."""
    from autoscan_spark.operators.textstats import token_frequencies

    return token_frequencies(_docs(spark, sf_dir), top_n=100)


_Q_VOCAB_SQL = r"""
SELECT token, n FROM (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        FROM documents)
  WHERE token != ''
  GROUP BY token
)
ORDER BY n DESC, token ASC LIMIT 100"""


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# money amounts are doubles in the parquet; all arithmetic is done on
# integer cents (floor(x*100 + 0.5) — identical IEEE evaluation in both
# engines, immune to round-half rule differences) so sums are EXACT and
# order-independent: summing raw doubles would make the value hash depend
# on partition order.
_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem: grouped exact-integer
    aggregates with a date-range scan predicate (pushdown-eligible)."""
    li = _table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01")
    )
    qty = _CENTS.format(col="l_quantity")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    tax = _CENTS.format(col="l_tax")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"sum({qty})").alias("sum_qty_c"),
            F.expr(f"sum({price})").alias("sum_base_c"),
            F.expr(f"sum({price} * (100 - {disc}))").alias("sum_disc_c4"),
            F.expr(f"sum({price} * (100 - {disc}) * (100 + {tax}))").alias(
                "sum_charge_c6"
            ),
            F.count("*").cast("long").alias("count_order"),
        )
    )


_Q_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
           * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))) AS BIGINT) AS sum_charge_c6,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: lineitem ⋈ orders ⋈ customer ⋈ nation,
    revenue per nation in exact integer cents. Plan shape: the two big
    fact-fact joins shuffle on their keys; the nation dimension broadcasts."""
    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer")
    nation = _table(spark, sf_dir, "nation")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr(f"sum({price} * (100 - {disc}))").alias("revenue_c4"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


_Q_REVENUE_SQL = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_c4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join breadth (TPC-H Q22-flavored): customers that never placed
    an URGENT order. left_anti needs only the filtered order keys on the
    build side; the priority filter is pushdown-eligible."""
    cust = _table(spark, sf_dir, "customer")
    urgent = (
        _table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


_Q_NO_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: segment-filtered customers ⋈
    orders ⋈ lineitem, top-10 open orders by revenue in exact integer
    cents. Ties broken by l_orderkey so the top-k cut is deterministic;
    sort+limit compiles to TakeOrdered (no global sort at scale), and all
    three date/segment filters are pushdown-eligible scan predicates."""
    cust = _table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01")
    )
    li = _table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01")
    )
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.expr(f"sum({price} * (100 - {disc}))").alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q_SHIP_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_c4 DESC, l_orderkey
LIMIT 10"""


def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: count orders per priority that
    had at least one line item shipped more than 60 days after the order
    date. left_semi join with a mixed equi + range condition — the build
    side carries only (l_orderkey, l_shipdate)."""
    orders = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_late_orders")
    )


_Q_LATE_PRIORITY_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast-revenue change: single-table scan with a
    conjunctive date/discount/quantity predicate (all pushdown-eligible)
    and one global exact-cents aggregate — the canonical
    scan-predicate-aggregate microbenchmark."""
    li = _table(spark, sf_dir, "lineitem")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(f"sum({price} * {disc})").alias("revenue_c4"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


_Q_FORECAST_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24"""


def q_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: top-20 customers by revenue
    lost to returns in a date window. Deterministic top-k (ties by
    c_custkey) via TakeOrdered; nation broadcast."""
    li = _table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = _table(spark, sf_dir, "customer")
    nation = _table(spark, sf_dir, "nation")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(f"sum({price} * (100 - {disc}))").alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_Q_RETURNED_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_c4 DESC, c_custkey
LIMIT 20"""


def q_parttype_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-line profit rollup, the widest join in the
    suite: lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders (5 tables),
    filtered to a part-name substring ('%red%' here, the shape of Q9's
    '%green%' pattern — both engines filter '%red%'), grouped
    by supplier nation × order year × part type. Exact integer cents.

    Scale shape: the p_name filter sits UNDER the join so only matching
    parts reach the fact table; part/supplier join under AQE (both are
    dimension-sized next to lineitem), nation explicitly broadcast."""
    li = _table(spark, sf_dir, "lineitem")
    part = _table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supp = _table(spark, sf_dir, "supplier")
    nation = _table(spark, sf_dir, "nation")
    orders = _table(spark, sf_dir, "orders")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            F.col("p_type").alias("part_type"),
        )
        .agg(
            F.expr(f"sum({price} * (100 - {disc}))").alias("revenue_c4"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


_Q_PARTTYPE_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       p_type AS part_type,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_c4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2, 3"""


def q_user_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly gate over the events stream: flag events
    more than 3 standard deviations from that user's own mean value,
    evaluated as the division-free cross-multiplied integer identity
    (n·v − S)² > 9·(n·Q − S²) in DECIMAL(38,0) so the flag is bit-stable
    against DuckDB's INT128 evaluation. ONE window shuffle on user_id."""
    from autoscan_spark.operators.temporal import zscore_outliers

    return zscore_outliers(
        _events(spark, sf_dir), k=3, min_n=5,
        group_col="user_id", id_col="event_id", value_col="value",
    )


_Q_USER_ANOMALIES_SQL = """
WITH v AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events
), s AS (
  SELECT user_id, count(*) AS n, sum(vc) AS sv,
         sum(CAST(vc AS DECIMAL(38,0)) * vc) AS q
  FROM v GROUP BY user_id
)
SELECT v.user_id, v.event_id, v.vc AS value_c, CAST(n AS BIGINT) AS n_events
FROM v JOIN s USING (user_id)
WHERE n >= 5
  AND (CAST(n AS DECIMAL(38,0)) * vc - sv)
      * (CAST(n AS DECIMAL(38,0)) * vc - sv)
      > 9 * (CAST(n AS DECIMAL(38,0)) * q - CAST(sv AS DECIMAL(38,0)) * sv)"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality signals (Rae et al. 2021 appendix A). The raw
    synthetic corpus is uniform word soup, so discriminating structure is
    injected deterministically per doc_id (bullet prefix, stopword tail,
    '#' symbols, trailing ellipsis) — same convention as scrub_pii /
    normalize_nfc. Every ratio is an exact integer division, so the value
    hash is engine-stable."""
    from autoscan_spark.operators.textstats import gopher_quality

    docs = _docs(spark, sf_dir)
    injected = docs.withColumn(
        "text",
        F.concat(
            F.when(F.col("doc_id") % 11 == 0, F.lit("- ")).otherwise(F.lit("")),
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" and that have with")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" #####")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" ...")).otherwise(F.lit("")),
        ),
    )
    return gopher_quality(injected, min_words=5).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac",
        "stop_hits",
        "gopher_ok",
    )


def _gopher_oracle() -> str:
    from autoscan_spark.operators.textstats import GOPHER_STOPWORDS

    stop_sum = " + ".join(
        f"(CASE WHEN list_contains(words, '{w}') THEN 1 ELSE 0 END)"
        for w in GOPHER_STOPWORDS
    )
    return rf"""
WITH injected AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 11 = 0 THEN '- ' ELSE '' END) || text ||
         (CASE WHEN doc_id % 3 = 0 THEN ' and that have with' ELSE '' END) ||
         (CASE WHEN doc_id % 7 = 0 THEN ' #####' ELSE '' END) ||
         (CASE WHEN doc_id % 5 = 0 THEN ' ...' ELSE '' END) AS text
  FROM documents
), toks AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(lower(text)), '\s+') AS words,
         string_split(text, chr(10)) AS lines
  FROM injected
), sig AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    length(regexp_replace(text, '\s+', '', 'g')) / greatest(len(words), 1) AS mean_word_len,
    ((length(text) - length(replace(text, '#', '')))
     + (length(text) - length(replace(text, '...', ''))) / 3
     + (length(text) - length(replace(text, '…', '')))) / greatest(len(words), 1) AS symbol_ratio,
    len(list_filter(lines, l -> substring(ltrim(l), 1, 1) = '-'
        OR substring(ltrim(l), 1, 1) = '*'
        OR substring(ltrim(l), 1, 1) = '•')) / greatest(len(lines), 1) AS bullet_line_frac,
    len(list_filter(lines, l -> right(rtrim(l), 3) = '...'
        OR right(rtrim(l), 1) = '…')) / greatest(len(lines), 1) AS ellipsis_line_frac,
    len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) / greatest(len(words), 1) AS alpha_word_frac,
    CAST({stop_sum} AS BIGINT) AS stop_hits
  FROM toks
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
       ellipsis_line_frac, alpha_word_frac, stop_hits,
       (n_words >= 5 AND n_words <= 100000
        AND mean_word_len >= 3 AND mean_word_len <= 10
        AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
        AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
        AND stop_hits >= 2) AS gopher_ok
FROM sig"""


def q_lang_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-mixture table (XLM-R-style alpha=0.5 resampling): per
    language, corpus count and the downsample-only keep rate. sqrt and
    division are both correctly rounded under IEEE-754, so keep_rate is
    bit-identical cross-engine."""
    from autoscan_spark.operators.sampling import temperature_rates

    return temperature_rates(_docs(spark, sf_dir), "lang").select(
        "lang", "n_docs", "keep_rate"
    )


_Q_LANG_MIX_SQL = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
)
SELECT lang, n_docs,
       sqrt(CAST((SELECT min(n_docs) FROM counts) AS DOUBLE) / n_docs) AS keep_rate
FROM counts"""


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature-resampled corpus: keep a doc iff its md5
    bucket falls under its language's alpha=0.5 keep rate. The rates table
    broadcasts; the sampling pass is shuffle-free."""
    from autoscan_spark.operators.sampling import temperature_sample

    return temperature_sample(_docs(spark, sf_dir), "lang", "doc_id").select(
        "doc_id", "lang"
    )


_Q_TEMP_SAMPLE_SQL = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
), rates AS (
  SELECT lang,
         sqrt(CAST((SELECT min(n_docs) FROM counts) AS DOUBLE) / n_docs) AS keep_rate
  FROM counts
)
SELECT doc_id, lang
FROM documents JOIN rates USING (lang)
WHERE CAST(('0x' || substring(md5(concat('temp-v1', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
           % 1000000 AS DOUBLE) < keep_rate * 1000000"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-GLOBAL line dedup (the C4/RefinedWeb pass): keep the first
    occurrence corpus-wide of each distinct line, reassemble docs from
    surviving lines in order. The raw corpus is single-line word soup, so
    line structure is synthesized deterministically by treating the
    frequent token ' value ' as a line boundary (plain string replace,
    mirrored in the oracle)."""
    from autoscan_spark.operators.dedup import line_dedup

    docs = _docs(spark, sf_dir)
    lined = docs.withColumn("text", F.expr("replace(text, ' value ', '\\n')"))
    return line_dedup(lined).select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        F.md5("dedup_text").alias("dedup_md5"),
    )


_Q_LINE_DEDUP_SQL = """
WITH lined AS (
  SELECT doc_id, replace(text, ' value ', chr(10)) AS text FROM documents
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
  FROM lined
), kept AS (
  SELECT * FROM (
    SELECT doc_id, line, pos FROM lines WHERE trim(line) <> ''
    QUALIFY row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) = 1
  )
  UNION ALL
  SELECT doc_id, line, pos FROM lines WHERE trim(line) = ''
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_kept,
         string_agg(line, chr(10) ORDER BY pos) AS dedup_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines_total,
       coalesce(a.n_lines_kept, 0) AS n_lines_kept,
       md5(coalesce(a.dedup_text, '')) AS dedup_md5
FROM lined d LEFT JOIN agg a USING (doc_id)"""


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level corpus dedup (RefinedWeb's coarser sibling of the
    line pass): same first-occurrence machinery, '\\n\\n' separator, via
    line_dedup's separator parameter — using the preagg (hot-key) strategy
    so BOTH strategies carry oracle evidence. Paragraph breaks are
    synthesized from the genuinely-frequent corpus token ' value ' (same
    token _Q_LINE_DEDUP_SQL uses; plain replace, mirrored in the
    oracle)."""
    from autoscan_spark.operators.dedup import line_dedup

    docs = _docs(spark, sf_dir)
    para = docs.withColumn(
        "text", F.expr("replace(text, ' value ', '\\n\\n')")
    )
    return line_dedup(para, line_sep="\n\n", strategy="preagg").select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        F.md5("dedup_text").alias("dedup_md5"),
    )


_Q_PARA_DEDUP_SQL = """
WITH lined AS (
  SELECT doc_id, replace(text, ' value ', chr(10) || chr(10)) AS text
  FROM documents
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10) || chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10) || chr(10))))) AS pos
  FROM lined
), kept AS (
  SELECT * FROM (
    SELECT doc_id, line, pos FROM lines WHERE trim(line) <> ''
    QUALIFY row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) = 1
  )
  UNION ALL
  SELECT doc_id, line, pos FROM lines WHERE trim(line) = ''
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_kept,
         string_agg(line, chr(10) || chr(10) ORDER BY pos) AS dedup_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, chr(10) || chr(10))) AS BIGINT)
         AS n_lines_total,
       coalesce(a.n_lines_kept, 0) AS n_lines_kept,
       md5(coalesce(a.dedup_text, '')) AS dedup_md5
FROM lined d LEFT JOIN agg a USING (doc_id)"""


def q_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM rarity per doc (CCNet-style fluency signal):
    exact integer rare-transition counts + order-independent min MLE
    probability (cross-engine-stable by construction)."""
    from autoscan_spark.operators.textstats import bigram_rarity

    return bigram_rarity(_docs(spark, sf_dir))


_Q_BIGRAM_RARITY_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
  FROM documents
), bi AS (
  SELECT doc_id,
         unnest(ws[1:len(ws) - 1]) AS w1,
         unnest(ws[2:len(ws)]) AS w2
  FROM w WHERE len(ws) >= 2
), c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bi GROUP BY w1
)
SELECT bi.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN c12.c12 <= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare_bigrams,
       min(c12.c12 / c1.c1) AS min_bigram_p
FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY bi.doc_id"""


def q_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a crawl delta against a prior snapshot: even
    doc_ids are the snapshot, odd doc_ids the delta, and every doc_id % 10
    == 1 delta doc deterministically carries the text of its even
    predecessor (guaranteed overlap, the raw corpus being near-unique).
    Returns the delta survivors."""
    from autoscan_spark.operators.dedup import dedup_against

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    donor = old.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("dup_text")
    )
    new = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .join(donor, "doc_id", "left")
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 1, F.coalesce("dup_text", "text")
            ).otherwise(F.col("text")),
        )
        .select("doc_id", "text")
    )
    return dedup_against(new, old).select("doc_id")


_Q_SNAPSHOT_DEDUP_SQL = """
WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
), delta AS (
  SELECT n.doc_id,
         CASE WHEN n.doc_id % 10 = 1 THEN coalesce(o.text, n.text)
              ELSE n.text END AS text
  FROM documents n LEFT JOIN old o ON o.doc_id = n.doc_id - 1
  WHERE n.doc_id % 2 = 1
)
SELECT d.doc_id FROM delta d
WHERE NOT EXISTS (SELECT 1 FROM old o WHERE md5(o.text) = md5(d.text))"""


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus packing: keep documents per language, in deterministic hash
    order, until a 2000-token-per-language budget is reached — the "build
    an N-token training mix" selection step."""
    from autoscan_spark.operators.sampling import token_budget_sample
    from autoscan_spark.operators.textstats import token_counts

    toks = token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "lang", F.col("n_ws_tokens").alias("n_tokens")
    )
    return token_budget_sample(
        toks, 2000, key_col="doc_id", token_col="n_tokens", strata_col="lang"
    ).select("doc_id", "lang", "n_tokens")


_Q_TOKEN_BUDGET_SQL = """
WITH toks AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substring(md5(concat('budget-v1', CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
         % 1000000 AS b
  FROM documents
), cum AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY b, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM toks
)
SELECT doc_id, lang, n_tokens FROM cum WHERE c <= 2000"""


def q_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average corpus unigram probability per document (rational
    perplexity proxy; exact integer aggregates, one final division)."""
    from autoscan_spark.operators.textstats import unigram_familiarity

    return unigram_familiarity(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "sum_counts", "familiarity"
    )


_Q_FAMILIARITY_SQL = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), freqs AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w
), total AS (
  SELECT sum(c) AS tot FROM freqs
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(c) AS BIGINT) AS sum_counts,
       (CAST(sum(c) AS BIGINT) / CAST(count(*) AS BIGINT)) / (SELECT tot FROM total) AS familiarity
FROM words JOIN freqs USING (w)
GROUP BY doc_id"""


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal: lines occurring in ≥3
    distinct documents are stripped from every document (CCNet-style
    template/nav removal — the complement of line_dedup's keep-first).
    Line structure synthesized as in line_dedup (' value ' boundary)."""
    from autoscan_spark.operators.dedup import strip_boilerplate_lines

    docs = _docs(spark, sf_dir)
    lined = docs.withColumn("text", F.expr("replace(text, ' value ', '\\n')"))
    return strip_boilerplate_lines(lined, min_docs=3).select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        F.md5("clean_text").alias("clean_md5"),
    )


_Q_BOILERPLATE_SQL = """
WITH lined AS (
  SELECT doc_id, replace(text, ' value ', chr(10)) AS text FROM documents
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
  FROM lined
), flagged AS (
  SELECT md5(line) AS h FROM lines WHERE trim(line) <> ''
  GROUP BY md5(line) HAVING count(DISTINCT doc_id) >= 3
), kept AS (
  SELECT doc_id, line, pos FROM lines
  WHERE md5(line) NOT IN (SELECT h FROM flagged)
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines_kept,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines_total,
       coalesce(a.n_lines_kept, 0) AS n_lines_kept,
       md5(coalesce(a.clean_text, '')) AS clean_md5
FROM lined d LEFT JOIN agg a USING (doc_id)"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot reconciliation via FULL OUTER join: 'old' = even
    doc_ids, 'new' = doc_ids not divisible by 3 with every 5th text
    deterministically mutated — classify each doc added / removed /
    changed / unchanged (the nightly diff of a continuously rebuilt
    corpus)."""
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.col("text").alias("old_text")
    )
    new = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            )
            .otherwise(F.col("text"))
            .alias("new_text"),
        )
    )
    joined = old.join(new, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_text").isNull(), F.lit("added"))
        .when(F.col("new_text").isNull(), F.lit("removed"))
        .when(F.col("old_text") != F.col("new_text"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("status", status)
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


_Q_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT doc_id, text AS old_text FROM documents WHERE doc_id % 2 = 0
), new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS new_text
  FROM documents WHERE doc_id % 3 <> 0
)
SELECT CASE WHEN old_text IS NULL THEN 'added'
            WHEN new_text IS NULL THEN 'removed'
            WHEN old_text <> new_text THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(count(*) AS BIGINT) AS n_docs
FROM old FULL OUTER JOIN new USING (doc_id)
GROUP BY 1"""


def q_lang_source_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT breadth: documents per (source, language) as one wide row per
    source — Spark's groupBy().pivot() with an EXPLICIT value list (the
    implicit form needs an extra distinct-collection job; the oracle
    mirrors it as conditional aggregation)."""
    langs = ["de", "en", "es", "fr", "zh"]
    docs = _docs(spark, sf_dir)
    wide = (
        docs.groupBy("source")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))  # Spark 4 rejects count(*) inside pivot
    )
    out = wide.select(
        "source",
        *[F.coalesce(F.col(lg), F.lit(0)).cast("long").alias(f"n_{lg}") for lg in langs],
    )
    return out


_Q_PIVOT_SQL = """
SELECT source,
       CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS n_de,
       CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
       CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS n_es,
       CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS n_fr,
       CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS n_zh
FROM documents
GROUP BY source"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence prep: overlapping 32-token windows every 24
    tokens per document (shuffle-free JVM chunking)."""
    from autoscan_spark.operators.textstats import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), window_tokens=32, stride=24
    ).select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


_Q_CHUNK_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
), c AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(floor((len(words) - 1) / 24) AS INT))) AS chunk_id,
         words
  FROM w
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(chunk_id * 24 AS BIGINT) AS chunk_start,
       CAST(len(words[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(words[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')) AS chunk_md5
FROM c"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured breadth: JSON property extraction from the events
    ``props`` column (get_json_object ≙ DuckDB json_extract_string),
    aggregated per event type in exact integers."""
    ev = _events(spark, sf_dir)
    return (
        # try_cast: under ANSI mode a non-integer $.k must degrade to NULL
        # (mirrored by DuckDB TRY_CAST), not crash the job
        ev.withColumn(
            "k", F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


_Q_JSON_PROPS_SQL = """
SELECT event_type,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type"""


def q_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization, oracle-checked against DuckDB's
    nfc_normalize (both UAX #15). Combining sequences and a ligature are
    injected deterministically — the raw corpus is ASCII."""
    from autoscan_spark.operators.textstats import normalize_text

    # injected via a Python literal: Spark SQL's chr() wraps at 256, so
    # chr(769) is NOT the combining acute there (DuckDB's chr is full
    # codepoint — the oracle keeps chr())
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" cafe\u0301 \ufb01ne, no\u0308el")),
    
    )
    return normalize_text(docs).select(
        "doc_id",
        F.length("normalized").cast("long").alias("n_chars_norm"),
        F.md5("normalized").alias("norm_md5"),
    )


_Q_NFC_SQL = """
SELECT doc_id,
       CAST(length(n) AS BIGINT) AS n_chars_norm,
       md5(n) AS norm_md5
FROM (SELECT doc_id,
             nfc_normalize(concat(text, ' cafe', chr(769), ' ', chr(64257),
                                  'ne, no', chr(776), 'el')) AS n
      FROM documents)"""


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length quantiles (p50/p90/p99, linear interpolation) —
    Spark exact `percentile` vs DuckDB `quantile_cont` (same estimator)."""
    docs = _docs(spark, sf_dir)
    q = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))").alias("__q"),
        F.count("*").cast("long").alias("n_docs"),
    )
    return q.select(
        "lang",
        F.round(F.col("__q")[0], 6).alias("p50"),
        F.round(F.col("__q")[1], 6).alias("p90"),
        F.round(F.col("__q")[2], 6).alias("p99"),
        "n_docs",
    )


_Q_LENQ_SQL = """
SELECT lang,
       round(quantile_cont(n_chars, 0.5), 6) AS p50,
       round(quantile_cont(n_chars, 0.9), 6) AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang"""


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass column profile of the documents table
    (exact distinct for the oracle; production uses HLL approx)."""
    from autoscan_spark.operators.profile import profile_table

    return profile_table(_docs(spark, sf_dir), exact_distinct=True)


_Q_PROFILE_SQL = r"""
SELECT 'doc_id' AS column, 'bigint' AS dtype, count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(min(doc_id) AS VARCHAR) AS min_value, CAST(max(doc_id) AS VARCHAR) AS max_value
FROM documents
UNION ALL
SELECT 'text', 'string', count(*),
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT text) AS BIGINT), min(text), max(text) FROM documents
UNION ALL
SELECT 'lang', 'string', count(*),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT lang) AS BIGINT), min(lang), max(lang) FROM documents
UNION ALL
SELECT 'source', 'string', count(*),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT source) AS BIGINT), min(source), max(source) FROM documents
UNION ALL
SELECT 'n_chars', 'bigint', count(*),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT n_chars) AS BIGINT),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over the events stream: users whose first view →
    click → purchase occurred in strictly increasing time order."""
    from autoscan_spark.operators.temporal import funnel_counts

    return funnel_counts(_events(spark, sf_dir), ["view", "click", "purchase"])


_Q_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
  FROM events GROUP BY user_id
), r AS (
  SELECT (t0 IS NOT NULL) AS r0,
         (t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0) AS r1,
         (t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
          AND t2 IS NOT NULL AND t2 > t1) AS r2
  FROM per_user
)
SELECT 0 AS step_idx, 'view' AS step,
       CAST(coalesce(sum(CASE WHEN r0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_users FROM r
UNION ALL
SELECT 1, 'click',
       CAST(coalesce(sum(CASE WHEN r1 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM r
UNION ALL
SELECT 2, 'purchase',
       CAST(coalesce(sum(CASE WHEN r2 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM r"""


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line cleaning. The synthetic corpus is single-line, so line
    structure is injected deterministically (every ' table '/' row ' becomes
    '.\\n' and a terminal '.' is appended) — same injection pattern as
    scrub_pii."""
    from autoscan_spark.operators.textstats import c4_clean

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.expr(
            "concat(regexp_replace(text, ' (table|row) ', concat('.', chr(10))), '.')"
        ),
    )
    return c4_clean(docs).select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        F.md5("clean_text").alias("clean_md5"),
        "c4_keep",
    )


_Q_C4_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         concat(regexp_replace(text, ' (table|row) ', '.' || chr(10), 'g'), '.') AS text
  FROM documents
), cleaned AS (
  SELECT doc_id,
         regexp_split_to_array(text, chr(10)) AS lines,
         list_filter(regexp_split_to_array(text, chr(10)),
                     l -> regexp_matches(trim(l), '[.!?"]$')
                          AND len(regexp_split_to_array(trim(l), '\s+')) >= 3) AS kept,
         text
  FROM injected
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines_total,
       CAST(len(kept) AS BIGINT) AS n_lines_kept,
       md5(array_to_string(kept, chr(10))) AS clean_md5,
       (len(kept) >= 1 AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{')) AS c4_keep
FROM cleaned"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: benchmark = the first 12 words of every
    25th document (so contamination exists by construction); per-doc 8-gram
    overlap ppm + gate. The benchmark window set broadcasts — the corpus
    side never shuffles."""
    from autoscan_spark.operators.dedup import benchmark_contamination

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.expr("doc_id % 25 = 0")).select(
        F.expr(
            "concat_ws(' ', slice(split(trim(text), '\\\\s+'), 1, 12))"
        ).alias("text")
    )
    return benchmark_contamination(docs, bench, n=8)


_Q_DECONTAM_SQL = r"""
WITH bench AS (
  SELECT array_to_string(words[1:12], ' ') AS text
  FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents WHERE doc_id % 25 = 0)
), bw AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, len(words) - 7),
                         i -> unhex(md5(array_to_string(words[i:i+7], ' '))))) AS wh
  FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS words FROM bench)
  WHERE len(words) >= 8
), dw AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(words) - 7),
                i -> unhex(md5(array_to_string(words[i:i+7], ' '))))) AS wh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents)
  WHERE len(words) >= 8
), agg AS (
  SELECT dw.doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN bw.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated
  FROM dw LEFT JOIN bw USING (wh)
  GROUP BY dw.doc_id
)
SELECT doc_id, n_windows, n_contaminated,
       CAST(round(n_contaminated * 1000000.0 / n_windows, 0) AS BIGINT)
         AS contamination_ppm,
       n_contaminated * 1000000 > 0 * n_windows AS contaminated
FROM agg"""


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption pair prep over documents, deterministic by
    md5-hash span placement — cross-engine-exact, zero shuffles."""
    from autoscan_spark.operators.textstats import span_corruption

    return span_corruption(_docs(spark, sf_dir))


_Q_SPAN_CORRUPTION_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents
), f AS (
  SELECT doc_id, ws, (len(ws) // 20)::INT AS nfull FROM w WHERE len(ws) >= 20
), o AS (
  SELECT doc_id, ws, nfull,
    list_transform(generate_series(0, nfull - 1), k ->
      (('0x' || substr(md5(doc_id::VARCHAR || '#' || k::VARCHAR), 1, 8))::BIGINT
        % 18)::INT) AS offs
  FROM f
)
SELECT doc_id,
  array_to_string(flatten(list_concat(
    list_transform(generate_series(0, nfull - 1), k ->
      list_concat(
        ws[k * 20 + 1 : k * 20 + offs[k + 1]],
        list_concat(
          ['<extra_id_' || k::VARCHAR || '>'],
          ws[k * 20 + offs[k + 1] + 4 : (k + 1) * 20]))),
    [ws[nfull * 20 + 1 : len(ws)]])), ' ') AS input_text,
  array_to_string(flatten(list_concat(
    list_transform(generate_series(0, nfull - 1), k ->
      list_concat(
        ['<extra_id_' || k::VARCHAR || '>'],
        ws[k * 20 + offs[k + 1] + 1 : k * 20 + offs[k + 1] + 3])),
    [['<extra_id_' || nfull::VARCHAR || '>']])), ' ') AS target_text,
  CAST(nfull * 3 AS BIGINT) AS n_masked
FROM o"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid readability per document: exact integer
    word/sentence/syllable counts + one fixed double expression
    (cross-engine bit-stable; zero shuffles)."""
    from autoscan_spark.operators.textstats import readability

    return readability(_docs(spark, sf_dir))


_Q_READABILITY_SQL = r"""
SELECT doc_id,
  CAST(len(ws) AS BIGINT) AS n_words,
  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
    AS n_sentences,
  CAST(list_sum(list_transform(ws, x ->
    greatest(1, len(regexp_extract_all(lower(x), '[aeiouy]+')))))
    AS BIGINT) AS n_syllables,
  0.39 * (len(ws)::DOUBLE /
          greatest(1, len(regexp_extract_all(text, '[.!?]+')))) +
  11.8 * (list_sum(list_transform(ws, x ->
            greatest(1, len(regexp_extract_all(lower(x), '[aeiouy]+')))))::DOUBLE
          / len(ws)) - 15.59 AS fk_grade
FROM (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
)"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local greedy sequence packing of 64-token document chunks
    into 512-token training examples (rows-only: the capacity-reset fold
    is a running-state recursion SQL cannot express; a Python-replay
    differential pins semantics in pytest; num_partitions fixed so the
    hash partitioning — and therefore the output — is deterministic)."""
    from autoscan_spark.operators.sampling import pack_sequences
    from autoscan_spark.operators.textstats import chunk_documents

    chunks = chunk_documents(_docs(spark, sf_dir), window_tokens=64)
    return pack_sequences(chunks, capacity=512, num_partitions=8)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end: synthesize a deterministic media
    corpus (PPM images, PCM-16 WAV audio, PPM-in-AVI video), REAL-decode
    every payload, emit FEATURE_DIM bucket-mean features per item
    (rows-only: binary synthesis + decode is not SQL-expressible)."""
    from autoscan_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    return extract_features(synthesize_media(spark, 120, seed=42))


def q_lsh_recall_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the hyperplane-LSH approximate top-k vs the exact
    brute-force top-k, per query (r5 verdict item 4: a driver-visible,
    oracle-checked quality metric for the approximate ANN path). The
    hyperplanes are md5-derived (``md5_hyperplanes``) so DuckDB replays
    the ENTIRE pipeline — bucketing, candidate join, scoring, ranking,
    overlap — not just the exact side."""
    from autoscan_spark.operators.similarity import lsh_recall, md5_hyperplanes

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return lsh_recall(
        emb,
        emb.filter(F.col("vec_id") < 50),
        k=5,
        planes_matrix=md5_hyperplanes(12, 5, 64),
    )


_Q_LSH_RECALL_SQL = """
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
planes AS (
  SELECT t.range AS table_id, p.range AS plane,
         list((('0x'||substr(md5(t.range||':'||p.range||':'||d.range),1,8))::BIGINT)
              / 4294967296.0 - 0.5 ORDER BY d.range) AS comps
  FROM range(12) t, range(5) p, range(64) d
  GROUP BY t.range, p.range
),
sigs AS (
  SELECT e.vec_id, p.table_id,
         CAST(sum(CASE WHEN list_inner_product(e.v, p.comps) > 0
                       THEN 1<<p.plane ELSE 0 END) AS BIGINT) AS bucket
  FROM emb e CROSS JOIN planes p
  GROUP BY e.vec_id, p.table_id
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sigs q JOIN sigs c ON q.table_id = c.table_id AND q.bucket = c.bucket
  WHERE q.vec_id < 50 AND q.vec_id <> c.vec_id
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT cand.query_id, cand.neighbor_id,
           round(list_cosine_similarity(eq.v, ec.v), 6) AS cosine_r
    FROM cand JOIN emb eq ON eq.vec_id = cand.query_id
              JOIN emb ec ON ec.vec_id = cand.neighbor_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_r DESC, neighbor_id) <= 5
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_cosine_similarity(q.v, c.v), 6) AS cosine_r
    FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 50
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_r DESC, neighbor_id) <= 5
),
hits AS (
  SELECT a.query_id, count(*) AS n
  FROM approx a JOIN exact e
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY a.query_id
)
SELECT q.vec_id AS query_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n, 0) * 200000 AS BIGINT) AS recall_ppm
FROM (SELECT vec_id FROM emb WHERE vec_id < 50) q
LEFT JOIN hits h ON h.query_id = q.vec_id"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion effect: ppm share of Q1-1997 revenue from
    PROMO-type parts (exact integer cents → single bit-stable row). The
    date filter is a pushdown-eligible scan predicate; part joins under
    AQE (classic broadcast side at TPC-H scale ratios)."""
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    part = _table(spark, sf_dir, "part")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    rev = f"{price} * (100 - {disc})"
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.expr(
                f"sum(CASE WHEN p_type = 'PROMO' THEN {rev} ELSE 0 END)"
            ).alias("promo_rev_c4"),
            F.expr(f"sum({rev})").alias("total_rev_c4"),
        )
        .withColumn(
            "promo_ppm",
            F.expr("CAST(1000000 AS BIGINT) * promo_rev_c4 DIV total_rev_c4"),
        )
    )


_Q_PROMO_SQL = """
WITH j AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev_c4,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c4 ELSE 0 END) AS BIGINT)
         AS promo_rev_c4,
       CAST(sum(rev_c4) AS BIGINT) AS total_rev_c4,
       CAST(1000000 * sum(CASE WHEN p_type = 'PROMO' THEN rev_c4 ELSE 0 END)
            // sum(rev_c4) AS BIGINT) AS promo_ppm
FROM j"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: orders whose total line
    quantity exceeds 200, top-100 by total price. The HAVING filter runs
    on the lineitem-only aggregate BEFORE the orders/customer joins (the
    Q18 plan shape — the expensive join sees only qualifying keys);
    sort+limit compiles to TakeOrdered."""
    li = _table(spark, sf_dir, "lineitem")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.expr("sum(CAST(l_quantity AS BIGINT))").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer")
    price = _CENTS.format(col="o_totalprice")
    return (
        qty.join(orders, qty.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.expr(price).alias("o_totalprice_c"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice_c").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


_Q_LARGE_ORDERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_totalprice_c,
       total_qty
FROM (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 200
) q
JOIN orders ON q.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice_c DESC, o_orderkey ASC
LIMIT 100"""


def q_supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit rollup (adapted to this slim schema: no
    partsupp, so revenue not net profit): lineitem ⋈ supplier ⋈ nation ⋈
    orders, grouped by supplier nation × order year, exact integer cents.
    nation is explicitly broadcast (25 rows); supplier joins under AQE."""
    li = _table(spark, sf_dir, "lineitem")
    supp = _table(spark, sf_dir, "supplier")
    nation = _table(spark, sf_dir, "nation")
    orders = _table(spark, sf_dir, "orders")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.expr(f"sum({price} * (100 - {disc}))").alias("revenue_c4"))
    )


_Q_SUPP_NATION_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_c4
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2"""


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping between two nations: revenue flowing
    supplier-nation → customer-nation for the (NATION_18, NATION_19) pair in
    both directions, by order year. Both nation dimensions broadcast; the
    nation filters sit UNDER the joins so only qualifying suppliers/
    customers reach the lineitem join."""
    li = _table(spark, sf_dir, "lineitem")
    supp = _table(spark, sf_dir, "supplier")
    cust = _table(spark, sf_dir, "customer")
    orders = _table(spark, sf_dir, "orders")
    nation = _table(spark, sf_dir, "nation")
    pair = ("NATION_18", "NATION_19")
    n1 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.expr(f"sum({price} * (100 - {disc}))").alias("revenue_c4"))
    )


_Q_VOLUME_SHIP_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_c4
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_18', 'NATION_19')
  AND n2.n_name IN ('NATION_18', 'NATION_19')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3"""


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by linear-idf TF-IDF
    (exact integers — see ``textstats.tfidf_top_terms`` for why the
    log-damped variant is deliberately left to consumers)."""
    from autoscan_spark.operators.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


_Q_TFIDF_SQL = r"""
WITH terms AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM terms WHERE term <> '' GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY tf * 1000000 // df DESC, term)
            AS INTEGER) AS rank,
       term, tf, df, n_docs,
       CAST(tf * 1000000 // df AS BIGINT) AS score_ppm
FROM tf JOIN dfreq USING (term) CROSS JOIN n
QUALIFY rank <= 3"""


def q_repeat_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture materialization with fractional per-source epoch counts
    (2.25 / 1.0 / 0.5 / default 1.5): deterministic md5-keyed extra
    copies, zero shuffles (see ``sampling.repeat_upsample``)."""
    from autoscan_spark.operators.sampling import repeat_upsample

    out = repeat_upsample(
        _docs(spark, sf_dir),
        strata_col="source",
        key_col="doc_id",
        epochs={"src0": 2.25, "src1": 1.0, "src2": 0.5},
        default=1.5,
    )
    return out.select("doc_id", "source", "copy_idx")


_Q_REPEAT_SQL = """
WITH w AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
                     WHEN 'src2' THEN 0 ELSE 1 END
         + CASE WHEN ('0x' || substr(md5('epochs-v1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
                     < (CASE source WHEN 'src0' THEN 250000 WHEN 'src1' THEN 0
                                    WHEN 'src2' THEN 500000 ELSE 500000 END)
                THEN 1 ELSE 0 END AS n_copies
  FROM documents
)
SELECT doc_id, source, CAST(unnest(range(n_copies)) AS INTEGER) AS copy_idx
FROM w WHERE n_copies > 0"""


def q_prompt_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-conversation user-prompt dedup: one surviving (conv, turn)
    per distinct normalized prompt with its duplicate count (one window
    shuffle — see ``conversations.dedup_prompts``)."""
    from autoscan_spark.operators.conversations import dedup_prompts

    return dedup_prompts(transcripts_from_documents(spark, sf_dir))


_Q_PROMPT_DEDUP_SQL = f"""{_TR},
keyed AS (
  SELECT conv_id, turn_idx, text,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS pk
  FROM tr WHERE role = 'user'
)
SELECT conv_id, turn_idx, text AS prompt,
       CAST(count(*) OVER (PARTITION BY pk) AS BIGINT) AS n_dupes
FROM keyed
QUALIFY row_number() OVER (PARTITION BY pk ORDER BY conv_id, turn_idx) = 1"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: among revenue billed to ASIA-region
    customers, NATION_8 suppliers' ppm share per order year. The region
    filter sits under the customer join (only ASIA customers reach the
    fact join); nation/region dims broadcast; exact integer cents, ppm
    by integer division → bit-stable cross-engine.

    r07 plan shape (guide §2.3/§8): the r06 formulation shuffled the
    lineitem ⋈ orders FACT intermediate twice — by o_custkey for the
    customer semi-filter and again by l_suppkey for the supplier join
    (the planner's post-join size estimates are inflated, so neither
    small side auto-broadcast). Now (a) the ASIA customer keyset — pure
    c_custkey ints, the guide-§8 "broadcast the plan" shape, ~240 MB at
    sf100k (region keeps 1/5 of customers) — carries an explicit
    broadcast hint, and (b) revenue is pre-aggregated per
    (l_suppkey, o_year) BEFORE the supplier join (integer sums
    reassociate exactly), so the supplier join and the final rollup see
    |suppliers|×|years| rows, not the fact table. Fact-sized exchanges:
    2 → 0 locally (orders broadcasts at bench scale); at cluster scale
    the one unavoidable fact shuffle is the l_orderkey SMJ with orders."""
    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer")
    supp = _table(spark, sf_dir, "supplier")
    nation = _table(spark, sf_dir, "nation")
    region = _table(spark, sf_dir, "region")
    cust_region = (
        cust.join(
            F.broadcast(
                nation.join(
                    region.filter(F.col("r_name") == "ASIA"),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("__snk"), "n_name")),
        supp.s_nationkey == F.col("__snk"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    rev = f"{price} * (100 - {disc})"
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_region), orders.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("l_suppkey"), F.year("o_orderdate").alias("o_year"))
        .agg(F.expr(f"sum({rev})").alias("__rev_c4"))
    )
    return (
        per_supp.join(supp_nation, per_supp.l_suppkey == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            F.expr(
                "sum(CASE WHEN supp_nation = 'NATION_8' THEN __rev_c4 ELSE 0 END)"
            ).alias("nation_rev_c4"),
            F.expr("sum(__rev_c4)").alias("total_rev_c4"),
        )
        .withColumn(
            "share_ppm",
            F.expr(
                "CAST(1000000 AS BIGINT) * nation_rev_c4 DIV total_rev_c4"
            ),
        )
    )


_Q_MARKET_SHARE_SQL = """
WITH j AS (
  SELECT year(o_orderdate) AS o_year, sn.n_name AS supp_nation,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev_c4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA'
)
SELECT CAST(o_year AS INTEGER) AS o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_8' THEN rev_c4 ELSE 0 END)
            AS BIGINT) AS nation_rev_c4,
       CAST(sum(rev_c4) AS BIGINT) AS total_rev_c4,
       CAST(1000000 * sum(CASE WHEN supp_nation = 'NATION_8' THEN rev_c4 ELSE 0 END)
            // sum(rev_c4) AS BIGINT) AS share_ppm
FROM j GROUP BY o_year"""


def q_ivf_recall_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the deterministic-IVF path vs exact brute force — the
    IVF counterpart of ``lsh_recall_at_5``. Centroids are the first 16
    corpus vectors in md5(id) order and every ranking uses
    round(cosine, 6) with id tie-breaks, so DuckDB replays the ENTIRE
    pipeline: centroid pick, cell assignment, probing, candidate join,
    scoring, overlap (see ``similarity.ivf_recall``)."""
    from autoscan_spark.operators.similarity import ivf_recall

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ivf_recall(
        emb, emb.filter(F.col("vec_id") < 50), k=5, n_cells=16, nprobe=4
    )


_Q_IVF_RECALL_SQL = """
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, v FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
cellrank AS (
  SELECT e.vec_id, c.cent_id,
         row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.v, c.v), 6) DESC,
                      c.cent_id) AS rk
  FROM emb e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id AS neighbor_id, cent_id AS cell FROM cellrank WHERE rk = 1
),
probe AS (
  SELECT vec_id AS query_id, cent_id AS cell
  FROM cellrank WHERE vec_id < 50 AND rk <= 4
),
cand AS (
  SELECT DISTINCT p.query_id, a.neighbor_id
  FROM probe p JOIN assign a ON p.cell = a.cell
  WHERE p.query_id <> a.neighbor_id
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT cand.query_id, cand.neighbor_id,
           round(list_cosine_similarity(eq.v, ec.v), 6) AS cosine_r
    FROM cand JOIN emb eq ON eq.vec_id = cand.query_id
              JOIN emb ec ON ec.vec_id = cand.neighbor_id
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_r DESC, neighbor_id) <= 5
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_cosine_similarity(q.v, c.v), 6) AS cosine_r
    FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 50
  ) QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_r DESC, neighbor_id) <= 5
),
hits AS (
  SELECT a.query_id, count(*) AS n
  FROM approx a JOIN exact e
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY a.query_id
)
SELECT q.vec_id AS query_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n, 0) * 200000 AS BIGINT) AS recall_ppm
FROM (SELECT vec_id FROM emb WHERE vec_id < 50) q
LEFT JOIN hits h ON h.query_id = q.vec_id"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup survivors over the embeddings table
    (rows-only: the k-means quantizer + Arrow assignment kernel is not
    SQL-expressible; a numpy differential and planted-duplicate tests pin
    the semantics in tests/test_dedup_similarity.py)."""
    from autoscan_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # n_cells auto: cells scale with the corpus (fixed expected cell size)
    # so the within-cell pairwise step stays linear at the sf1 rung
    return semantic_dedup(
        emb, threshold=0.4, kmeans_iterations=4
    ).select("vec_id", "label")


def q_conv_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation structural-hygiene gate (role-repeat runs, canonical
    user-first / assistant-last envelope). The synthesized transcripts
    alternate roles perfectly, so — like ``marker_scrub`` injecting its
    marker — roles are first perturbed deterministically (md5-keyed 25%
    forced to 'user') so every flag provably fires in both engines."""
    tr = transcripts_from_documents(spark, sf_dir)
    from autoscan_spark.operators.conversations import conversation_hygiene

    perturbed = tr.withColumn(
        "role",
        F.expr(
            "CASE WHEN substring(md5(concat(conv_id, ':',"
            " cast(turn_idx as string))), 1, 1) < '4'"
            " THEN 'user' ELSE role END"
        ),
    )
    return conversation_hygiene(perturbed)


_Q_CONV_HYGIENE_SQL = f"""{_TR},
p AS (
  SELECT conv_id, turn_idx,
         CASE WHEN substr(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)), 1, 1) < '4'
              THEN 'user' ELSE role END AS role
  FROM tr
),
l AS (
  SELECT conv_id, turn_idx, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM p
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN role = prev THEN 1 ELSE 0 END) AS BIGINT) AS n_role_repeats,
       (arg_min(role, turn_idx) = 'user') AS starts_with_user,
       (arg_max(role, turn_idx) = 'assistant') AS ends_with_assistant,
       (sum(CASE WHEN role = prev THEN 1 ELSE 0 END) = 0
        AND arg_min(role, turn_idx) = 'user'
        AND arg_max(role, turn_idx) = 'assistant') AS is_clean
FROM l GROUP BY conv_id"""


_TRIM_BUDGET = 60


def q_context_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window trimming: longest whole-turn suffix of each
    conversation within a 60-token budget (most recent turn always
    survives) — one descending window per conversation, no join."""
    tr = transcripts_from_documents(spark, sf_dir)
    from autoscan_spark.operators.conversations import trim_context

    return trim_context(tr, _TRIM_BUDGET)


_Q_CONTEXT_TRIM_SQL = f"""{_TR},
t AS (
  SELECT conv_id, turn_idx, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
  FROM tr
),
c AS (
  SELECT conv_id, turn_idx, text, CAST(nt AS BIGINT) AS n_tokens,
         CAST(sum(nt) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS suffix_tokens,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) AS rd
  FROM t
)
SELECT conv_id, turn_idx, text, n_tokens, suffix_tokens
FROM c WHERE suffix_tokens <= {_TRIM_BUDGET} OR rd = 1"""


def q_orders_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT join keeps
    zero-order customers (count of a nullable key skips nulls), then a
    second tiny aggregate over the 1-row-per-customer intermediate. The
    expensive shuffle keys on custkey; the histogram regroup is
    negligible (≤ max-orders-per-customer distinct keys)."""
    cust = _table(spark, sf_dir, "customer")
    orders = _table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


_Q_ORDERS_HISTOGRAM_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue for one brand: lines
    whose quantity is below 20% of their part's average. The brand dim
    filter broadcasts BEFORE the fact scan (only Brand#12 lineitems ever
    shuffle); the per-part totals are a window over the SAME restricted
    frame (r07, guide §2.4: the r06 groupBy + join-back re-evaluated the
    brand join from a second lineitem scan and planned a SortMergeJoin;
    the window shares one partkey exchange — 2 fact scans → 1, join
    gone). Exact-integer inequality 5*qty*cnt < total_qty (quantities
    are integral) — no float division, bit-stable cross-engine."""
    from pyspark.sql.window import Window

    li = _table(spark, sf_dir, "lineitem")
    part = _table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#12"
    ).select("p_partkey")
    price = _CENTS.format(col="l_extendedprice")
    brand_lines = li.join(
        F.broadcast(part), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    return (
        brand_lines.withColumn(
            "__tq", F.sum(F.expr("CAST(l_quantity AS BIGINT)")).over(w)
        )
        .withColumn("__cnt", F.count(F.lit(1)).over(w))
        .filter(
            F.expr("5 * CAST(l_quantity AS BIGINT) * __cnt < __tq")
        )
        .agg(
            F.expr(f"sum({price})").alias("total_rev_c"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


_Q_SMALL_QTY_SQL = """
WITH b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#12'
),
a AS (
  SELECT l_partkey AS pk, sum(CAST(l_quantity AS BIGINT)) AS tq,
         count(*) AS cnt
  FROM b GROUP BY 1
)
SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_rev_c,
       CAST(count(*) AS BIGINT) AS n_lines
FROM b JOIN a ON l_partkey = pk
WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < tq"""


def q_or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: three brand/size/
    quantity AND-clauses OR-ed together. The partkey equi-join carries
    the disjunction as a post-join filter Catalyst pushes per-side where
    possible (common-factor extraction); exact integer cents, single
    bit-stable row."""
    li = _table(spark, sf_dir, "lineitem")
    part = _table(spark, sf_dir, "part")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    rev = f"{price} * (100 - {disc})"
    cond = (
        "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5"
        "  AND l_quantity BETWEEN 1 AND 11)"
        " OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10"
        "  AND l_quantity BETWEEN 10 AND 20)"
        " OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15"
        "  AND l_quantity BETWEEN 20 AND 30)"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(F.expr(cond))
        .agg(
            F.expr(f"sum({rev})").alias("revenue_c4"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


_Q_OR_PREDICATE_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
         AS BIGINT) AS revenue_c4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)"""


def q_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-Levenshtein fuzzy duplicate pairs: every same-lang pair
    within edit distance 64 (exact semantics — the length-band blocking
    is only the physical plan; see ``dedup.fuzzy_dup_pairs``). Both
    engines count CHARACTERS here: DuckDB's ``levenshtein`` is byte-based
    but the corpus is pure ASCII (asserted in
    tests/test_dedup_similarity.py), so the engines agree exactly."""
    from autoscan_spark.operators.dedup import fuzzy_dup_pairs

    return fuzzy_dup_pairs(_docs(spark, sf_dir), max_distance=64)


# brute force within the necessary |len diff| <= k window; lev computed
# once in the inner select (DuckDB would otherwise evaluate the WHERE and
# SELECT occurrences separately)
_Q_FUZZY_DEDUP_SQL = """
WITH d AS (
  SELECT doc_id, lang, text, length(text) AS n FROM documents
),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         levenshtein(a.text, b.text) AS lev
  FROM d a JOIN d b
    ON a.lang = b.lang AND a.doc_id < b.doc_id AND abs(a.n - b.n) <= 64
)
SELECT doc_a, doc_b, CAST(lev AS BIGINT) AS lev FROM c WHERE lev <= 64"""


def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user event stats via a RANGE frame (the one
    window-frame shape the surface didn't cover: range, not rows). Epoch
    seconds + integer cents keep it bit-stable cross-engine — see
    ``temporal.rolling_time_stats``."""
    from autoscan_spark.operators.temporal import rolling_time_stats

    return rolling_time_stats(_events(spark, sf_dir), window_seconds=3600)


# epoch_us // 1e6 is floor division == Spark's timestamp->long truncation
_Q_ROLLING_WINDOW_SQL = """
WITH e AS (
  SELECT event_id, user_id,
         epoch_us(ts) // 1000000 AS esec,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_events_win,
       CAST(sum(cents) OVER w AS BIGINT) AS value_cents_win
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY esec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"""


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 bigram collocations by integer-ppm PMI ratio (min pair
    count 5) — see ``textstats.pmi_collocations``."""
    from autoscan_spark.operators.textstats import pmi_collocations

    return pmi_collocations(_docs(spark, sf_dir), min_count=5, top_k=100)


# PMI ratio in the bigram event space; // is floor division == Spark DIV
# on the all-positive counts; (pmi_ppm DESC, w1, w2) is a total order so
# the LIMIT cut is deterministic
_Q_PMI_SQL = r"""
WITH w AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents
), bi AS (
  SELECT unnest(ws[1:len(ws) - 1]) AS w1, unnest(ws[2:len(ws)]) AS w2
  FROM w WHERE len(ws) >= 2
), c AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy FROM bi GROUP BY w1, w2
), t AS (
  SELECT CAST(sum(n_xy) AS BIGINT) AS nb FROM c
), s AS (
  SELECT w1, w2, n_xy,
         CAST(sum(n_xy) OVER (PARTITION BY w1) AS BIGINT) AS c1,
         CAST(sum(n_xy) OVER (PARTITION BY w2) AS BIGINT) AS c2
  FROM c
)
SELECT w1, w2, n_xy,
       CAST((1000000::BIGINT * n_xy * t.nb) // (c1 * c2) AS BIGINT) AS pmi_ppm
FROM s, t
WHERE n_xy >= 5
ORDER BY pmi_ppm DESC, w1, w2
LIMIT 100"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: revenue per supplier over one
    quarter, then the supplier(s) achieving the maximum — the
    max-subquery + join-back shape. The per-supplier revenue table is
    localCheckpoint-barriered (supplier-count-sized) so the 1-row max
    doesn't re-run the lineitem aggregation; the max broadcasts back.
    Exact integer cents·100 revenue units, so ties are exact and the
    result is deterministic cross-engine."""
    li = _table(spark, sf_dir, "lineitem")
    supp = _table(spark, sf_dir, "supplier")
    price = _CENTS.format(col="l_extendedprice")
    disc = _CENTS.format(col="l_discount")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.expr(f"sum({price} * (100 - {disc}))").alias("total_rev_c4"))
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total_rev_c4").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev_c4 == mx.__mx)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("total_rev_c4").cast("long").alias("total_rev_c4"),
        )
        .orderBy("s_suppkey")
    )


_Q_TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
              * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
           AS BIGINT) AS total_rev_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       total_rev_c4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_c4 = (SELECT max(total_rev_c4) FROM rev)
ORDER BY s_suppkey"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort triangle over events: users grouped by the
    ISO week of their first event, distinct-user counts per (cohort,
    week offset). One window shuffle + one distinct-count groupBy."""
    from autoscan_spark.operators.temporal import retention_cohorts

    return retention_cohorts(_events(spark, sf_dir))


_Q_RETENTION_SQL = """
WITH stamped AS (
  SELECT user_id, date_trunc('week', ts) AS ew,
         min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cw
  FROM events
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cw, ew) / 7 AS INTEGER) AS week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM stamped
GROUP BY 1, 2"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types per user, with exact integer-ppm share per source type."""
    from autoscan_spark.operators.temporal import event_transitions

    return event_transitions(_events(spark, sf_dir))


_Q_TRANSITIONS_SQL = """
WITH hops AS (
  SELECT event_type,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), agg AS (
  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM hops WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_type, n_transitions,
       CAST((CAST(1000000 AS BIGINT) * n_transitions)
         // sum(n_transitions) OVER (PARTITION BY event_type) AS BIGINT)
         AS p_ppm
FROM agg"""


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing local-overlap dedup: doc pairs sharing >= 3 winnowed
    k-gram fingerprints (k=4, window=8) — guaranteed to catch any shared
    run of >= 11 words. Posting-list pair generation, no self-join."""
    from autoscan_spark.operators.dedup import winnow_pairs

    return winnow_pairs(
        _docs(spark, sf_dir), k=4, window=8, min_shared=3, max_bucket=64
    )


_Q_WINNOW_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
  FROM documents
), h AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 4
              THEN list_transform(range(0, len(w) - 3),
                                  i -> md5(array_to_string(w[i+1:i+4], ' ')))
              ELSE [md5(array_to_string(w, ' '))] END AS hs
  FROM words
), fp AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(hs) >= 8
                THEN list_transform(range(0, len(hs) - 7),
                                    j -> list_min(hs[j+1:j+8]))
                ELSE [list_min(hs)] END)) AS f
  FROM h
), ok AS (
  SELECT f, doc_id FROM fp
  WHERE f IN (SELECT f FROM fp GROUP BY f HAVING count(*) BETWEEN 2 AND 64)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM ok a JOIN ok b ON a.f = b.f AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 3"""


def q_template_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-invariant dedup: md5 of (lower, trim, collapse
    whitespace, digit-runs -> '0') text, ranked per template."""
    from autoscan_spark.operators.dedup import template_dedup

    return template_dedup(_docs(spark, sf_dir))


_Q_TEMPLATE_DEDUP_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(trim(lower(text)),
           '[0-9]+', '0', 'g'), '\s+', ' ', 'g')) AS template_fp,
       CAST(row_number() OVER (
         PARTITION BY md5(regexp_replace(regexp_replace(trim(lower(text)),
             '[0-9]+', '0', 'g'), '\s+', ' ', 'g'))
         ORDER BY doc_id) AS INTEGER) AS dup_rank
FROM documents"""


_LEXICON = ("slow", "dup", "hash", "merge")


def q_lexicon_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist-density content filter: per-doc hit count and integer-ppm
    rate against a wordlist, keep flag at <= 10% density."""
    from autoscan_spark.operators.textstats import lexicon_hits

    return lexicon_hits(
        _docs(spark, sf_dir), list(_LEXICON), max_hit_ppm=100_000
    )


def _lexicon_oracle() -> str:
    inl = ",".join(f"'{w}'" for w in _LEXICON)
    hits = f"len(list_filter(ws, x -> x IN ({inl})))"
    return rf"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
  FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST({hits} AS BIGINT) AS n_hits,
       (CAST(1000000 AS BIGINT) * {hits}) // greatest(len(ws), 1) AS hit_ppm,
       ((CAST(1000000 AS BIGINT) * {hits}) // greatest(len(ws), 1))
         <= 100000 AS lexicon_ok
FROM w"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (BPE-ish pieces per whitespace
    word, exact integer ppm) — the mixture-temperature diagnostic."""
    from autoscan_spark.operators.textstats import tokenizer_fertility

    return tokenizer_fertility(_docs(spark, sf_dir))


_Q_FERTILITY_SQL = r"""
WITH c AS (
  SELECT lang,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nws,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS nbpe
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nws) AS BIGINT) AS sum_ws_tokens,
       CAST(sum(nbpe) AS BIGINT) AS sum_bpe_tokens,
       (CAST(1000000 AS BIGINT) * CAST(sum(nbpe) AS BIGINT))
         // greatest(CAST(sum(nws) AS BIGINT), 1) AS fertility_ppm
FROM c GROUP BY lang"""


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate vs the corpus top-20 word vocabulary
    (broadcast vocab join; the tokenizer-coverage diagnostic)."""
    from autoscan_spark.operators.textstats import oov_rate

    return oov_rate(_docs(spark, sf_dir), vocab_size=20)


_Q_OOV_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents
), vocab AS (
  SELECT word FROM w GROUP BY word ORDER BY count(*) DESC, word ASC LIMIT 20
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST((CAST(1000000 AS BIGINT)
             * sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END))
         // greatest(count(*), 1) AS BIGINT) AS oov_ppm
FROM w LEFT JOIN vocab v USING (word)
GROUP BY w.doc_id"""


def q_turn_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-assistant-turn 2-gram overlap (self-repetition /
    degenerate-loop filter; one conversation-window shuffle)."""
    from autoscan_spark.operators.conversations import turn_redundancy

    return turn_redundancy(transcripts_from_documents(spark, sf_dir), n=2)


_Q_TURN_REDUNDANCY_SQL = f"""{_TR},
asst AS (
  SELECT conv_id, turn_idx, text,
         lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM tr WHERE role = 'assistant'
), pairs AS (
  SELECT conv_id, turn_idx,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS tw,
         regexp_split_to_array(trim(lower(prev)), '\\s+') AS pw
  FROM asst WHERE prev IS NOT NULL
), g AS (
  SELECT conv_id, turn_idx,
    list_distinct(CASE WHEN len(tw) >= 2 THEN
      list_transform(generate_series(1, len(tw) - 1),
                     i -> array_to_string(tw[i:i+1], ' '))
      ELSE [array_to_string(tw, ' ')] END) AS tg,
    list_distinct(CASE WHEN len(pw) >= 2 THEN
      list_transform(generate_series(1, len(pw) - 1),
                     i -> array_to_string(pw[i:i+1], ' '))
      ELSE [array_to_string(pw, ' ')] END) AS pg
  FROM pairs
)
SELECT conv_id, turn_idx,
       CAST(len(tg) AS BIGINT) AS n_grams,
       CAST(len(list_intersect(tg, pg)) AS BIGINT) AS n_overlap,
       (CAST(1000000 AS BIGINT) * len(list_intersect(tg, pg))) // len(tg)
         AS redund_ppm
FROM g"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram from the full LSH→CC pipeline:
    MinHash-verified pairs → star-contraction components → singleton
    attach → (cluster_size, n_clusters). Oracle resolves components by
    recursive-CTE transitive closure over exact-Jaccard pairs."""
    from autoscan_spark.operators.dedup import cluster_size_stats, minhash_dedup

    docs = _docs(spark, sf_dir)
    pairs = minhash_dedup(docs, threshold=0.1, n=3, num_hashes=64, bands=32)
    return cluster_size_stats(docs, pairs)


_Q_DEDUP_CLUSTERS_SQL = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(ws) >= 3 THEN
      list_transform(generate_series(1, len(ws) - 2),
                     i -> array_to_string(ws[i:i+2], ' '))
      ELSE [array_to_string(ws, ' ')] END) AS shingles
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        FROM documents)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.1
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
), comp AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cid
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
), sizes AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY cid
)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size"""


def q_hourly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type with exact
    integer-ppm shares (UTC-pinned hour())."""
    from autoscan_spark.operators.temporal import hourly_profile

    return hourly_profile(_events(spark, sf_dir))


_Q_HOURLY_SQL = """
WITH agg AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour_of_day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_of_day, n_events,
       CAST((CAST(1000000 AS BIGINT) * n_events)
         // sum(n_events) OVER (PARTITION BY event_type) AS BIGINT)
         AS share_ppm
FROM agg"""


def q_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language [p5, p95] exact-percentile length gate (broadcast band
    table, corpus never shuffles)."""
    from autoscan_spark.operators.textstats import length_percentile_filter

    return length_percentile_filter(_docs(spark, sf_dir))


_Q_LENGTH_FILTER_SQL = """
WITH bands AS (
  SELECT lang AS grp,
         quantile_cont(n_chars, 0.05) AS lo,
         quantile_cont(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang
)
SELECT doc_id, lang, n_chars,
       (n_chars >= lo AND n_chars <= hi) AS len_ok
FROM documents JOIN bands ON lang = grp"""


def q_ngram_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus 3-gram commonness (boilerplate-ness) score per document:
    share of distinct 3-grams appearing in >= 3 other docs, exact ppm."""
    from autoscan_spark.operators.textstats import ngram_commonness

    return ngram_commonness(_docs(spark, sf_dir), n=3, common_docs=3)


_Q_NGRAM_COMMONNESS_SQL = r"""
WITH g AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(ws) >= 3 THEN
      list_transform(generate_series(1, len(ws) - 2),
                     i -> array_to_string(ws[i:i+2], ' '))
    ELSE [array_to_string(ws, ' ')] END)) AS gram
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        FROM documents)
), df_t AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS dfc FROM g GROUP BY gram
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN dfc >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       CAST((CAST(1000000 AS BIGINT)
             * sum(CASE WHEN dfc >= 4 THEN 1 ELSE 0 END))
         // greatest(count(*), 1) AS BIGINT) AS common_ppm
FROM g JOIN df_t USING (gram)
GROUP BY g.doc_id"""


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day (running-distinct via
    the day-offset explode of the deduplicated (user, day) table)."""
    from autoscan_spark.operators.temporal import rolling_active_users

    return rolling_active_users(_events(spark, sf_dir), window_days=7)


_Q_ROLLING_AU_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
), mx AS (SELECT max(d) AS m FROM ud),
vis AS (
  SELECT u, CAST(unnest(generate_series(d, d + 6, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM ud
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT u) AS BIGINT) AS n_active_users
FROM vis, mx WHERE day <= m
GROUP BY 1"""


def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day DAU/WAU stickiness over events (trailing 7-day window;
    exact integer-ppm ratio)."""
    from autoscan_spark.operators.temporal import stickiness

    return stickiness(_events(spark, sf_dir), window_days=7)


_Q_STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
), mx AS (SELECT max(d) AS m FROM ud),
vis AS (
  SELECT u, CAST(unnest(generate_series(d, d + 6, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM ud
),
wau AS (
  SELECT day, count(DISTINCT u) AS n FROM vis, mx WHERE day <= m GROUP BY 1
),
dau AS (SELECT d AS day, count(*) AS n FROM ud GROUP BY 1)
SELECT strftime(dau.day, '%Y-%m-%d') AS day,
       CAST(dau.n AS BIGINT) AS dau,
       CAST(wau.n AS BIGINT) AS wau,
       CAST((CAST(1000000 AS BIGINT) * dau.n) // wau.n AS BIGINT)
         AS stickiness_ppm
FROM dau JOIN wau ON wau.day = dau.day"""


def q_merge_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands transcript normalization: collapse consecutive
    same-role turn runs into one merged turn. The synthesized transcripts
    alternate roles strictly, so the driver query re-derives the role
    from an md5 bucket of (conv_id, turn_idx) — deterministic in both
    engines — guaranteeing real multi-turn runs for the merge to fire on
    (the same injected-structure pattern as marker_scrub)."""
    from autoscan_spark.operators.conversations import merge_adjacent_turns

    tr = transcripts_from_documents(spark, sf_dir)
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("conv_id"),
                        F.lit(":"),
                        F.col("turn_idx").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(3),
    )
    roled = tr.withColumn(
        "role",
        F.when(bucket == 0, F.lit("user"))
        .when(bucket == 1, F.lit("assistant"))
        .otherwise(F.lit("tool")),
    )
    return merge_adjacent_turns(roled)


_Q_MERGE_TURNS_SQL = f"""{_TR},
rr AS (
  SELECT conv_id, turn_idx,
         CASE ('0x' || substr(md5(conv_id || ':' ||
                CAST(turn_idx AS VARCHAR)), 1, 8))::BIGINT % 3
           WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool'
         END AS role,
         text
  FROM tr
),
lagged AS (
  SELECT *, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM rr
),
runs AS (
  SELECT conv_id, turn_idx, role, text,
         sum(CASE WHEN prev IS NULL OR prev <> role THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run_id
  FROM lagged
)
SELECT conv_id, CAST(min(turn_idx) AS INTEGER) AS turn_idx, min(role) AS role,
       string_agg(text, chr(10) ORDER BY turn_idx) AS text,
       CAST(count(*) AS BIGINT) AS n_merged
FROM runs GROUP BY conv_id, run_id"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the corpus word stream.

    Oracle-backed (r6): the driver query uses ``hash_fn='md5'`` — bucket
    = first 8 md5 hex digits of ``d || ':' || word`` — so DuckDB rebuilds
    the IDENTICAL depth×width sketch and replays the min-estimate, making
    the whole approximate structure value-hash comparable cross-engine.
    The library default stays xxhash64 (one JVM hash, no hex round-trip)
    for production; the no-false-negative / collision-bound guarantees of
    BOTH hash paths are pinned by differential pytest against exact
    counts."""
    from autoscan_spark.operators.sketch import cms_heavy_hitters

    return cms_heavy_hitters(
        _docs(spark, sf_dir), min_count=500, width=2048, depth=4,
        hash_fn="md5",
    ).orderBy("word")


# DuckDB replay of the exact same CMS: same md5-derived coordinates, same
# depth×width counter table, same min-estimate — an approximate sketch is
# still a DETERMINISTIC function of (corpus, hash), so the oracle is exact.
_Q_CMS_SQL = """
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
coords AS (
  SELECT word, d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || word), 1, 8))::BIGINT
           % 2048 AS bucket
  FROM words, generate_series(0, 3) t(d)
),
sketch AS (
  SELECT d, bucket, count(*) AS cnt FROM coords GROUP BY d, bucket
),
cand_coords AS (
  SELECT word, d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || word), 1, 8))::BIGINT
           % 2048 AS bucket
  FROM (SELECT DISTINCT word FROM words), generate_series(0, 3) t(d)
)
SELECT c.word, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est_count
FROM cand_coords c
LEFT JOIN sketch s ON s.d = c.d AND s.bucket = c.bucket
GROUP BY c.word
HAVING min(coalesce(s.cnt, 0)) >= 500
ORDER BY c.word"""


def q_code_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing stats. The synthetic corpus is pure prose,
    so the driver query deterministically rewrites an md5-selected fifth
    of the documents into code-shaped text (an import header + ';'-
    terminated, 4-space-indented lines via the ' value ' corpus token —
    the same injected-structure pattern as marker_scrub / conv_hygiene),
    guaranteeing every line heuristic fires in both engines."""
    from autoscan_spark.operators.textstats import code_prose_stats

    docs = _docs(spark, sf_dir)
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("code:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(5),
    )
    injected = docs.withColumn(
        "text",
        F.when(
            bucket == 0,
            F.concat(
                F.lit("import os\n"),
                F.expr("replace(text, ' value ', ';\\n    ')"),
            ),
        ).otherwise(F.col("text")),
    )
    return code_prose_stats(injected)


_Q_CODE_FRACTION_SQL = """
WITH injected AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5('code:' || CAST(doc_id AS VARCHAR)),
                    1, 8))::BIGINT % 5 = 0
              THEN 'import os' || chr(10) ||
                   replace(text, ' value ', ';' || chr(10) || '    ')
              ELSE text END AS text
  FROM documents
),
cl AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ne
  FROM injected
),
counted AS (
  SELECT doc_id, len(ne) AS n_lines,
         len(list_filter(ne, l ->
             regexp_matches(l, '^(    |\\t)')
             OR regexp_matches(trim(l), '[;{}]$')
             OR regexp_matches(trim(l),
                '^(def |class |import |from |return|function |var |let |const |#include)')
         )) AS n_code
  FROM cl
)
SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_code AS BIGINT) AS n_code_lines,
       CAST((CAST(1000000 AS BIGINT) * n_code) // greatest(n_lines, 1)
            AS BIGINT) AS code_ppm,
       (CAST(1000000 AS BIGINT) * n_code) // greatest(n_lines, 1) >= 300000
         AS is_code
FROM counted"""


def q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake/garbage gate. The synthetic corpus is clean UTF-8, so the
    driver query appends two U+FFFD replacement chars and one C0 control
    char (BEL) to an md5-selected quarter of the documents — injected via
    Python literals (Spark SQL chr() wraps at 256), replayed with
    full-codepoint chr() in DuckDB — so both counters and the gate
    provably fire."""
    from autoscan_spark.operators.textstats import encoding_quality

    docs = _docs(spark, sf_dir)
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("enc:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(4),
    )
    injected = docs.withColumn(
        "text",
        F.when(
            bucket == 0, F.concat(F.col("text"), F.lit("��\x07"))
        ).otherwise(F.col("text")),
    )
    return encoding_quality(injected)


_Q_ENCODING_SQL = """
WITH injected AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5('enc:' || CAST(doc_id AS VARCHAR)),
                    1, 8))::BIGINT % 4 = 0
              THEN text || chr(65533) || chr(65533) || chr(7)
              ELSE text END AS text
  FROM documents
),
counted AS (
  SELECT doc_id, length(text) AS n_chars,
         length(text) - length(replace(text, chr(65533), ''))
           AS n_replacement,
         length(text) - length(regexp_replace(text,
             '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS n_control
  FROM injected
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_replacement AS BIGINT) AS n_replacement,
       CAST(n_control AS BIGINT) AS n_control,
       CAST((CAST(1000000 AS BIGINT) * (n_replacement + n_control))
            // greatest(n_chars, 1) AS BIGINT) AS bad_ppm,
       (CAST(1000000 AS BIGINT) * (n_replacement + n_control))
         // greatest(n_chars, 1) <= 1000 AS encoding_ok
FROM counted"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail quality tiers: per-language exact-percentile
    cuts over the bit-stable familiarity (perplexity-proxy) score."""
    from autoscan_spark.operators.textstats import ccnet_buckets

    return ccnet_buckets(_docs(spark, sf_dir))


_Q_CCNET_SQL = rf"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), freqs AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w
), total AS (
  SELECT sum(c) AS tot FROM freqs
), fam AS (
  SELECT doc_id,
         (CAST(sum(c) AS BIGINT) / CAST(count(*) AS BIGINT))
           / (SELECT tot FROM total) AS familiarity
  FROM words JOIN freqs USING (w)
  GROUP BY doc_id
), scored AS (
  SELECT d.doc_id, d.lang, f.familiarity
  FROM documents d JOIN fam f USING (doc_id)
), cuts AS (
  SELECT lang AS grp,
         quantile_cont(familiarity, {1.0 / 3.0!r}) AS lo,
         quantile_cont(familiarity, {2.0 / 3.0!r}) AS hi
  FROM scored GROUP BY lang
)
SELECT doc_id, lang, familiarity,
       CASE WHEN familiarity >= hi THEN 'head'
            WHEN familiarity >= lo THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored JOIN cuts ON lang = grp"""


def q_funnel_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel view -> click -> purchase, each step within one
    day of the previous step's first qualifying event."""
    from autoscan_spark.operators.temporal import funnel_within

    return funnel_within(
        _events(spark, sf_dir), ["view", "click", "purchase"], 86400
    )


_Q_FUNNEL_WITHIN_SQL = """
WITH s0 AS (
  SELECT user_id AS u, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), s1 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s0 ON e.user_id = s0.u
  WHERE e.event_type = 'click'
    AND e.ts > s0.t AND e.ts <= s0.t + INTERVAL 86400 SECOND
  GROUP BY 1
), s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'purchase'
    AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 86400 SECOND
  GROUP BY 1
)
SELECT CAST(0 AS INTEGER) AS step_idx, 'view' AS step,
       CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
UNION ALL
SELECT 1, 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
UNION ALL
SELECT 2, 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)"""


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: near-dup clusters (LSH -> star CC) are the
    atomic split unit, so near-duplicate docs never straddle train/test."""
    from autoscan_spark.operators.dedup import minhash_dedup
    from autoscan_spark.operators.sampling import cluster_split

    docs = _docs(spark, sf_dir)
    pairs = minhash_dedup(docs, threshold=0.1, n=3, num_hashes=64, bands=32)
    return cluster_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )


_Q_CLUSTER_SPLIT_SQL = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(ws) >= 3 THEN
      list_transform(generate_series(1, len(ws) - 2),
                     i -> array_to_string(ws[i:i+2], ' '))
      ELSE [array_to_string(ws, ' ')] END) AS shingles
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        FROM documents)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.1
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
), comp AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
), bucketed AS (
  SELECT doc_id, cluster_id,
         ('0x' || substring(md5(concat('cluster-split-v1',
             CAST(cluster_id AS VARCHAR))), 1, 8))::BIGINT
           % 1000000 AS b
  FROM comp
)
SELECT doc_id, cluster_id,
       CASE WHEN b < 800000 THEN 'train'
            WHEN b < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM bucketed"""


# ---------------------------------------------------------------------------
# r6 batch 3: transcript SFT gates + quality entropy + sketch family
# ---------------------------------------------------------------------------


def q_refusal_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation assistant refusal density. The synthetic corpus
    has no natural refusals, so the driver query deterministically
    prepends a refusal stem to an md5-selected seventh of the assistant
    turns (the same injected-signal pattern as code_fraction /
    encoding_quality), guaranteeing the LIKE-chain fires in both
    engines."""
    from autoscan_spark.operators.conversations import refusal_stats

    tr = transcripts_from_documents(spark, sf_dir)
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("conv_id"),
                        F.lit(":"),
                        F.col("turn_idx").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(7),
    )
    injected = tr.withColumn(
        "text",
        F.when(
            (F.col("role") == "assistant") & (bucket == 0),
            F.concat(F.lit("I cannot help with that. "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    return refusal_stats(injected)


_Q_REFUSAL_SQL = f"""{_TR}
, injected AS (
  SELECT conv_id,
         CASE WHEN ('0x' || substr(md5(conv_id || ':' ||
                    CAST(turn_idx AS VARCHAR)), 1, 8))::BIGINT % 7 = 0
              THEN 'I cannot help with that. ' || text ELSE text END AS text
  FROM tr WHERE role = 'assistant'
), flagged AS (
  SELECT conv_id,
         CASE WHEN lower(text) LIKE '%i cannot%'
                OR lower(text) LIKE '%i can''t%'
                OR lower(text) LIKE '%i''m sorry%'
                OR lower(text) LIKE '%i am sorry%'
                OR lower(text) LIKE '%as an ai%'
                OR lower(text) LIKE '%i am unable%'
                OR lower(text) LIKE '%i''m unable%'
                OR lower(text) LIKE '%i won''t%'
              THEN 1 ELSE 0 END AS refuse
  FROM injected
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_assistant,
       CAST(sum(refuse) AS BIGINT) AS n_refusals,
       CAST((CAST(1000000 AS BIGINT) * sum(refuse)) // count(*) AS BIGINT)
         AS refusal_ppm
FROM flagged GROUP BY conv_id"""


def q_truncation_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation truncation density — fires NATURALLY on this
    corpus: transcript turns are fixed-width character chunks, so most
    turns end mid-word (no terminal punctuation), exactly the signal the
    gate exists to catch."""
    from autoscan_spark.operators.conversations import truncation_stats

    return truncation_stats(transcripts_from_documents(spark, sf_dir))


_Q_TRUNCATION_SQL = f"""{_TR}
, flagged AS (
  SELECT conv_id,
         CASE WHEN coalesce(
                right(trim(text), 1) IN
                  ('.', '!', '?', '"', '''', '`', ')', ']', '}}', ':', '*'),
                FALSE)
              THEN 0 ELSE 1 END AS trunc
  FROM tr WHERE role = 'assistant'
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_assistant,
       CAST(sum(trunc) AS BIGINT) AS n_truncated,
       CAST((CAST(1000000 AS BIGINT) * sum(trunc)) // count(*) AS BIGINT)
         AS truncated_ppm
FROM flagged GROUP BY conv_id"""


def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-distribution Shannon entropy (information-
    density quality signal; both tails gate)."""
    from autoscan_spark.operators.textstats import word_entropy

    return word_entropy(_docs(spark, sf_dir))


_Q_WORD_ENTROPY_SQL = r"""
WITH w AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), c AS (
  SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
FROM c GROUP BY doc_id"""


def q_hll_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct 3-gram estimate — the md5-replayable HLL
    sketch over the vocabulary-explosion domain (DuckDB rebuilds the
    identical 256-register table; the harmonic branch's register sum is
    a sum of powers of two, float64-EXACT in both engines)."""
    from autoscan_spark.operators.sketch import hll_distinct

    return hll_distinct(_docs(spark, sf_dir), n=3)


_Q_HLL_SQL = r"""
WITH g AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 2),
                i -> array_to_string(w[i:i+2], ' '))) AS g
  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS w
        FROM documents)
  WHERE len(w) >= 3
), r AS (
  SELECT ('0x' || substr(md5(g), 1, 2))::BIGINT AS j,
         ('0x' || substr(md5(g), 3, 12))::BIGINT AS v
  FROM g
), regs AS (
  SELECT j, max(CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END) AS rho
  FROM r GROUP BY j
), a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_registers,
         sum(power(2.0, -rho)) AS s
  FROM regs
)
SELECT CAST(256 AS INTEGER) AS m,
       n_registers,
       CAST(256 - n_registers AS BIGINT) AS n_zero,
       round(CASE WHEN 47072.71267120224 / (256 - n_registers + s) <= 640.0
                   AND n_registers < 256
                  THEN 256.0 * ln(256.0 / (256 - n_registers))
                  ELSE 47072.71267120224 / (256 - n_registers + s) END,
             3) AS est_distinct
FROM a"""


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination — the sketch-based scale
    path for the same benchmark set `decontaminate` checks exactly
    (first 12 words of every 25th document, 8-gram windows); supersets
    the exact overlap, false positives bounded by bits/k."""
    from autoscan_spark.operators.sketch import bloom_contamination

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.expr("doc_id % 25 = 0")).select(
        F.expr(
            "concat_ws(' ', slice(split(trim(text), '\\\\s+'), 1, 12))"
        ).alias("text")
    )
    return bloom_contamination(docs, bench, n=8)


_Q_BLOOM_SQL = r"""
WITH bench AS (
  SELECT array_to_string(words[1:12], ' ') AS text
  FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents WHERE doc_id % 25 = 0)
), bg AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 7),
                i -> array_to_string(w[i:i+7], ' '))) AS g
  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS w
        FROM bench)
  WHERE len(w) >= 8
), bpos AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || g), 1, 8))::BIGINT
           % 262144 AS pos
  FROM bg, generate_series(0, 3) t(i)
), dg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 7),
                i -> array_to_string(w[i:i+7], ' '))) AS g
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        FROM documents)
  WHERE len(w) >= 8
), probes AS (
  SELECT doc_id, md5(g) AS gkey,
         ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || g), 1, 8))::BIGINT
           % 262144 AS pos
  FROM dg, generate_series(0, 3) t(i)
), hits AS (
  SELECT doc_id, gkey,
         CASE WHEN count(*) = count(b.pos) THEN 1 ELSE 0 END AS flagged
  FROM probes p LEFT JOIN bpos b ON p.pos = b.pos
  GROUP BY doc_id, gkey
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(flagged) AS BIGINT) AS n_flagged,
       CAST((CAST(1000000 AS BIGINT) * sum(flagged)) // count(*) AS BIGINT)
         AS flagged_ppm,
       sum(flagged) > 0 AS contaminated
FROM hits GROUP BY doc_id"""


def q_tool_call_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation tool-usage report over the synthetic transcript
    corpus (tool turns carry tool='shell'): the agentic-data routing
    signal. One conversation-key shuffle, exact integer ppm."""
    from autoscan_spark.operators.conversations import tool_call_stats
    from autoscan_spark.sources.transcripts import synthesize_transcripts

    return tool_call_stats(synthesize_transcripts(spark, 200, seed=7))


def q_interevent_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event cadence profile over the events table: exact
    epoch-second gap min/max/integer-avg. One user-key shuffle."""
    from autoscan_spark.operators.temporal import interevent_stats

    return interevent_stats(_events(spark, sf_dir))


def q_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-decile report (ntile over (n_chars, doc_id)
    total order): tile counts + length ranges. One shuffle."""
    from autoscan_spark.operators.profile import length_deciles

    return length_deciles(_docs(spark, sf_dir), n_tiles=10)


def q_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier-count-per-product query, adapted to this
    slim schema (no partsupp: the part↔supplier association is the
    lineitem fact table): distinct suppliers per (p_type, p_size) for
    small non-Brand#1 parts. Exercises the distinct-aggregate (Expand)
    plan over a filtered dimension join — the brand/size filters sit
    UNDER the join, part joins under AQE."""
    li = _table(spark, sf_dir, "lineitem")
    part = _table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 15)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("n_suppliers"))
    )


def q_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-week churn over the events stream: active users in week w with
    no event in week w+1, exact integer ppm; the corpus' final week is
    excluded (churn out of the window is undefined)."""
    from autoscan_spark.operators.temporal import weekly_churn

    return weekly_churn(_events(spark, sf_dir))


def q_best_of_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-keyed near-dup collapse: LSH-verified pairs → star CC →
    keep the LONGEST doc (n_chars, ties to min id) per duplicate
    cluster, with the cluster size attached — the keep-the-best-copy
    alternative to min-id survivor dedup."""
    from autoscan_spark.operators.dedup import (
        cluster_representatives,
        minhash_dedup,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_dedup(docs, threshold=0.1, n=3, num_hashes=64, bands=32)
    return cluster_representatives(docs, pairs, "n_chars").orderBy("doc_id")


def q_sample_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-500 deterministic uniform doc sample via md5 order
    statistics (TakeOrderedAndProject — per-partition n-heaps, no full
    sort/shuffle)."""
    from autoscan_spark.operators.sampling import hash_top_n

    return hash_top_n(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        "doc_id",
        500,
    )


def q_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN label-noise flags for the first 200 vectors against the full
    embedding table (exact cosine, rounded-6 + id tie-break, vote ties
    to the smallest label). Query side broadcast; corpus never
    shuffles."""
    from autoscan_spark.operators.similarity import knn_label_noise

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return knn_label_noise(emb, emb.filter(F.col("vec_id") < 200), k=5)


# Oracles STAGED for the r7 window rotation. The current 50-slot window
# is fully claimed by r6-fresh queries, and the frozen closure test
# (tests/test_driver_contract.py::test_oracle_closure_over_rounds)
# rightly refuses an oracle-backed query with neither a driver-green row
# nor a window slot — so the queries below ship rows-only THIS round and
# their verified DuckDB oracles move into ORACLES when r7 rotates them
# into the window (each already passes scripts/oracle_gate.py locally
# when temporarily registered).
_Q_LENGTH_DECILES_SQL_R7 = """
WITH t AS (
  SELECT lang, n_chars,
         ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
           AS tile
  FROM documents
)
SELECT lang, CAST(tile AS INTEGER) AS tile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_len,
       CAST(max(n_chars) AS BIGINT) AS max_len
FROM t GROUP BY lang, tile"""

_Q_PARTS_PER_SUPPLIER_SQL_R7 = """
SELECT p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 15
GROUP BY p_type, p_size"""

_Q_WEEKLY_CHURN_SQL_R7 = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
), nxt AS (
  SELECT user_id, wk,
         lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nw
  FROM uw
), mx AS (SELECT max(wk) AS m FROM uw)
SELECT strftime(wk, '%Y-%m-%d') AS week,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN nw IS NULL OR nw > wk + INTERVAL 7 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST((CAST(1000000 AS BIGINT)
             * sum(CASE WHEN nw IS NULL OR nw > wk + INTERVAL 7 DAY
                        THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
         AS churn_ppm
FROM nxt, mx WHERE wk < m GROUP BY wk"""

_Q_BEST_OF_CLUSTER_SQL_R7 = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(ws) >= 3 THEN
      list_transform(generate_series(1, len(ws) - 2),
                     i -> array_to_string(ws[i:i+2], ' '))
      ELSE [array_to_string(ws, ' ')] END) AS shingles
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        FROM documents)
), prs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE /
        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.1
), edges AS (
  SELECT id_a AS a, id_b AS b FROM prs
  UNION
  SELECT id_b, id_a FROM prs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
), comp AS (
  SELECT d.doc_id,
         least(d.doc_id,
               coalesce((SELECT min(b) FROM reach WHERE a = d.doc_id),
                        d.doc_id)) AS c
  FROM documents d
), ranked AS (
  SELECT doc_id, n_chars, c,
         count(*) OVER (PARTITION BY c) AS csize,
         row_number() OVER (PARTITION BY c
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM comp JOIN documents USING (doc_id)
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(csize AS BIGINT) AS cluster_size
FROM ranked WHERE rn = 1 ORDER BY doc_id"""

_Q_SAMPLE_EXACT_N_SQL_R7 = """
SELECT doc_id, lang, n_chars
FROM documents
ORDER BY md5('sample-v1' || CAST(doc_id AS VARCHAR)), doc_id
LIMIT 500"""

_Q_KNN_LABEL_NOISE_SQL_R7 = """
WITH scored AS (
  SELECT q.vec_id AS query_id, q.label AS own_label,
         c.vec_id AS neighbor_id, c.label AS nl,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS cos_r
  FROM embeddings c,
       (SELECT * FROM embeddings WHERE vec_id < 200) q
  WHERE q.vec_id <> c.vec_id
), topk AS (
  SELECT query_id, own_label, nl
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_r DESC, neighbor_id) rn
        FROM scored)
  WHERE rn <= 5
), votes AS (
  SELECT query_id, own_label, nl, count(*) AS n_votes
  FROM topk GROUP BY query_id, own_label, nl
)
SELECT query_id AS vec_id, own_label, nl AS knn_label,
       CAST(n_votes AS BIGINT) AS n_votes, own_label <> nl AS is_noisy
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, nl) rv
      FROM votes)
WHERE rv = 1"""
_Q_INTEREVENT_STATS_SQL_R7 = """
WITH e AS (
  -- floor, not round: Spark's timestamp->long cast floors the
  -- sub-second part, DuckDB's ::BIGINT would round it
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
), g AS (
  SELECT user_id, es - lag(es) OVER (PARTITION BY user_id ORDER BY es)
           AS gap
  FROM e
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap) AS BIGINT) AS min_gap_s,
       CAST(max(gap) AS BIGINT) AS max_gap_s,
       CAST(sum(gap) // count(*) AS BIGINT) AS avg_gap_s
FROM g WHERE gap IS NOT NULL GROUP BY user_id"""


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ORDER IS LOAD-BEARING: the round driver records correctness for the
    # FIRST 50 entries in insertion order. Slots 1-50 therefore hold ONLY
    # oracle-backed queries — r6 rotation: 43 of the 50 slots are queries
    # with NO driver-green row as of r05 (simhash_pairs /
    # near_dup_survivors / readability from the final r5 commits + the 35
    # queries ADDED in r6 + cms_heavy_hitters, newly oracle-backed late-r6
    # via its md5-replayable sketch, + merge_turns / stickiness /
    # code_fraction / encoding_quality, NEW late-r6, + refusal_rate /
    # truncation_rate / word_entropy / hll_ngrams / bloom_decontaminate /
    # parttype_revenue / user_anomalies, NEW final-r6 — 50 fresh slots
    # total: every slot is a query with NO driver-green row yet.
    # forecast_revenue / returned_customers (>= 1 green row each) were
    # the last two anchors, rotated out for the final-r6 pair.
    # bigram_rarity / paragraph_dedup / sft_pairs / remove_spans /
    # chat_template (all with >= 1 green row r01-r05) rotated out for
    # the five late-r6 slots, then chunk_documents / json_props /
    # snapshot_diff / lang_source_pivot / polish_markdown (ditto) for
    # the five final-r6 slots.
    # Every query ROTATED OUT this round has >= 1 driver-green row across
    # r01-r05: turn_synthesis turn_range conv_metrics extract_low doc_fold
    # exact_dedup token_count quality_score ngram_jaccard
    # content_fingerprint lang_id embedding_topk events_sessionize
    # events_funnel pricing_summary revenue_by_nation
    # customers_without_orders shipping_priority embedding_near_dup
    # corpus_prep scrub_pii repetition duplicate_spans prep_pipeline
    # cap_per_source late_order_priority gopher_quality lang_mixture
    # temperature_sample line_dedup snapshot_dedup token_budget
    # familiarity boilerplate_strip.
    # The "every oracle-backed query has a driver-green row OR a window
    # slot" invariant is FROZEN as a test
    # (tests/test_driver_contract.py::test_oracle_closure_over_rounds)
    # against the committed CORRECTNESS_r*.json files, so a rotation or
    # oracle conversion that misses the window fails CI.
    # Entries past 50 are oracle-backed-but-already-driver-green plus the
    # rows-only queries whose semantics pytest pins.
    "simhash_pairs": q_simhash_pairs,
    "near_dup_survivors": q_near_dup_survivors,
    "readability": q_readability,
    "lsh_recall_at_5": q_lsh_recall_at_5,
    "promo_revenue": q_promo_revenue,
    "large_orders": q_large_orders,
    "supplier_nation_revenue": q_supplier_nation_revenue,
    "volume_shipping": q_volume_shipping,
    "tfidf_terms": q_tfidf_terms,
    "repeat_upsample": q_repeat_upsample,
    "prompt_dedup": q_prompt_dedup,
    "ivf_recall_at_5": q_ivf_recall_at_5,
    "market_share": q_market_share,
    "conv_hygiene": q_conv_hygiene,
    "context_trim": q_context_trim,
    "orders_histogram": q_orders_histogram,
    "small_qty_revenue": q_small_qty_revenue,
    "or_predicate_revenue": q_or_predicate_revenue,
    "fuzzy_dedup": q_fuzzy_dedup,
    "rolling_window": q_rolling_window,
    "pmi_collocations": q_pmi_collocations,
    "top_supplier": q_top_supplier,
    "retention_cohorts": q_retention_cohorts,
    "event_transitions": q_event_transitions,
    "winnow_pairs": q_winnow_pairs,
    "template_dedup": q_template_dedup,
    "lexicon_hits": q_lexicon_hits,
    "tokenizer_fertility": q_tokenizer_fertility,
    "oov_rate": q_oov_rate,
    "turn_redundancy": q_turn_redundancy,
    "dedup_clusters": q_dedup_clusters,
    "hourly_activity": q_hourly_activity,
    "length_filter": q_length_filter,
    "ngram_commonness": q_ngram_commonness,
    "rolling_active_users": q_rolling_active_users,
    "ccnet_buckets": q_ccnet_buckets,
    "funnel_within": q_funnel_within,
    "cluster_split": q_cluster_split,
    "parttype_revenue": q_parttype_revenue,
    "user_anomalies": q_user_anomalies,
    "refusal_rate": q_refusal_rate,
    "truncation_rate": q_truncation_rate,
    "word_entropy": q_word_entropy,
    "hll_ngrams": q_hll_ngrams,
    "bloom_decontaminate": q_bloom_decontaminate,
    "merge_turns": q_merge_turns,
    "stickiness": q_stickiness,
    "code_fraction": q_code_fraction,
    "encoding_quality": q_encoding_quality,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    # --- past the 50-slot driver window: oracle-backed, all driver-green ---
    "forecast_revenue": q_forecast_revenue,
    "returned_customers": q_returned_customers,
    "chunk_documents": q_chunk_documents,
    "json_props": q_json_props,
    "snapshot_diff": q_snapshot_diff,
    "lang_source_pivot": q_lang_source_pivot,
    "polish_markdown": q_polish_markdown,
    "remove_spans": q_remove_spans,
    "chat_template": q_chat_template,
    "sft_pairs": q_sft_pairs,
    "paragraph_dedup": q_paragraph_dedup,
    "bigram_rarity": q_bigram_rarity,
    "embedding_near_dup": q_embedding_near_dup,
    "corpus_prep": q_corpus_prep,
    "scrub_pii": q_scrub_pii,
    "repetition": q_repetition,
    "duplicate_spans": q_duplicate_spans,
    "prep_pipeline": q_prep_pipeline,
    "cap_per_source": q_cap_per_source,
    "late_order_priority": q_late_order_priority,
    "gopher_quality": q_gopher_quality,
    "lang_mixture": q_lang_mixture,
    "temperature_sample": q_temperature_sample,
    "line_dedup": q_line_dedup,
    "snapshot_dedup": q_snapshot_dedup,
    "token_budget": q_token_budget,
    "familiarity": q_familiarity,
    "boilerplate_strip": q_boilerplate_strip,
    "minhash_pairs": q_minhash_pairs,
    "response_echo": q_response_echo,
    "preference_pairs": q_preference_pairs,
    "span_corruption": q_span_corruption,
    "events_funnel": q_events_funnel,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "customers_without_orders": q_customers_without_orders,
    "shipping_priority": q_shipping_priority,
    "turn_synthesis": q_turn_synthesis,
    "turn_range": q_turn_range,
    "conv_metrics": q_conv_metrics,
    "extract_low": q_extract_low,
    "doc_fold": q_doc_fold,
    "exact_dedup": q_exact_dedup,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "ngram_jaccard": q_ngram_jaccard,
    "content_fingerprint": q_content_fingerprint,
    "lang_id": q_lang_id,
    "embedding_topk": q_embedding_topk,
    "events_sessionize": q_events_sessionize,
    "decontaminate": q_decontaminate,
    "empty_filter": q_empty_filter,
    "lag_context": q_lag_context,
    "cost_model": q_cost_model,
    "base64_roundtrip": q_base64_roundtrip,
    "asof_join": q_asof_join,
    "hash_split": q_hash_split,
    "profile": q_profile,
    "bpe_learn": q_bpe_learn,
    "quality_model": q_quality_model,
    "turn_ordering": q_turn_ordering,
    "events_window": q_events_window,
    "set_ops": q_set_ops,
    "grouping_breadth": q_grouping_breadth,
    "topk_docs_per_lang": q_topk_docs_per_lang,
    "orders_by_nation": q_orders_by_nation,
    "stratified_sample": q_stratified_sample,
    "length_quantiles": q_length_quantiles,
    "quality_gate": q_quality_gate,
    "token_count_bpe": q_token_count_bpe,
    "embedding_cosine": q_embedding_cosine,
    "domain_stats": q_domain_stats,
    "vocab_topk": q_vocab_topk,
    "normalize_nfc": q_normalize_nfc,
    "c4_clean": q_c4_clean,
    "marker_scrub": q_marker_scrub,
    "bpe_token_real": q_bpe_token_real,
    "extract_fixture_corpus": q_extract_fixture_corpus,
    "polish_docs": q_polish_docs,
    "media_features": q_media_features,
    "embedding_topk_lsh": q_embedding_topk_lsh,
    "embedding_topk_ivf": q_embedding_topk_ivf,
    "pack_sequences": q_pack_sequences,
    "semantic_dedup": q_semantic_dedup,
    # rows-only this round; oracles staged for the r7 rotation (see the
    # _Q_*_SQL_R7 constants above)
    "tool_call_stats": q_tool_call_stats,
    "interevent_stats": q_interevent_stats,
    "length_deciles": q_length_deciles,
    "parts_per_supplier": q_parts_per_supplier,
    "knn_label_noise": q_knn_label_noise,
    "sample_exact_n": q_sample_exact_n,
    "weekly_churn": q_weekly_churn,
    "best_of_cluster": q_best_of_cluster,
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
    "ngram_jaccard": _Q_NGRAM_JACCARD_SQL,
    "content_fingerprint": _Q_CONTENT_FP_SQL,
    "token_count_bpe": _Q_TOKEN_BPE_SQL,
    "lang_id": _langid_oracle(),
    "quality_gate": _quality_oracle(),
    "embedding_cosine": _Q_EMB_COSINE_SQL,
    "embedding_topk": _Q_EMB_TOPK_SQL,
    "embedding_near_dup": _Q_EMB_NEAR_DUP_SQL,
    "events_sessionize": _Q_EVENTS_SESSION_SQL,
    "orders_by_nation": _Q_ORDERS_NATION_SQL,
    "cost_model": _Q_COST_MODEL_SQL,
    "base64_roundtrip": _Q_BASE64_SQL,
    "topk_docs_per_lang": _Q_TOPK_SQL,
    "set_ops": _Q_SET_OPS_SQL,
    "grouping_breadth": _Q_GROUPING_SQL,
    "corpus_prep": _corpus_prep_oracle(),
    "scrub_pii": _scrub_pii_oracle(),
    "repetition": _Q_REPETITION_SQL,
    "duplicate_spans": _Q_DUP_SPANS_SQL,
    "asof_join": _Q_ASOF_SQL,
    "hash_split": _Q_HASH_SPLIT_SQL,
    "stratified_sample": _Q_STRATIFIED_SQL,
    "domain_stats": _Q_DOMAIN_STATS_SQL,
    "vocab_topk": _Q_VOCAB_SQL,
    "decontaminate": _Q_DECONTAM_SQL,
    "c4_clean": _Q_C4_SQL,
    "profile": _Q_PROFILE_SQL,
    "events_funnel": _Q_FUNNEL_SQL,
    "normalize_nfc": _Q_NFC_SQL,
    "length_quantiles": _Q_LENQ_SQL,
    "pricing_summary": _Q_PRICING_SQL,
    "revenue_by_nation": _Q_REVENUE_SQL,
    "customers_without_orders": _Q_NO_ORDERS_SQL,
    "prep_pipeline": _prep_pipeline_oracle(),
    "cap_per_source": _Q_CAP_SQL,
    "shipping_priority": _Q_SHIP_PRIORITY_SQL,
    "late_order_priority": _Q_LATE_PRIORITY_SQL,
    "gopher_quality": _gopher_oracle(),
    "lang_mixture": _Q_LANG_MIX_SQL,
    "temperature_sample": _Q_TEMP_SAMPLE_SQL,
    "line_dedup": _Q_LINE_DEDUP_SQL,
    "snapshot_dedup": _Q_SNAPSHOT_DEDUP_SQL,
    "token_budget": _Q_TOKEN_BUDGET_SQL,
    "familiarity": _Q_FAMILIARITY_SQL,
    "boilerplate_strip": _Q_BOILERPLATE_SQL,
    "forecast_revenue": _Q_FORECAST_SQL,
    "returned_customers": _Q_RETURNED_SQL,
    "parttype_revenue": _Q_PARTTYPE_SQL,
    "user_anomalies": _Q_USER_ANOMALIES_SQL,
    "chunk_documents": _Q_CHUNK_SQL,
    "minhash_pairs": _Q_MINHASH_PAIRS_SQL,
    "response_echo": _Q_RESPONSE_ECHO_SQL,
    "preference_pairs": _Q_PREFERENCE_PAIRS_SQL,
    "span_corruption": _Q_SPAN_CORRUPTION_SQL,
    "readability": _Q_READABILITY_SQL,
    "simhash_pairs": _simhash_oracle(),
    "near_dup_survivors": _Q_NEAR_DUP_SURVIVORS_SQL,
    "lsh_recall_at_5": _Q_LSH_RECALL_SQL,
    "ivf_recall_at_5": _Q_IVF_RECALL_SQL,
    "market_share": _Q_MARKET_SHARE_SQL,
    "conv_hygiene": _Q_CONV_HYGIENE_SQL,
    "context_trim": _Q_CONTEXT_TRIM_SQL,
    "orders_histogram": _Q_ORDERS_HISTOGRAM_SQL,
    "small_qty_revenue": _Q_SMALL_QTY_SQL,
    "or_predicate_revenue": _Q_OR_PREDICATE_SQL,
    "promo_revenue": _Q_PROMO_SQL,
    "large_orders": _Q_LARGE_ORDERS_SQL,
    "supplier_nation_revenue": _Q_SUPP_NATION_SQL,
    "volume_shipping": _Q_VOLUME_SHIP_SQL,
    "tfidf_terms": _Q_TFIDF_SQL,
    "repeat_upsample": _Q_REPEAT_SQL,
    "prompt_dedup": _Q_PROMPT_DEDUP_SQL,
    "json_props": _Q_JSON_PROPS_SQL,
    "snapshot_diff": _Q_SNAPSHOT_DIFF_SQL,
    "lang_source_pivot": _Q_PIVOT_SQL,
    "polish_markdown": _polish_oracle(),
    "remove_spans": _Q_REMOVE_SPANS_SQL,
    "chat_template": _Q_CHAT_TEMPLATE_SQL,
    "sft_pairs": _Q_SFT_PAIRS_SQL,
    "paragraph_dedup": _Q_PARA_DEDUP_SQL,
    "bigram_rarity": _Q_BIGRAM_RARITY_SQL,
    "fuzzy_dedup": _Q_FUZZY_DEDUP_SQL,
    "rolling_window": _Q_ROLLING_WINDOW_SQL,
    "pmi_collocations": _Q_PMI_SQL,
    "top_supplier": _Q_TOP_SUPPLIER_SQL,
    "retention_cohorts": _Q_RETENTION_SQL,
    "event_transitions": _Q_TRANSITIONS_SQL,
    "winnow_pairs": _Q_WINNOW_SQL,
    "template_dedup": _Q_TEMPLATE_DEDUP_SQL,
    "lexicon_hits": _lexicon_oracle(),
    "tokenizer_fertility": _Q_FERTILITY_SQL,
    "oov_rate": _Q_OOV_SQL,
    "turn_redundancy": _Q_TURN_REDUNDANCY_SQL,
    "dedup_clusters": _Q_DEDUP_CLUSTERS_SQL,
    "hourly_activity": _Q_HOURLY_SQL,
    "length_filter": _Q_LENGTH_FILTER_SQL,
    "ngram_commonness": _Q_NGRAM_COMMONNESS_SQL,
    "rolling_active_users": _Q_ROLLING_AU_SQL,
    "ccnet_buckets": _Q_CCNET_SQL,
    "funnel_within": _Q_FUNNEL_WITHIN_SQL,
    "cluster_split": _Q_CLUSTER_SPLIT_SQL,
    "cms_heavy_hitters": _Q_CMS_SQL,
    "merge_turns": _Q_MERGE_TURNS_SQL,
    "stickiness": _Q_STICKINESS_SQL,
    "code_fraction": _Q_CODE_FRACTION_SQL,
    "encoding_quality": _Q_ENCODING_SQL,
    "refusal_rate": _Q_REFUSAL_SQL,
    "truncation_rate": _Q_TRUNCATION_SQL,
    "word_entropy": _Q_WORD_ENTROPY_SQL,
    "hll_ngrams": _Q_HLL_SQL,
    "bloom_decontaminate": _Q_BLOOM_SQL,
    # Intentionally no oracle (rows-only; pytest pins semantics):
    # bpe_learn / bpe_token_real (iterative BPE merge loop), quality_model
    # (MLlib training), extract_fixture_corpus / polish_docs (html/pdf
    # kernels, polish heading-dedupe state machine), media_features (binary
    # codecs), embedding_topk_lsh / embedding_topk_ivf (approximate ANN,
    # differs from exact by design — their RECALL is oracle-backed via
    # lsh_recall_at_5 / ivf_recall_at_5), pack_sequences (partition-local
    # greedy recursion), semantic_dedup (k-means cell structure; its
    # survivor-count invariants are pytest-pinned).
}
