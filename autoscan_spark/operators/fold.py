"""Per-conversation ordered document fold.

Reference contract: ``_join_markdown_pages`` (autoscan/autoscan.py:353-383) —
empty-page filtering and the adjacency-dependent separator must happen inside
ONE ordered fold (the separator depends on post-filter neighbors), so this is
``groupBy(conv_id).applyInPandas`` over the turn rows, not ``concat_ws``.

Scale note (100 TB): a conversation's full text must fit in one task for the
flat fold. For pathologically long conversations ``two_phase=True`` runs the
algebraically-equivalent two-level fold (kernels.pagejoin.fold_chunk /
combine_chunks): chunks of ``chunk_size`` turns fold in parallel keyed by
``(conv_id, chunk_id)`` — spreading a skewed conversation over many tasks —
then a second, tiny shuffle combines chunk summaries per conversation.
Equivalence is property-tested in tests/test_pagejoin.py.

``n_turns`` counts the successfully extracted turns entering the fold
(reference: pages processed = len(aggregated_markdown),
autoscan/autoscan.py:165,174), i.e. BEFORE empty-page filtering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from autoscan_spark.kernels.pagejoin import ChunkFold, combine_chunks, fold_chunk, join_pages

DOC_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("markdown", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("in_chars", LongType()),
        StructField("out_chars", LongType()),
    ]
)

_CHUNK_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("chunk_id", LongType()),
        StructField("text", StringType()),
        StructField("first_page", StringType()),
        StructField("last_page", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("in_chars", LongType()),
        StructField("out_chars", LongType()),
    ]
)


def _fold_flat(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    markdown = join_pages(pdf["extracted_text"].tolist())
    return pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "markdown": [markdown],
            "n_turns": [len(pdf)],
            "in_chars": [int(pdf["in_chars"].sum())],
            "out_chars": [int(pdf["out_chars"].sum())],
        }
    )


def _fold_chunk_stage(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    chunk = fold_chunk(pdf["extracted_text"].tolist())
    return pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "chunk_id": [int(pdf["chunk_id"].iloc[0])],
            "text": [chunk.text if chunk else None],
            "first_page": [chunk.first_page if chunk else None],
            "last_page": [chunk.last_page if chunk else None],
            "n_turns": [len(pdf)],
            "in_chars": [int(pdf["in_chars"].sum())],
            "out_chars": [int(pdf["out_chars"].sum())],
        }
    )


def _combine_stage(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("chunk_id")
    chunks = [
        ChunkFold(t, f, l) if t is not None else None
        for t, f, l in zip(pdf["text"], pdf["first_page"], pdf["last_page"])
    ]
    return pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "markdown": [combine_chunks(chunks)],
            "n_turns": [int(pdf["n_turns"].sum())],
            "in_chars": [int(pdf["in_chars"].sum())],
            "out_chars": [int(pdf["out_chars"].sum())],
        }
    )


def fold_documents(
    extracted: DataFrame,
    two_phase: bool = False,
    chunk_size: int = 1024,
) -> DataFrame:
    """Fold extracted turns into one markdown row per conversation.

    Input must contain conv_id, turn_idx, extracted_text, in_chars, out_chars
    (failed rows should already be dropped / have failed the job).
    """
    cols = extracted.select("conv_id", "turn_idx", "extracted_text", "in_chars", "out_chars")
    if not two_phase:
        return cols.groupBy("conv_id").applyInPandas(_fold_flat, schema=DOC_SCHEMA)

    chunked = cols.withColumn(
        "chunk_id", ((F.col("turn_idx") - F.lit(1)) / F.lit(chunk_size)).cast("long")
    )
    chunk_folds = chunked.groupBy("conv_id", "chunk_id").applyInPandas(
        _fold_chunk_stage, schema=_CHUNK_SCHEMA
    )
    return chunk_folds.groupBy("conv_id").applyInPandas(_combine_stage, schema=DOC_SCHEMA)
