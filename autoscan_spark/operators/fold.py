"""Per-conversation ordered document fold.

Reference contract: ``_join_markdown_pages`` (autoscan/autoscan.py:353-383) —
empty-page filtering and the adjacency-dependent separator must happen inside
ONE ordered fold (the separator depends on post-filter neighbors).

Physical design (chosen by measurement — see BENCH/BASELINE.md): the fold is
a JVM-side ``groupBy(conv_id).agg(array_sort(collect_list(struct(turn_idx,
extracted_text))))`` followed by ONE Arrow-vectorized ``pandas_udf`` that
applies the pure fold kernel per conversation. This beats a grouped
``applyInPandas`` by ~10× on many-small-conversation workloads: grouping and
sorting stay in Tungsten, and Python sees one Arrow batch of conversations
instead of one pandas DataFrame per group.

Scale note (100 TB): a conversation's turns must fit in one aggregation
buffer for the flat fold. For pathologically long conversations
``two_phase=True`` runs the algebraically-equivalent two-level fold
(kernels.pagejoin.fold_chunk / combine_chunks): chunks of ``chunk_size``
turns fold in parallel keyed by (conv_id, chunk_id) — spreading a skewed
conversation over many tasks — then a second, tiny shuffle combines boundary
-exact chunk summaries per conversation. Equivalence is property-tested in
tests/test_pagejoin.py and distribution-tested in tests/test_checkpoint_skew.py.

``n_turns`` counts the successfully extracted turns entering the fold
(reference: pages processed = len(aggregated_markdown),
autoscan/autoscan.py:165,174), i.e. BEFORE empty-page filtering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
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


# pandas_udf objects are created lazily (inside fold_documents): decorating at
# module import time requires an active SparkSession to parse the return type.


def _fold_turns_udf():
    @pandas_udf("string")
    def fold_turns(turns: pd.Series) -> pd.Series:
        # each element: list of {"turn_idx": int, "extracted_text": str}
        # dicts, already sorted by turn_idx via array_sort on the struct
        return turns.map(lambda ts: join_pages([t["extracted_text"] for t in ts]))

    return fold_turns


def _fold_chunk_udf():
    @pandas_udf("struct<text:string,first_page:string,last_page:string>")
    def fold_one_chunk(turns: pd.Series) -> pd.DataFrame:
        texts, firsts, lasts = [], [], []
        for ts in turns:
            chunk = fold_chunk([t["extracted_text"] for t in ts])
            texts.append(chunk.text if chunk else None)
            firsts.append(chunk.first_page if chunk else None)
            lasts.append(chunk.last_page if chunk else None)
        return pd.DataFrame(
            {"text": texts, "first_page": firsts, "last_page": lasts}
        )

    return fold_one_chunk


def _combine_chunks_udf():
    @pandas_udf("string")
    def combine_chunk_folds(chunks: pd.Series) -> pd.Series:
        def combine(cs) -> str:
            folds = [
                ChunkFold(c["text"], c["first_page"], c["last_page"])
                if c["text"] is not None
                else None
                for c in cs
            ]
            return combine_chunks(folds)

        return chunks.map(combine)

    return combine_chunk_folds


def resolve_fold_strategy(
    transcripts: DataFrame,
    two_phase,
    chunk_size: int = 1024,
    sample_fraction: float = 0.001,
    threshold_turns: int | None = None,
    conv_col: str = "conv_id",
    seed: int = 42,
) -> bool:
    """Resolve ``two_phase`` = False | True | "auto" to a concrete bool.

    ``"auto"`` estimates the hottest conversation's turn count from a sampled
    aggregate and picks the two-phase fold when the estimate exceeds
    ``threshold_turns`` (default ``16 * chunk_size`` — the point where one
    conversation would span enough chunks that spreading it over tasks beats
    the flat fold's single aggregation buffer).

    Cost model: ONE extra action, but on a column-pruned ``conv_col``-only
    scan of the PRE-KERNEL transcripts — call this with the raw input, never
    with the extraction output (sampling post-kernel rows would run the
    extraction kernel over everything just to count turns). Row-level
    sampling of a conversation with T turns yields ~T·f rows, so
    ``count/f`` is an unbiased estimate of T; the threshold is orders of
    magnitude above the noise floor for any T that matters.
    """
    if two_phase != "auto":
        return bool(two_phase)
    threshold = threshold_turns if threshold_turns is not None else 16 * chunk_size
    top = (
        transcripts.select(conv_col)
        .sample(fraction=sample_fraction, seed=seed)
        .groupBy(conv_col)
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    if top is None:
        return False
    return (top / sample_fraction) > threshold


def fold_documents(
    extracted: DataFrame,
    two_phase: bool = False,
    chunk_size: int = 1024,
) -> DataFrame:
    """Fold extracted turns into one markdown row per conversation.

    Input must contain conv_id, turn_idx, extracted_text, in_chars, out_chars
    (failed rows should already be dropped / have failed the job).
    """
    cols = extracted.select(
        "conv_id", "turn_idx", "extracted_text", "in_chars", "out_chars"
    )
    if not two_phase:
        agg = cols.groupBy("conv_id").agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "extracted_text"))
            ).alias("__turns"),
            F.count("*").cast("int").alias("n_turns"),
            F.sum("in_chars").cast("long").alias("in_chars"),
            F.sum("out_chars").cast("long").alias("out_chars"),
        )
        return agg.select(
            "conv_id",
            _fold_turns_udf()(F.col("__turns")).alias("markdown"),
            "n_turns",
            "in_chars",
            "out_chars",
        )

    chunked = cols.withColumn(
        "chunk_id", ((F.col("turn_idx") - F.lit(1)) / F.lit(chunk_size)).cast("long")
    )
    chunk_folds = (
        chunked.groupBy("conv_id", "chunk_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "extracted_text"))
            ).alias("__turns"),
            F.count("*").cast("int").alias("n_turns"),
            F.sum("in_chars").cast("long").alias("in_chars"),
            F.sum("out_chars").cast("long").alias("out_chars"),
        )
        .select(
            "conv_id",
            "chunk_id",
            _fold_chunk_udf()(F.col("__turns")).alias("__chunk"),
            "n_turns",
            "in_chars",
            "out_chars",
        )
    )
    combined = chunk_folds.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "chunk_id",
                    F.col("__chunk.text").alias("text"),
                    F.col("__chunk.first_page").alias("first_page"),
                    F.col("__chunk.last_page").alias("last_page"),
                )
            )
        ).alias("__chunks"),
        F.sum("n_turns").cast("int").alias("n_turns"),
        F.sum("in_chars").cast("long").alias("in_chars"),
        F.sum("out_chars").cast("long").alias("out_chars"),
    )
    return combined.select(
        "conv_id",
        _combine_chunks_udf()(F.col("__chunks")).alias("markdown"),
        "n_turns",
        "in_chars",
        "out_chars",
    )
