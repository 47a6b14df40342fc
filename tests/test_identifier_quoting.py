"""Operators that build SQL text with F.expr must survive hostile column
names (spaces, dots, quotes, backticks — all legal in Spark) and hostile
interpolated VALUES (split names / stratum values / salts containing
quotes). Names route through sqlutil.qident, literals through
sqlutil.qlit; these tests pin the sweep across representative operators
from textstats / dedup / sampling, checking value-equality against the
same operator run on plain names.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F

WEIRD_TEXT = "the text`col 'x'.y"
WEIRD_ID = "doc id`.'q"

TEXTS = [
    "the quick brown fox jumps over the lazy dog and runs away fast",
    "a b c a b c a b c",
    "hello world hello world unique ending",
    "",
]


def _frames(spark):
    plain = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    weird = plain.withColumnRenamed("text", WEIRD_TEXT).withColumnRenamed(
        "doc_id", WEIRD_ID
    )
    return plain, weird


def _vals(df, *cols):
    from autoscan_spark.operators.sqlutil import qident

    return sorted(
        map(tuple, df.select(*[F.col(qident(c)) for c in cols]).collect())
    )


def test_lang_id_weird_columns(spark):
    from autoscan_spark.operators.textstats import lang_id

    plain, weird = _frames(spark)
    a = _vals(lang_id(plain), "doc_id", "lang_pred")
    b = _vals(lang_id(weird, text_col=WEIRD_TEXT), WEIRD_ID, "lang_pred")
    assert a == b


def test_quality_and_gopher_weird_columns(spark):
    from autoscan_spark.operators.textstats import gopher_quality, quality_features

    plain, weird = _frames(spark)
    cols = ["n_words", "mean_word_len", "punct_ratio", "quality_ok"]
    a = _vals(quality_features(plain), *cols)
    b = _vals(quality_features(weird, text_col=WEIRD_TEXT), *cols)
    assert a == b
    gcols = ["n_words", "symbol_ratio", "gopher_ok"]
    a = _vals(gopher_quality(plain), *gcols)
    b = _vals(gopher_quality(weird, text_col=WEIRD_TEXT), *gcols)
    assert a == b


def test_shingles_and_span_hashes_weird_columns(spark):
    from autoscan_spark.operators.dedup import duplicate_spans, word_shingles

    plain, weird = _frames(spark)
    a = _vals(word_shingles(plain), "shingles")
    b = _vals(word_shingles(weird, text_col=WEIRD_TEXT), "shingles")
    assert a == b
    a = _vals(duplicate_spans(plain, n=3), "n_windows", "n_dup_windows")
    b = _vals(
        duplicate_spans(weird, text_col=WEIRD_TEXT, id_col=WEIRD_ID, n=3),
        "n_windows",
        "n_dup_windows",
    )
    assert a == b


def test_sampling_weird_columns_and_values(spark):
    """hash_split / stratified_hash_sample with a weird key column, split
    names and stratum values containing quotes — the ADVICE injection
    case. Values must equal the plain-named run (same md5 inputs)."""
    from autoscan_spark.operators.sampling import hash_split, stratified_hash_sample

    pdf = pd.DataFrame(
        {
            "k": [str(i) for i in range(60)],
            "lang": ["it's-en" if i % 2 else "de'de" for i in range(60)],
        }
    )
    plain = spark.createDataFrame(pdf)
    weird = plain.withColumnRenamed("k", WEIRD_ID).withColumnRenamed(
        "lang", WEIRD_TEXT
    )
    fr = {"tr'ain": 0.5, "te`st": 0.5}
    a = sorted(
        (r["k"], r["split"]) for r in hash_split(plain, "k", fr).collect()
    )
    b = sorted(
        (r[WEIRD_ID], r["split"]) for r in hash_split(weird, WEIRD_ID, fr).collect()
    )
    assert a == b and {s for _, s in a} == set(fr)

    frac = {"it's-en": 1.0, "de'de": 0.0}
    a = {r["k"] for r in
         stratified_hash_sample(plain, "k", "lang", frac).collect()}
    b = {r[WEIRD_ID] for r in
         stratified_hash_sample(weird, WEIRD_ID, WEIRD_TEXT, frac).collect()}
    assert a == b
    assert a == {str(i) for i in range(60) if i % 2}


def test_line_and_budget_weird_columns(spark):
    from autoscan_spark.operators.dedup import line_dedup
    from autoscan_spark.operators.sampling import token_budget_sample

    plain, weird = _frames(spark)
    cols = ["n_lines_total", "n_lines_kept", "dedup_text"]
    a = _vals(line_dedup(plain), *cols)
    b = _vals(line_dedup(weird, text_col=WEIRD_TEXT, id_col=WEIRD_ID), *cols)
    assert a == b

    toks = plain.withColumn("n tok's", F.lit(7))
    toks_w = weird.withColumn("n tok's", F.lit(7))
    a = {
        r["doc_id"]
        for r in token_budget_sample(
            toks, 14, key_col="doc_id", token_col="n tok's"
        ).collect()
    }
    b = {
        r[WEIRD_ID]
        for r in token_budget_sample(
            toks_w, 14, key_col=WEIRD_ID, token_col="n tok's"
        ).collect()
    }
    assert a == b and len(a) == 2
