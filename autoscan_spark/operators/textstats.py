"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Everything except the rolling-hash fingerprint is pure JVM column
expressions (codegen, no Python). The rolling hash is an Arrow-vectorized
pandas UDF with fixed 64-bit modular arithmetic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Language profiles: distinctive stopwords per language. Scores are stopword
# hits; CJK is detected by character class first (no spaces to tokenize).
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is", "that", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es": ("el", "la", "los", "que", "es", "una", "por", "para"),
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``lang_pred``: n-gram/stopword-heuristic language guess.

    JVM-side: per-language stopword-hit counts via array_intersect-style
    filters over the token array; argmax via array_max over (score, lang)
    structs; CJK short-circuit via a unicode-range regexp count.
    """
    words = f"split(trim(lower({text_col})), '\\\\s+')"
    scores = []
    for lang, stops in LANG_STOPWORDS.items():
        stop_list = ",".join(f"'{w}'" for w in stops)
        scores.append(
            f"struct(size(filter({words}, w -> w in ({stop_list}))) as score, "
            f"'{lang}' as lang)"
        )
    argmax = f"array_max(array({', '.join(scores)})).lang"
    cjk = f"length(regexp_replace({text_col}, '[^\\\\x{{4e00}}-\\\\x{{9fff}}]', ''))"
    return df.withColumn(
        "lang_pred",
        F.expr(
            f"CASE WHEN {cjk} * 2 > length({text_col}) THEN 'zh' ELSE {argmax} END"
        ),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add quality-heuristic feature columns (all JVM expressions):
    n_chars, n_words, mean_word_len, punct_ratio, stopword_ratio,
    upper_ratio, and a composite ``quality_ok`` boolean gate."""
    words = f"split(trim(lower({text_col})), '\\\\s+')"
    all_stops = ",".join(
        f"'{w}'" for stops in LANG_STOPWORDS.values() for w in stops
    )
    n_chars = F.length(text_col)
    n_words = F.expr(f"size({words})")
    df = (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn(
            "mean_word_len",
            F.expr(
                f"length(regexp_replace({text_col}, '\\\\s+', '')) / greatest(size({words}), 1)"
            ),
        )
        .withColumn(
            "punct_ratio",
            F.expr(
                f"length(regexp_replace({text_col}, '[^!-/:-@\\\\[-`]', '')) / greatest(length({text_col}), 1)"
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.expr(
                f"size(filter({words}, w -> w in ({all_stops}))) / greatest(size({words}), 1)"
            ),
        )
        .withColumn(
            "upper_ratio",
            F.expr(
                f"length(regexp_replace({text_col}, '[^A-Z]', '')) / greatest(length({text_col}), 1)"
            ),
        )
    )
    return df.withColumn(
        "quality_ok",
        (F.col("n_words") >= 5)
        & (F.col("mean_word_len") >= 2)
        & (F.col("mean_word_len") <= 15)
        & (F.col("punct_ratio") <= 0.3)
        & (F.col("upper_ratio") <= 0.3),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_ws_tokens`` (whitespace) and ``n_bpe_tokens`` (BPE-ish regex:
    word pieces + standalone punctuation — the usual pre-tokenizer shape)."""
    return df.withColumn(
        "n_ws_tokens", F.expr(f"size(split(trim({text_col}), '\\\\s+'))").cast("long")
    ).withColumn(
        "n_bpe_tokens",
        F.expr(f"size(regexp_extract_all({text_col}, '\\\\w+|[^\\\\w\\\\s]', 0))").cast("long"),
    )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 257


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``fingerprint``: polynomial rolling hash (base 257 mod 2^61-1) of
    the whitespace-normalized, lowercased text. Arrow-vectorized; Python int
    arithmetic keeps it exact and portable."""

    @pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            norm = " ".join((t or "").lower().split())
            h = 0
            for ch in norm.encode("utf-8"):
                h = (h * _FP_BASE + ch) % _FP_MOD
            out.append(h)
        return pd.Series(out, dtype="int64")

    return df.withColumn("fingerprint", _fp(F.col(text_col)))


def content_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``content_fp``: md5 of the whitespace-normalized lowercased text —
    the SQL-expressible (oracle-checkable) fingerprint variant."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn("content_fp", F.md5(norm))
