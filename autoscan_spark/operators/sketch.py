"""Count-min sketch: a fixed-size frequency summary for unbounded key
domains (Cormode & Muthukrishnan 2005, public algorithm).

Why a sketch in a batch engine: an exact word-frequency table over a
100 TB corpus is itself huge (the long Zipf tail), and pipelines that
only need *approximate* hot-key detection (skew pre-detection before a
join, stop-phrase discovery, frequency floors for vocab pruning)
shouldn't pay a full-vocabulary shuffle to get it. The CMS table is
``depth × width`` counters REGARDLESS of corpus size — it broadcasts.

Distributed formulation (no per-executor mutable state, pure DataFrame):
every token emits ``depth`` (row, bucket) coordinates via seeded
xxhash64; ONE groupBy((row, bucket)) with map-side partial aggregation
IS the sketch build — Spark's partial-agg tree plays the role of the
streaming sketch merge (CMS is a linear sketch: coordinate-wise counter
sums of shards equal the sketch of the union).

Guarantees (standard CMS): estimate >= true count always (only
over-counts from collisions), and estimate <= true + e/width * N with
probability >= 1 - (1/2)^depth per query. Differential-tested against
exact counts in tests/test_textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from autoscan_spark.operators.sqlutil import qcol, qident, reject_reserved

HASH_FNS = ("xxhash64", "md5")


def _coords(word: Column, width: int, depth: int, hash_fn: str) -> Column:
    """The word's ``depth`` bucket coordinates as an array column.

    ``xxhash64`` (default) is the fast path — one JVM hash per row, no
    string materialization. ``md5`` derives the bucket from the first 8
    hex digits of ``md5(d || ':' || word)`` — slower (hex round-trip) but
    replayable by any engine with md5 (the repo's standard cross-engine
    hash idiom, cf. sampling._hash_bucket), which is what lets the driver
    oracle rebuild the identical sketch in DuckDB.
    """
    if hash_fn == "xxhash64":
        # pmod, not %: xxhash64 is signed and ANSI % keeps sign
        buckets = [
            F.pmod(F.xxhash64(F.lit(d), word), F.lit(width))
            for d in range(depth)
        ]
    elif hash_fn == "md5":
        # first 8 md5 hex digits -> BIGINT in [0, 2^32): always positive,
        # so % and pmod agree and DuckDB can replay it verbatim
        buckets = [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{d}:"), word)), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(width),
            )
            for d in range(depth)
        ]
    else:
        raise ValueError(f"hash_fn must be one of {HASH_FNS}, got {hash_fn!r}")
    return F.array(*buckets)


def cms_sketch(
    df: DataFrame,
    text_col: str = "text",
    width: int = 2048,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the count-min sketch of the corpus word stream.

    Shape: one hoisted split, one explode, ``depth`` coordinate columns
    from seeded xxhash64 (JVM, no Python), ONE groupBy((row, bucket)).
    The result is at most ``depth * width`` rows — broadcast-sized by
    construction and mergeable across corpora by coordinate-wise sum.

    Output: (``d`` int, ``bucket`` int, ``cnt`` bigint).
    """
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}/{depth}")
    reject_reserved(df, ("__cms_w",), "cms_sketch")
    words = df.select(
        F.explode(
            F.expr(f"split(trim(lower({qident(text_col)})), '\\\\s+')")
        ).alias("__word")
    )
    coords = words.select(
        F.posexplode(
            _coords(F.col("__word"), width, depth, hash_fn)
        ).alias("d", "bucket")
    )
    return (
        coords.groupBy(
            F.col("d").cast("int").alias("d"),
            F.col("bucket").cast("int").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    word_col: str = "word",
    width: int = 2048,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Estimate the corpus frequency of each candidate word from a built
    sketch: min over the word's ``depth`` counters (absent coordinate =
    0, though a word actually present in the stream always has all
    ``depth`` counters > 0).

    Shape: candidates fan out to ``depth`` coordinates, the SKETCH side
    broadcasts (it is depth × width rows by construction), one
    groupBy(word) takes the min — the corpus is not touched at all.

    Output: (word_col, ``est_count`` bigint); ``est_count >= true``
    always (CMS never under-counts).
    """
    coords = candidates.select(
        qcol(word_col),
        F.posexplode(
            _coords(qcol(word_col), width, depth, hash_fn)
        ).alias("__d", "__b"),
    )
    return (
        coords.join(
            F.broadcast(sketch),
            (F.col("__d") == F.col("d")) & (F.col("__b") == F.col("bucket")),
            "left",
        )
        .groupBy(qcol(word_col))
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    min_count: int,
    text_col: str = "text",
    width: int = 2048,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Heavy hitters via the sketch: every DISTINCT word whose CMS
    estimate reaches ``min_count``. No false negatives (estimates never
    under-count); false positives are collision-bounded by width/depth.

    The distinct-word candidate set is itself distributed (one distinct
    shuffle); only the sketch broadcasts. At 100 TB the candidate
    distinct is the vocab table every tokenizer pass already builds —
    the sketch spares the JOIN against a full exact-frequency table.

    Output: (``word``, ``est_count`` bigint), est_count >= min_count.
    """
    reject_reserved(df, ("__cms_w",), "cms_heavy_hitters")
    sketch = cms_sketch(
        df, text_col=text_col, width=width, depth=depth, hash_fn=hash_fn
    )
    cands = df.select(
        F.explode(
            F.expr(f"split(trim(lower({qident(text_col)})), '\\\\s+')")
        ).alias("word")
    ).distinct()
    est = cms_estimate(
        sketch, cands, word_col="word", width=width, depth=depth,
        hash_fn=hash_fn,
    )
    return est.filter(F.col("est_count") >= int(min_count))
