"""Deterministic sampling / dataset-split operators for training-data prep.

Everything is HASH-derived, not RNG-derived: a row's split assignment or
sample membership depends only on (salt, key), so it is stable across runs,
engines, partitionings and cluster sizes — the property a 100 TB training
pipeline needs (re-running the pipeline, or running it on a different
cluster, must not shuffle documents between train and test).

The hash is the first 8 hex chars of md5 → a uniform 32-bit integer. md5 is
bit-identical in every engine (the DuckDB oracle mirrors it exactly), unlike
xxhash64 which is Spark-specific. All expressions are JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_bucket(key_col: str, salt: str) -> str:
    """Uniform bucket in [0, 1e6) from md5(salt || key) — cross-engine SQL."""
    return (
        f"pmod(CAST(conv(substring(md5(concat('{salt}', CAST({key_col} AS STRING))), "
        f"1, 8), 16, 10) AS BIGINT), {_BUCKETS})"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Add ``split``: deterministic train/val/test assignment by key hash.

    ``fractions`` maps split name → fraction (must sum to ~1.0; iteration
    order defines the cumulative bucket ranges, so pass an ordered dict —
    plain dicts preserve insertion order). Rows with equal keys always land
    in the same split (leakage-safe when the key is the dedup identity).
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = _hash_bucket(key_col, salt)
    expr = "CASE "
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        expr += f"WHEN {bucket} < {int(round(cum * _BUCKETS))} THEN '{name}' "
    expr += f"ELSE '{names[-1]}' END"
    return df.withColumn("split", F.expr(expr))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Deterministic ~``fraction`` sample by key hash (stable across runs
    and engines — unlike ``DataFrame.sample``, which is seed+partitioning
    dependent)."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    bucket = _hash_bucket(key_col, salt)
    return df.filter(F.expr(f"{bucket} < {int(round(fraction * _BUCKETS))}"))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    salt: str = "cap-v1",
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen DETERMINISTICALLY by key
    hash order (md5) — the per-domain / per-source document cap every web
    pipeline applies so one host cannot dominate the corpus. Hash order
    (not "first n" or RNG) makes the kept set stable across runs, engines
    and partitionings, and unbiased within the group.

    One window shuffle on the group key; a pathologically hot group is the
    usual AQE-skew case. Ties on the hash are broken by the key itself, so
    the result is total-order deterministic.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql.window import Window

    bucket = _hash_bucket(key_col, salt)
    w = Window.partitionBy(group_col).orderBy(
        F.expr(bucket).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def temperature_rates(
    df: DataFrame, strata_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-stratum keep rates for a temperature-resampled training mixture
    (the public multilingual recipe: sample language l with probability
    proportional to its corpus share raised to ``alpha`` — XLM-R style).

    Returns one row per stratum: (strata, ``n_docs``, ``keep_rate``) where
    ``keep_rate = (n_min / n_s) ** (1 - alpha)`` — downsample-only, the
    smallest stratum keeps everything. ``alpha=1`` keeps the natural
    mixture; ``alpha=0`` equalizes strata.

    Determinism note: for alpha in {0, 0.5, 1} the rate uses only
    division and ``sqrt`` — both correctly rounded under IEEE-754, so the
    value is bit-identical cross-engine (oracle-checkable). Other alphas
    go through ``power``, which carries no such guarantee.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count("*").cast("long").alias("n_docs"))
    ratio = "CAST(min(n_docs) OVER () AS DOUBLE) / n_docs"
    if alpha == 1.0:
        rate = "CAST(1.0 AS DOUBLE)"
    elif alpha == 0.5:
        rate = f"sqrt({ratio})"
    elif alpha == 0.0:
        rate = ratio
    else:
        rate = f"power({ratio}, {1.0 - alpha!r})"
    return counts.withColumn("keep_rate", F.expr(rate))


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    salt: str = "temp-v1",
) -> DataFrame:
    """Deterministically downsample each stratum to its temperature-mixture
    rate (``temperature_rates``): keep a row iff its md5 bucket falls under
    the stratum's keep rate. Two passes over the input (a column-pruned
    count scan, then the filter); the rates table is tiny and broadcast,
    so the sampling pass itself is shuffle-free.
    """
    # null-safe equality: a NULL stratum (e.g. undetected language) has its
    # own rate row — a plain equi-join would silently drop every such row
    rates = temperature_rates(df, strata_col, alpha).select(
        F.col(strata_col).alias("__strata"), "keep_rate"
    )
    bucket = _hash_bucket(key_col, salt)
    return (
        df.join(
            F.broadcast(rates), F.col(strata_col).eqNullSafe(F.col("__strata"))
        )
        .filter(F.expr(f"CAST({bucket} AS DOUBLE) < keep_rate * {_BUCKETS}"))
        .drop("__strata", "keep_rate")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    key_col: str,
    token_col: str,
    strata_col: str | None = None,
    salt: str = "budget-v1",
) -> DataFrame:
    """Corpus packing to a token budget: keep documents, in deterministic
    md5-hash order, until each stratum's cumulative token count reaches
    ``budget_tokens`` — "build a 10B-token training mix with at most
    ``budget`` tokens per language". A document is kept iff the running
    sum INCLUDING itself is within budget (so one oversized head document
    is kept only if it fits).

    Hash order makes the kept set an unbiased, run/engine/partitioning-
    stable subset (ties broken by the key). Cost: ONE shuffle + sort per
    stratum for the running-sum window; a stratum is typically a language
    (dozens of partitions of the corpus). At 100 TB the exact window sort
    is the honest cost of an exact budget; the cheap approximation —
    estimate tokens/doc from a sample and reuse ``hash_sample`` at rate
    ``budget / est_total`` — avoids the sort when a few-percent overshoot
    is acceptable.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    from pyspark.sql.window import Window

    bucket = _hash_bucket(key_col, salt)
    parts = [F.col(strata_col)] if strata_col else [F.lit(1)]
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.expr(bucket).asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__cum", F.sum(token_col).over(w))
        .filter(F.col("__cum") <= budget_tokens)
        .drop("__cum")
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling: e.g. keep 100% of low-resource
    languages and 5% of English. ``fractions`` maps stratum value →
    fraction; strata not listed get ``default_fraction``. One JVM CASE
    expression — no per-stratum jobs, no shuffle."""
    for v in fractions.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fractions must be in [0, 1], got {v}")
    bucket = _hash_bucket(key_col, salt)
    expr = "CASE "
    for value, frac in fractions.items():
        expr += (
            f"WHEN {strata_col} = '{value}' "
            f"THEN {bucket} < {int(round(frac * _BUCKETS))} "
        )
    expr += f"ELSE {bucket} < {int(round(default_fraction * _BUCKETS))} END"
    return df.filter(F.expr(expr))
