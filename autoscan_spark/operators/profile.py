"""Table profiling: ANALYZE-style per-column statistics in ONE pass.

The operational prerequisite for everything else in a 100 TB pipeline —
before filtering/dedup/splitting you profile what's there. One aggregate
job computes every column's stats simultaneously (a naive per-column loop
would scan the table N times); the single stats row is then unpivoted with
``stack`` into one row per column. All JVM expressions.

``exact_distinct=False`` (default) uses ``approx_count_distinct`` (HLL++,
mergeable partial aggregation — the only sane choice at 10¹² rows);
``True`` uses exact ``count(distinct)`` for oracle checking at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) → one row per column:
    (column, dtype, n_rows, n_nulls, n_distinct, min_value, max_value).

    min/max are cast to string so every column fits one output schema
    (ints and strings round-trip exactly; profile floats with care).
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    # INDEX-based internal aliases + quote-escaped name literals: raw column
    # names interpolated into the stack() SQL would break (or inject) on
    # names containing quotes/backticks, which Spark allows. Columns are
    # resolved via backtick-quoting with doubled inner backticks — both
    # F.col and df[...] would otherwise parse the name.
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        col = F.col("`" + c.replace("`", "``") + "`")
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{i}"))
        if exact_distinct:
            aggs.append(F.countDistinct(col).alias(f"__nd_{i}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{i}"))
        aggs.append(F.min(col).cast("string").alias(f"__mn_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__mx_{i}"))
    stats = df.agg(*aggs)

    stack_args = []
    for i, c in enumerate(cols):
        name_lit = c.replace("\\", "\\\\").replace("'", "\\'")
        stack_args.append(
            f"'{name_lit}', '{dtypes[c]}', __rows, __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}"
        )
    stacked = stats.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, dtype, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )
    return stacked.select(
        "column",
        "dtype",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def length_deciles(
    df: DataFrame,
    n_tiles: int = 10,
    group_col: str = "lang",
    len_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group length-distribution report via ``ntile``: each group's
    rows are split into ``n_tiles`` equal-count tiles in (length, id)
    order and each tile reports its count and length range — the
    corpus-shape summary behind sequence-length bucketing and packing
    bin-size choices.

    Determinism: the ntile ORDER BY includes ``id_col`` so the total
    order (and therefore the tile assignment, which both Spark and ANSI
    engines define as first ``n mod tiles`` tiles one row larger) is
    unique — equal lengths can't flip tiles between runs or engines.

    Shape: ONE shuffle — the ntile window partitions by the group and
    the following groupBy keys on (group, tile), a superset clustering
    the window's hash partitioning already satisfies, so Catalyst adds
    no second exchange.

    Output: (group_col, ``tile`` int 1-based, ``n_docs`` bigint,
    ``min_len`` bigint, ``max_len`` bigint).
    """
    from pyspark.sql.window import Window

    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    w = Window.partitionBy(F.col(group_col)).orderBy(
        F.col(len_col).asc(), F.col(id_col).asc()
    )
    return (
        df.select(group_col, len_col, id_col)
        .withColumn("tile", F.ntile(n_tiles).over(w))
        .groupBy(group_col, "tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(len_col).cast("long").alias("min_len"),
            F.max(len_col).cast("long").alias("max_len"),
        )
    )
