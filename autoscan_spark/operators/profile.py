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
