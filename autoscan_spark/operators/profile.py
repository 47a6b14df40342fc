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
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__mx_{c}"))
    stats = df.agg(*aggs)

    stack_args = []
    for c in cols:
        stack_args.append(
            f"'{c}', '{dtypes[c]}', __rows, `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`"
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
