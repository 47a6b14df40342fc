"""Temporal join operators: distributed as-of join.

Spark has no native ASOF JOIN (TimescaleDB/kdb/DuckDB do); the classic
distributed formulation is the UNION-TAG pattern — no range-join explosion,
no per-key collect:

1. Tag right rows (1) and left rows (0) and union them by name.
2. One window pass per key, ordered by (ts, tag DESC): ``last(right_payload,
   ignorenulls=True)`` carries the most recent right row forward onto every
   subsequent left row. Tag DESC puts an equal-timestamp right row BEFORE
   the left row, so "at-or-before" includes exact ties.
3. Keep the left rows; apply the optional tolerance (max lookback) by
   nulling carried values whose carried ts is too old.

Scale shape: exactly ONE shuffle (the window partition by key). Cost is
O((|L|+|R|) log) for the per-partition sort — compare a naive range join's
O(|L|·|R|) per key blowup. A single pathologically hot key serializes its
window; at 100 TB shard hot keys by time range first (the standard
time-series split), then stitch boundaries with a second small pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: each left row gets the ``value_cols`` of the most recent
    right row with ``right_ts <= left_ts`` for the same ``by`` key (backward
    direction, inclusive). Left rows with no prior right row keep nulls.

    DETERMINISM: if the right side has several rows at the same
    (by, right_ts), which one wins is undefined (same as any ASOF engine) —
    pre-dedupe the right side to one row per (key, ts) first.

    ``tolerance_seconds``: max lookback — carried values older than
    ``left_ts - tolerance`` are nulled (match dropped, row kept).
    """
    carried = [f"__asof_{c}" for c in value_cols]
    l_tag = left.withColumn("__is_right", F.lit(0)).withColumn(
        "__asof_ts", F.lit(None).cast(right.schema[right_ts].dataType)
    )
    for c, cc in zip(value_cols, carried):
        l_tag = l_tag.withColumn(cc, F.lit(None).cast(right.schema[c].dataType))

    r_tag = right.select(
        F.col(by),
        F.col(right_ts).alias("__evt_ts"),
        F.lit(1).alias("__is_right"),
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
    )
    l_cols = left.columns
    l_tag = l_tag.withColumn("__evt_ts", F.col(left_ts))
    unioned = l_tag.select(
        *l_cols, "__evt_ts", "__is_right", "__asof_ts", *carried
    ).unionByName(r_tag, allowMissingColumns=True)

    # right rows sort before left rows at equal ts → inclusive "at-or-before"
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("__evt_ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("__asof_ts", ignorenulls=True).over(w).alias("__m_ts"),
        *[
            F.last(cc, ignorenulls=True).over(w).alias(f"__m_{c}")
            for c, cc in zip(value_cols, carried)
        ],
    ).filter(F.col("__is_right") == 0)

    if tolerance_seconds is not None:
        in_window = F.col("__m_ts") >= F.col("__evt_ts") - F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )
        sel = [
            F.when(in_window, F.col(f"__m_{c}")).alias(c) for c in value_cols
        ]
    else:
        sel = [F.col(f"__m_{c}").alias(c) for c in value_cols]
    return filled.select(*l_cols, *sel)
