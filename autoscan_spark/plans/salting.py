"""Skew handling for long-conversation hot keys (north rule).

Conversation lengths are heavy-tailed (FIXTURES.md: mostly 1-10 turns, some
100-turn, occasionally ≥5,000-turn). Three mechanisms, used where each
actually helps:

1. ``salted_repartition`` — spreads one conversation's turns over up to
   ``salts`` partitions (partitioning key = (conv_id, turn_idx % salts))
   ahead of the LOW-mode kernel stage, so a monster conversation that landed
   in one input split doesn't serialize one task. Low-mode extraction is
   per-turn, so correctness is unaffected by the spread.
2. Two-phase fold (operators.fold ``two_phase=True``) — the ordered fold's
   groupBy(conv_id) is the one place a hot key is semantically sticky; the
   chunk fold re-keys by (conv_id, chunk_id), bounding any task at
   ``chunk_size`` turns, then combines boundary-exact chunk summaries.
3. HIGH mode is irreducibly serial per conversation (lag-1 *output* context,
   reference autoscan/autoscan.py:257-271) — no salt can split it; the
   mitigation is conversation-level parallelism, which groupBy provides.

AQE's skew-join splitting does not apply to grouped pandas UDFs, hence the
explicit salting (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, num_partitions: int, salts: int = 16) -> DataFrame:
    """Repartition transcripts by (conv_id, turn_idx % salts).

    Keeps (conv, salt) groups co-located while bounding any single
    conversation to ``salts``-way spread. Use before low-mode extraction when
    input splits are skewed; do NOT use before high mode (its groupBy
    re-shuffles by pure conv_id anyway).
    """
    return df.repartition(
        num_partitions,
        F.col("conv_id"),
        F.pmod(F.col("turn_idx").cast("long"), F.lit(salts)),
    )


def partition_sizes(df: DataFrame) -> list[int]:
    """Row count per physical partition (diagnostic, used by the skew test)."""
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    return [r["count"] for r in rows]
