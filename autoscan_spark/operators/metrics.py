"""Per-conversation metric aggregation.

Reference A2/A3 (autoscan/autoscan.py:291-294,164-168): sums of token/cost
counters over successful pages plus per-page averages with a divide-by-zero
guard (``num_pages = len or 1``). Generalized: tokens/cost → char counts.
Pure declarative aggregation — map-side partial aggregation and AQE handle
the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_metrics(extracted: DataFrame) -> DataFrame:
    """Sums + guarded averages per conversation over ok turns only."""
    ok = extracted.filter(F.col("status") == "ok")
    agg = ok.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum("in_chars").cast("long").alias("total_in_chars"),
        F.sum("out_chars").cast("long").alias("total_out_chars"),
    )
    # reference guard: num_pages = len(aggregated_markdown) or 1
    denom = F.greatest(F.col("n_turns"), F.lit(1))
    return agg.select(
        "conv_id",
        "n_turns",
        "total_in_chars",
        "total_out_chars",
        (F.col("total_in_chars") / denom).alias("avg_in_chars"),
        (F.col("total_out_chars") / denom).alias("avg_out_chars"),
    )
