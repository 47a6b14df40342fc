from autoscan_spark.streaming.stream import (
    stream_extract,
    stream_turn_metrics,
    run_stream_to_parquet,
)

__all__ = ["stream_extract", "stream_turn_metrics", "run_stream_to_parquet"]
