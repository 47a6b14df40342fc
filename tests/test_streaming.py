"""Structured Streaming extraction tests: incremental processing matches the
batch path; new files are picked up without reprocessing old ones."""

import os

from autoscan_spark.operators.extract import extract_turns
from autoscan_spark.sources.transcripts import synthesize_transcripts
from autoscan_spark.streaming.stream import run_stream_to_parquet, stream_extract, stream_turn_metrics


def test_stream_matches_batch_and_is_incremental(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    batch1 = synthesize_transcripts(spark, 10, seed=11)
    batch1.write.mode("append").parquet(src)

    run_stream_to_parquet(stream_extract(spark, src), out, ckpt)
    got1 = spark.read.parquet(out)
    want1 = extract_turns(spark.read.parquet(src), mode="low")
    assert got1.count() == want1.count()

    # batch 2 arrives; only the delta should be processed (exactly-once per
    # source file via the streaming checkpoint)
    from pyspark.sql import functions as F

    batch2 = synthesize_transcripts(spark, 5, seed=12).withColumn(
        "conv_id", F.concat(F.lit("b2-"), F.col("conv_id"))
    )
    batch2.write.mode("append").parquet(src)
    run_stream_to_parquet(stream_extract(spark, src), out, ckpt)

    got2 = spark.read.parquet(out)
    want2 = extract_turns(spark.read.parquet(src), mode="low")
    assert got2.count() == want2.count()
    # no duplicates: (conv_id, turn_idx) unique across increments
    assert got2.select("conv_id", "turn_idx").distinct().count() == got2.count()

    # per-turn equality with the batch path
    g = {(r["conv_id"], r["turn_idx"]): r["extracted_text"] for r in got2.collect()}
    w = {(r["conv_id"], r["turn_idx"]): r["extracted_text"] for r in want2.collect()}
    assert g == w


def test_stream_windowed_metrics(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("streamw"))
    src = os.path.join(base, "src")
    synthesize_transcripts(spark, 20, seed=13).write.mode("append").parquet(src)

    metrics = stream_turn_metrics(spark, src, window="1 minute", watermark="5 minutes")
    # complete mode: append would hold the still-open window back until the
    # watermark passes it, which a single availableNow run never does for
    # fixture data that all lands in one window
    q = (
        metrics.writeStream.format("memory")
        .queryName("turn_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM turn_metrics").collect()
    src_count = spark.read.parquet(src).count()
    assert sum(r["n_turns"] for r in rows) == src_count
    assert all(r["window_start"] is not None for r in rows)
    assert all(r["n_convs_approx"] > 0 for r in rows)
