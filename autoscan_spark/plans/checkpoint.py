"""Resumable, per-partition-committed extraction (north rule).

The unit of commit is a conv_id hash BUCKET: ``bucket =
pmod(xxhash64(conv_id), n_buckets)``. Every conversation lives wholly in one
bucket, so both the per-turn ``extracted`` table and the per-conversation
``doc_markdown`` table can be produced and committed bucket-by-bucket, and a
killed job resumes from the last committed bucket by anti-joining the lineage
table (reference analog of the MERGE-on-conv_id upsert sink, SURVEY.md §2 K1,
generalizing autoscan/common.py:61-84 + the run summary
autoscan/autoscan.py:164-191).

Storage layout (parquet; swaps to Iceberg ``MERGE INTO`` unchanged in shape
when an Iceberg catalog is configured — the bucket column becomes the Iceberg
partition spec ``bucket(n, conv_id)``):

    {root}/extracted/bucket=<b>/...      per-turn results
    {root}/doc_markdown/bucket=<b>/...   per-conversation fold
    {root}/lineage/...                   append-only commit log

A bucket is COMMITTED iff a lineage row exists for it. Writes use dynamic
partition overwrite, so re-processing a bucket that was half-written when the
job died simply replaces it — idempotent resume, no duplicates (verified by
tests/test_checkpoint.py kill/resume test).

``waves`` controls how many buckets commit per Spark action: waves=1 is one
big job (fastest), larger waves give finer resume granularity — the
throughput/recoverability knob a 10^12-turn run tunes.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from autoscan_spark import EXTRACTOR_VERSION
from autoscan_spark.operators.extract import drop_failed, extract_turns
from autoscan_spark.operators.fold import fold_documents, resolve_fold_strategy
from autoscan_spark.operators.polish import polish_documents

# bump when LINEAGE_SCHEMA changes shape: the lineage dir is append-only
# parquet, so appending a new schema next to old files would leave a
# mixed-schema table that spark.read.parquet resolves from an arbitrary
# footer. v2 = wall_time_s replaced by (wave_id, wave_wall_s).
LINEAGE_VERSION = 2

LINEAGE_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType()),
        StructField("rows_in", LongType()),
        StructField("rows_out", LongType()),
        StructField("extractor_version", StringType()),
        # wall time is measured per WAVE (buckets in a wave run as one Spark
        # job, so per-bucket wall is not individually observable); wave_id
        # distinguishes commit groups so the wall is never misread as
        # per-bucket
        StructField("wave_id", IntegerType()),
        StructField("wave_wall_s", DoubleType()),
        StructField("committed_at", TimestampType()),
    ]
)


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")
    )


@dataclass
class CheckpointedExtraction:
    root: str
    n_buckets: int = 64
    mode: str = "low"
    two_phase_fold: bool | str = False  # False | True | "auto"
    polish: bool = False

    @property
    def extracted_path(self) -> str:
        return os.path.join(self.root, "extracted")

    @property
    def docs_path(self) -> str:
        return os.path.join(self.root, "doc_markdown")

    @property
    def lineage_path(self) -> str:
        return os.path.join(self.root, "lineage")

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_checkpoint_meta.json")

    def _check_meta(self) -> None:
        """Bucket count, mode and polish are part of the checkpoint's
        identity: changing them across runs would silently mix bucket layouts
        or polished/unpolished documents and corrupt resume semantics — fail
        loudly instead."""
        import json

        meta = {
            "n_buckets": self.n_buckets,
            "mode": self.mode,
            "polish": self.polish,
            "lineage_version": LINEAGE_VERSION,
        }
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                existing = json.load(f)
            existing.setdefault("polish", False)  # pre-polish checkpoints
            # pre-versioning checkpoints carry the v1 lineage schema; a v2
            # append would mix schemas in the append-only lineage dir
            existing.setdefault("lineage_version", 1)
            if existing != meta:
                raise ValueError(
                    f"checkpoint at {self.root} was created with {existing}; "
                    f"this run uses {meta} — refusing to mix bucket layouts "
                    f"or lineage schemas. Use the original settings or a "
                    f"fresh output root."
                )
            return
        os.makedirs(self.root, exist_ok=True)
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)

    def committed_buckets(self, spark: SparkSession) -> set[int]:
        try:
            rows = spark.read.parquet(self.lineage_path).select("partition_id").collect()
        except Exception:
            return set()
        return {r["partition_id"] for r in rows}

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.lineage_path)

    def run(
        self,
        transcripts: DataFrame,
        waves: int = 1,
        max_waves: int | None = None,
    ) -> int:
        """Process all not-yet-committed buckets in ``waves`` commit groups.

        ``max_waves`` stops early after that many commits (used by the resume
        test to simulate a mid-job kill between commits). Returns the number
        of buckets committed by THIS call.
        """
        spark = transcripts.sparkSession
        self._check_meta()
        done = self.committed_buckets(spark)
        remaining = [b for b in range(self.n_buckets) if b not in done]
        if not remaining:
            return 0

        # fold-strategy auto-selection happens ONCE per run, on the raw
        # (pre-kernel, column-pruned) transcripts — not per wave. The choice
        # doesn't affect output (flat/two-phase are equivalence-tested), so
        # it is deliberately NOT part of the checkpoint identity.
        two_phase = resolve_fold_strategy(transcripts, self.two_phase_fold)

        per_wave = math.ceil(len(remaining) / max(waves, 1))
        committed = 0
        for w in range(0, len(remaining), per_wave):
            if max_waves is not None and w // per_wave >= max_waves:
                break
            wave_buckets = remaining[w : w + per_wave]
            self._run_wave(spark, transcripts, wave_buckets, two_phase,
                           wave_id=w // per_wave)
            committed += len(wave_buckets)
        return committed

    def _run_wave(
        self,
        spark: SparkSession,
        transcripts: DataFrame,
        buckets: list[int],
        two_phase: bool | None = None,
        wave_id: int = 0,
    ) -> None:
        t0 = time.perf_counter()
        src = with_bucket(transcripts, self.n_buckets).filter(
            F.col("bucket").isin([int(b) for b in buckets])
        )
        # cache the wave's extraction output: it feeds three consumers
        # (extracted sink, fold, lineage counts) — one kernel pass, not three
        extracted = with_bucket(
            extract_turns(src, mode=self.mode), self.n_buckets
        ).cache()
        try:
            (
                extracted.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(self.extracted_path)
            )
            if two_phase is None:
                two_phase = resolve_fold_strategy(transcripts, self.two_phase_fold)
            ok = drop_failed(extracted)
            docs = fold_documents(ok, two_phase=two_phase).join(
                ok.select("conv_id", "bucket").distinct(), on="conv_id"
            )
            if self.polish:
                docs = polish_documents(docs)
            (
                docs.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(self.docs_path)
            )

            rows_in = {
                r["bucket"]: r["count"]
                for r in src.groupBy("bucket").count().collect()
            }
            rows_out = {
                r["bucket"]: r["count"]
                for r in ok.groupBy("bucket").count().collect()
            }
        finally:
            extracted.unpersist()

        wall = time.perf_counter() - t0
        now = datetime.now(timezone.utc)
        lineage_rows = [
            (
                int(b),
                int(rows_in.get(b, 0)),
                int(rows_out.get(b, 0)),
                EXTRACTOR_VERSION,
                int(wave_id),
                float(wall),
                now,
            )
            for b in buckets
        ]
        # the lineage append is the COMMIT POINT: buckets become durable only
        # once their lineage rows land
        spark.createDataFrame(lineage_rows, schema=LINEAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.lineage_path)
