"""Per-turn extraction operators.

Two execution strategies, mirroring the reference's accuracy modes
(autoscan/autoscan.py:93-99):

- ``mode='low'``  — embarrassingly parallel, shuffle-free: ``mapInArrow`` over
  the scan partitions (reference analog: concurrent asyncio.gather path,
  autoscan/autoscan.py:272-289). At 100 TB this is the throughput path — the
  extraction stage adds ZERO shuffles; Catalyst pushes the turn-range filter
  into the parquet/Iceberg scan, and each Arrow batch is processed by a
  vectorized Python kernel.

- ``mode='high'`` — per-conversation serial fold with lag-1 *output* context
  (reference: sequential loop, autoscan/autoscan.py:257-271; context
  consumption img_to_md_processor.py:56-71). Because turn k's kernel consumes
  turn k-1's OUTPUT, the chain is irreducible per conversation — parallelism
  comes from conversations, so this is ``groupBy(conv_id).applyInPandas`` (one
  shuffle) with the group sorted by ``turn_idx``.

Error semantics (reference X3, autoscan/autoscan.py:250-255,283-289):
- low mode: failures become ``status='error:...'`` rows; ``drop_failed``
  removes them before the fold (the reference logs + silently drops).
- high mode: any failure raises → the Spark job fails (fail-fast), matching
  the reference's LLMProcessingError propagation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from autoscan_spark import EXTRACTOR_VERSION
from autoscan_spark.kernels.dispatch import extract_turn

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("kind", StringType()),
        ]
    )
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("extracted_text", StringType()),
        StructField("spans", SPAN_TYPE),
        StructField("status", StringType()),
        StructField("kind", StringType()),
        StructField("in_chars", LongType()),
        StructField("out_chars", LongType()),
        StructField("extractor_version", StringType()),
    ]
)

_ARROW_SPAN_TYPE = pa.list_(
    pa.struct([("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string())])
)
_ARROW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("extracted_text", pa.string()),
        ("spans", _ARROW_SPAN_TYPE),
        ("status", pa.string()),
        ("kind", pa.string()),
        ("in_chars", pa.int64()),
        ("out_chars", pa.int64()),
        ("extractor_version", pa.string()),
    ]
)


def _extract_rows(conv_ids, turn_idxs, roles, texts, prev_outputs=None):
    """Shared row loop. ``prev_outputs`` is only used by the serial path."""
    out = {name: [] for name in _ARROW_SCHEMA.names}
    for i in range(len(texts)):
        text = texts[i]
        prev = prev_outputs[i] if prev_outputs is not None else None
        extracted, spans, status, kind = extract_turn(text, roles[i], prev)
        out["conv_id"].append(conv_ids[i])
        out["turn_idx"].append(turn_idxs[i])
        out["extracted_text"].append(extracted)
        out["spans"].append(
            [{"start": s, "end": e, "kind": k} for s, e, k in spans]
        )
        out["status"].append(status)
        out["kind"].append(kind)
        out["in_chars"].append(len(text) if text is not None else 0)
        out["out_chars"].append(len(extracted))
        out["extractor_version"].append(EXTRACTOR_VERSION)
    return out


def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """Vectorized batch kernel. Hot path discipline (this function dominates
    the 100 TB run): input key columns pass through as Arrow arrays untouched
    (zero copy); only role/text cross into Python; output arrays are built
    natively (ListArray.from_arrays for spans) — no from_pydict, no pandas;
    char counters come from Arrow compute, not Python len()."""
    import pyarrow.compute as pc

    span_fields = list(_ARROW_SPAN_TYPE.value_type)
    for batch in batches:
        texts = batch.column("text").to_pylist()
        roles = batch.column("role").to_pylist()
        n = len(texts)
        out_texts = [None] * n
        statuses = [None] * n
        kinds = [None] * n
        span_offsets = [0] * (n + 1)
        starts: list[int] = []
        ends: list[int] = []
        span_kinds: list[str] = []
        for i in range(n):
            extracted, spans, status, kind = extract_turn(texts[i], roles[i])
            out_texts[i] = extracted
            statuses[i] = status
            kinds[i] = kind
            for s, e, k in spans:
                starts.append(s)
                ends.append(e)
                span_kinds.append(k)
            span_offsets[i + 1] = len(starts)

        struct = pa.StructArray.from_arrays(
            [
                pa.array(starts, pa.int32()),
                pa.array(ends, pa.int32()),
                pa.array(span_kinds, pa.string()),
            ],
            fields=span_fields,
        )
        spans_arr = pa.ListArray.from_arrays(pa.array(span_offsets, pa.int32()), struct)
        out_text_arr = pa.array(out_texts, pa.string())
        in_chars = pc.fill_null(
            pc.cast(pc.utf8_length(batch.column("text")), pa.int64()), 0
        )
        out_chars = pc.cast(pc.utf8_length(out_text_arr), pa.int64())
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("conv_id"),
                pc.cast(batch.column("turn_idx"), pa.int32()),
                out_text_arr,
                spans_arr,
                pa.array(statuses, pa.string()),
                pa.array(kinds, pa.string()),
                in_chars,
                out_chars,
                pa.nulls(n, pa.string()).fill_null(EXTRACTOR_VERSION),
            ],
            schema=_ARROW_SCHEMA,
        )


_SERIAL_RESULT_TYPE = (
    "array<struct<turn_idx:int,extracted_text:string,"
    "spans:array<struct<start:int,end:int,kind:string>>,"
    "status:string,kind:string,in_chars:bigint,out_chars:bigint>>"
)


def _serial_extract_udf():
    """High-mode kernel as ONE vectorized pandas_udf over per-conversation
    turn arrays (same agg+udf physical shape as the fold — a grouped
    applyInPandas pays per-tiny-group pandas overhead; this pays it per
    Arrow batch of conversations).

    Fail-fast on the first kernel error, like the reference's sequential
    mode (autoscan/autoscan.py:250-255); the conv_id travels alongside so
    the error names the failing conversation/turn.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_SERIAL_RESULT_TYPE)
    def run_serial(conv_ids: pd.Series, turns: pd.Series) -> pd.Series:
        out = []
        for conv_id, ts in zip(conv_ids, turns):
            prev_output = None
            rows = []
            for t in ts:  # already sorted by turn_idx via array_sort
                text = t["text"]
                extracted, spans, status, kind = extract_turn(
                    text, t["role"], prev_output
                )
                if status != "ok":
                    raise RuntimeError(
                        f"extraction failed in high (sequential) mode for "
                        f"conv_id={conv_id} turn_idx={t['turn_idx']}: {status}"
                    )
                rows.append(
                    {
                        "turn_idx": t["turn_idx"],
                        "extracted_text": extracted,
                        "spans": [
                            {"start": s, "end": e, "kind": k} for s, e, k in spans
                        ],
                        "status": status,
                        "kind": kind,
                        "in_chars": len(text) if text is not None else 0,
                        "out_chars": len(extracted),
                    }
                )
                prev_output = extracted
            out.append(rows)
        return pd.Series(out)

    return run_serial


def extract_turns(
    df: DataFrame,
    mode: str = "low",
    first_turn: int | None = None,
    last_turn: int | None = None,
) -> DataFrame:
    """Run the extraction kernel over a transcripts DataFrame.

    ``first_turn``/``last_turn`` are the reference's page-range pushdown (S3,
    autoscan/image_processing.py:30-31): expressed as a Catalyst filter so it
    reaches the scan (PushedFilters on turn_idx) and out-of-range turns are
    never read, let alone extracted.
    """
    if mode not in {"low", "high"}:
        raise ValueError("mode must be one of 'low', 'high'")
    if first_turn is not None:
        df = df.filter(F.col("turn_idx") >= first_turn)
    if last_turn is not None:
        df = df.filter(F.col("turn_idx") <= last_turn)

    cols = df.select("conv_id", "turn_idx", "role", "text")
    if mode == "low":
        return cols.mapInArrow(_extract_batches, schema=EXTRACTED_SCHEMA)

    grouped = cols.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(F.struct("turn_idx", "role", "text"))).alias(
            "__turns"
        )
    )
    results = grouped.select(
        "conv_id",
        F.explode(_serial_extract_udf()(F.col("conv_id"), F.col("__turns"))).alias(
            "__r"
        ),
    )
    return results.select(
        "conv_id",
        F.col("__r.turn_idx").alias("turn_idx"),
        F.col("__r.extracted_text").alias("extracted_text"),
        F.col("__r.spans").alias("spans"),
        F.col("__r.status").alias("status"),
        F.col("__r.kind").alias("kind"),
        F.col("__r.in_chars").alias("in_chars"),
        F.col("__r.out_chars").alias("out_chars"),
        F.lit(EXTRACTOR_VERSION).alias("extractor_version"),
    )


def drop_failed(extracted: DataFrame) -> DataFrame:
    """Low-mode drop semantics: keep only successful turns (reference:
    autoscan/autoscan.py:283-289 drops failed pages before the join)."""
    return extracted.filter(F.col("status") == "ok")
