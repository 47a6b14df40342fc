"""Custom stateful streaming operator: incremental per-conversation fold.

Batch's ordered fold (operators.fold) needs the whole conversation; in a
stream, turns arrive incrementally and out of order. This operator keeps the
conversation's turns as keyed state (``applyInPandasWithState``) and, on each
trigger that delivers new turns for a conversation, re-emits the current
folded markdown — update semantics: downstream sinks see the latest fold per
conversation, converging to the batch result once all turns have arrived
(tested: restart-with-checkpoint equals the batch fold).

State schema: the accumulated (turn_idx, extracted_text) pairs. For a
10^12-turn table the state store is RocksDB
(``spark.sql.streaming.stateStore.providerClass``) and idle conversations
are expired with ``GroupStateTimeout.ProcessingTimeTimeout`` +
``state.setTimeoutDuration(...)`` in a continuously-running query. This
module defaults to ``NoTimeout`` because its test/deployment mode here is
``Trigger.AvailableNow`` (incremental batch), where a registered processing
-time timeout keeps the query alive waiting for the timer to fire — pass
``expire_idle=True`` for the continuous-deployment behavior.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from autoscan_spark.kernels.pagejoin import join_pages

STREAM_DOC_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("markdown", StringType()),
        StructField("n_turns", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType())),
        StructField("texts", ArrayType(StringType())),
    ]
)


def _make_fold_with_state(expire_idle: bool):
    def fold_with_state(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return

        idxs, texts = state.get if state.exists else ([], [])
        idxs = list(idxs)
        texts = list(texts)
        for pdf in pdfs:
            idxs.extend(int(i) for i in pdf["turn_idx"])
            texts.extend(pdf["extracted_text"])

        state.update((idxs, texts))
        if expire_idle:
            state.setTimeoutDuration(60 * 60 * 1000)  # drop idle convs after 1h

        order = sorted(range(len(idxs)), key=lambda i: idxs[i])
        markdown = join_pages([texts[i] for i in order])
        yield pd.DataFrame(
            {"conv_id": [conv_id], "markdown": [markdown], "n_turns": [len(idxs)]}
        )

    return fold_with_state


def stream_fold_documents(
    extracted_stream: DataFrame, expire_idle: bool = False
) -> DataFrame:
    """Stateful incremental fold over a streaming extracted-turns DataFrame
    (output of streaming.stream.stream_extract).

    ``expire_idle=True`` enables the 1h idle-conversation state expiry for
    continuously-running deployments (do NOT combine with
    ``Trigger.AvailableNow`` — the pending timer keeps the query alive).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_idle
        else GroupStateTimeout.NoTimeout
    )
    return (
        extracted_stream.select("conv_id", "turn_idx", "extracted_text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_fold_with_state(expire_idle),
            outputStructType=STREAM_DOC_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
