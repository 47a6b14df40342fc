"""Conversation-level training-data operators over transcript turns.

The engine's payload IS multi-turn conversation transcripts
(conv_id, turn_idx, role, text, ...); these operators turn cleaned
transcripts into the artifacts an LLM training pipeline actually consumes:

- ``render_chat_template``: one training document per conversation, turns
  concatenated in order under a chat template (ChatML-style markers or a
  plain ``role: text`` format). The format-string shapes are public
  conventions (ChatML markers appear throughout open-source chat
  fine-tuning stacks).
- ``sft_pairs``: one (context, response) example per assistant turn —
  the supervised-fine-tuning view where the model learns to produce each
  assistant message given everything before it.

Both are pure JVM expressions (collect_list + array ops / window
aggregates) — no Python in the hot path — and both shuffle exactly once
on the conversation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from autoscan_spark.operators.sqlutil import qcol

TEMPLATES = ("chatml", "colon")


def render_chat_template(
    df: DataFrame,
    template: str = "chatml",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Fold a conversation's turns, in ``turn_idx`` order, into ONE
    training text under a chat template.

    Templates:
    - ``chatml``: ``<|im_start|>{role}\\n{text}<|im_end|>\\n`` per turn.
    - ``colon``: ``{role}: {text}\\n`` per turn.

    Output: (conv_col, ``n_turns``, ``training_text``). One shuffle
    (groupBy conv); per-conversation ordering via ``array_sort`` over
    ``(turn_idx, role, text)`` structs — the same JVM fold shape
    ``fold_documents`` uses, so turn order is total and deterministic.
    """
    if template not in TEMPLATES:
        raise ValueError(f"template must be one of {TEMPLATES}, got {template!r}")
    if template == "chatml":
        render = lambda s: F.concat(  # noqa: E731
            F.lit("<|im_start|>"), s["__role"], F.lit("\n"),
            s["__text"], F.lit("<|im_end|>\n"),
        )
    else:
        render = lambda s: F.concat(  # noqa: E731
            s["__role"], F.lit(": "), s["__text"], F.lit("\n")
        )
    return (
        df.select(
            qcol(conv_col),
            F.struct(
                qcol(turn_col).alias("__ti"),
                qcol(role_col).alias("__role"),
                qcol(text_col).alias("__text"),
            ).alias("__t"),
        )
        .groupBy(qcol(conv_col))
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("__t")), render), ""
            ).alias("training_text"),
        )
    )


def sft_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """One supervised-fine-tuning example per assistant turn:
    ``context`` = all PRIOR turns rendered ``role: text`` joined by
    newlines, ``response`` = the assistant turn's text.

    Output: (conv_col, turn_col, ``context``, ``response``). Shape: ONE
    shuffle — a window ``collect_list`` over
    ``(partition by conv order by turn_idx rows unbounded preceding to 1
    preceding)``; the frame ordering makes the context deterministic. An
    assistant turn with no prior turns gets an empty context (coalesced,
    not NULL).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(qcol(conv_col))
        .orderBy(qcol(turn_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    line = F.concat(qcol(role_col), F.lit(": "), qcol(text_col))
    return (
        df.withColumn(
            "context",
            F.coalesce(
                F.array_join(F.collect_list(line).over(w), "\n"), F.lit("")
            ),
        )
        .filter(qcol(role_col) == assistant_role)
        .select(
            qcol(conv_col),
            qcol(turn_col),
            "context",
            qcol(text_col).alias("response"),
        )
    )
