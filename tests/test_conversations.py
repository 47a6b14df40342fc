"""Conversation-level training-data ops: chat-template rendering and
SFT (context, response) pair extraction."""

import pandas as pd
import pytest

TURNS = [
    ("c1", 1, "user", "hello"),
    ("c1", 2, "assistant", "hi there"),
    ("c1", 3, "user", "how are you"),
    ("c1", 4, "assistant", "great"),
    ("c2", 1, "assistant", "unprompted opener"),
    ("c2", 2, "user", "ok"),
]


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(TURNS, columns=["conv_id", "turn_idx", "role", "text"])
    ).repartition(3)


def test_chatml_render_order_and_markers(spark):
    from autoscan_spark.operators.conversations import render_chat_template

    out = {
        r["conv_id"]: r
        for r in render_chat_template(_df(spark)).collect()
    }
    assert out["c1"]["n_turns"] == 4
    assert out["c1"]["training_text"] == (
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\nhi there<|im_end|>\n"
        "<|im_start|>user\nhow are you<|im_end|>\n"
        "<|im_start|>assistant\ngreat<|im_end|>\n"
    )
    assert out["c2"]["training_text"].startswith("<|im_start|>assistant\n")


def test_colon_template_and_invalid(spark):
    from autoscan_spark.operators.conversations import render_chat_template

    out = {
        r["conv_id"]: r["training_text"]
        for r in render_chat_template(_df(spark), template="colon").collect()
    }
    assert out["c1"] == (
        "user: hello\nassistant: hi there\n"
        "user: how are you\nassistant: great\n"
    )
    with pytest.raises(ValueError, match="template"):
        render_chat_template(_df(spark), template="alpaca")


def test_sft_pairs_contexts(spark):
    from autoscan_spark.operators.conversations import sft_pairs

    rows = {
        (r["conv_id"], r["turn_idx"]): (r["context"], r["response"])
        for r in sft_pairs(_df(spark)).collect()
    }
    assert set(rows) == {("c1", 2), ("c1", 4), ("c2", 1)}
    assert rows[("c1", 2)] == ("user: hello", "hi there")
    assert rows[("c1", 4)] == (
        "user: hello\nassistant: hi there\nuser: how are you",
        "great",
    )
    # assistant opener: empty (not NULL) context
    assert rows[("c2", 1)] == ("", "unprompted opener")


def test_conversation_ops_shuffle_budget(spark, sf_dir):
    """Plan pins: chat-template rendering is ONE shuffle (the conv groupBy,
    no sort — array_sort orders within the aggregate); SFT pairs are ONE
    shuffle + its window sort; span removal stays at three wide exchanges
    (window-hash tag, covered-distinct, anti-join/reassembly with AQE
    reuse). Regressions here mean an operator grew a corpus-wide shuffle."""
    from autoscan_spark.plans.driver_queries import (
        q_chat_template,
        q_remove_spans,
        q_sft_pairs,
    )

    def shape(q):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning"), plan.count("Sort [")

    assert shape(q_chat_template) == (1, 0)
    assert shape(q_sft_pairs) == (1, 1)
    ex, _ = shape(q_remove_spans)
    assert ex <= 3


def test_conversations_weird_column_names(spark):
    from autoscan_spark.operators.conversations import (
        render_chat_template,
        sft_pairs,
    )

    df = (
        _df(spark)
        .withColumnRenamed("conv_id", "conv id`x")
        .withColumnRenamed("text", "the'text")
    )
    out = render_chat_template(
        df, conv_col="conv id`x", text_col="the'text"
    ).collect()
    assert {r["n_turns"] for r in out} == {4, 2}
    pairs = sft_pairs(df, conv_col="conv id`x", text_col="the'text").collect()
    assert len(pairs) == 3
