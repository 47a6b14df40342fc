"""Model-based quality filtering (MLlib pipeline): separable corpora
train to high held-out accuracy; the distillation path reproduces the
heuristic gate it was trained on."""

import numpy as np
import pandas as pd


def _corpus(n=300, seed=3):
    rng = np.random.RandomState(seed)
    clean_vocab = "the quick brown fox jumps over lazy dog sentence reads well".split()
    spam_vocab = "BUY NOW click here FREE $$$ winner viagra casino jackpot".split()
    rows = []
    for i in range(n):
        label = i % 2
        vocab = clean_vocab if label else spam_vocab
        rows.append(
            (i, " ".join(rng.choice(vocab, rng.randint(8, 20))), label)
        )
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def test_train_and_score_separable(spark):
    from autoscan_spark.operators.classify import (
        score_quality,
        train_quality_classifier,
    )

    pdf = _corpus()
    train = spark.createDataFrame(pdf.iloc[:200]).repartition(4)
    test = spark.createDataFrame(pdf.iloc[200:]).repartition(4)
    model = train_quality_classifier(train)
    scored = score_quality(model, test).collect()
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in scored)
    acc = np.mean(
        [int(r["quality_keep"]) == r["label"] for r in scored]
    )
    assert acc >= 0.95
    # output keeps the input columns
    assert {"doc_id", "text", "label"} <= set(scored[0].asDict())


def test_distill_heuristic_gate(spark, sf_dir):
    """Distilling the gopher gate: the learned scorer must agree with its
    own training labels on the overwhelming majority of the corpus (it is
    a smooth generalization of the rule, not a copy)."""
    from autoscan_spark.operators.classify import distill_heuristic_gate
    from autoscan_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = distill_heuristic_gate(docs).collect()
    assert len(out) == docs.count()
    agree = np.mean([int(r["quality_keep"]) == r["gate_label"] for r in out])
    assert agree >= 0.8


def test_score_rejects_reserved_columns(spark):
    """An input frame already carrying a pipeline column (intermediate or
    LogisticRegression output) must be rejected up front, not silently
    collided with (ADVICE r4)."""
    import pytest

    from autoscan_spark.operators.classify import (
        score_quality,
        train_quality_classifier,
    )

    pdf = _corpus()
    train = spark.createDataFrame(pdf.iloc[:200]).repartition(4)
    model = train_quality_classifier(train)
    import pyspark.sql.functions as F

    for bad in ("__toks", "probability", "prediction"):
        poisoned = spark.createDataFrame(pdf.iloc[200:220]).withColumn(
            bad, F.lit("x")
        )
        with pytest.raises(ValueError, match=bad):
            score_quality(model, poisoned)
