"""Model-based document quality filtering (public Spark MLlib).

The public web-pipeline recipe (CCNet's fastText LM filter, FineWeb-Edu's
classifier): heuristic gates label a seed set, a cheap linear classifier
is trained to generalize them, and the MODEL scores the full corpus —
catching documents the hand rules miss while staying distributable.

Spark-first shape: the whole scorer is a ``pyspark.ml`` Pipeline
(RegexTokenizer → HashingTF → LogisticRegression), so training is
MLlib's distributed L-BFGS over the corpus and scoring is a pure
executor-side transform — no Python in the scoring hot path, no driver
loops. The hashing trick keeps the feature space fixed-width (no vocab
broadcast), which is what makes the scorer shippable to a 1000-executor
cluster unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from autoscan_spark.operators.sqlutil import qcol

_N_FEATURES = 1 << 15


def _pipeline(text_col: str):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol="__toks",
                pattern=r"\W+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="__toks", outputCol="__tf", numFeatures=_N_FEATURES
            ),
            LogisticRegression(
                featuresCol="__tf",
                labelCol="__label",
                maxIter=25,
                regParam=0.01,
                standardization=False,
            ),
        ]
    )


def train_quality_classifier(
    labeled: DataFrame, text_col: str = "text", label_col: str = "label"
):
    """Fit the quality scorer on a labeled frame (label 1 = keep).

    Returns a fitted ``PipelineModel``; persist with ``model.save(path)``
    / reload with ``PipelineModel.load`` (MLlib's own distributed
    serialization — the model ships to any cluster size).
    """
    train = labeled.withColumn(
        "__label", qcol(label_col).cast("double")
    )
    return _pipeline(text_col).fit(train)


# Columns the pipeline materializes during transform (intermediates plus
# LogisticRegression's fixed output columns) AND the two columns
# score_quality itself appends. An input frame already carrying any of
# these would fail the transform, collide with the probability column we
# read, or produce a duplicate output column — reject up front.
_RESERVED_COLS = frozenset(
    {
        "__toks",
        "__tf",
        "__label",
        "rawPrediction",
        "probability",
        "prediction",
        "quality_prob",
        "quality_keep",
    }
)


def score_quality(model, df: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Score a corpus: adds ``quality_prob`` (P(keep)) and ``quality_keep``.
    Pure transform — distributed, no collect.

    Raises ``ValueError`` if ``df`` already carries a pipeline-reserved
    column (``__toks``/``__tf``/``rawPrediction``/``probability``/…): the
    transform would otherwise fail or score from the wrong column.
    """
    from pyspark.ml.functions import vector_to_array

    clash = sorted(_RESERVED_COLS.intersection(df.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with quality-pipeline columns; "
            "rename or drop them before score_quality()"
        )
    scored = model.transform(df)
    return scored.select(
        *df.columns,
        vector_to_array(F.col("probability"))[1].alias("quality_prob"),
    ).withColumn("quality_keep", F.col("quality_prob") >= threshold)


def distill_heuristic_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end distillation (the CCNet/fastText pattern with the
    repo's own gates as weak supervision): label the corpus with the
    rule-based ``gopher_ok`` gate, train the linear scorer on those
    labels, then score every document with the MODEL.

    Output: (id_col, ``gate_label``, ``quality_prob``, ``quality_keep``).
    Two passes over the corpus (label+fit, then transform); the model
    itself is a fixed-width coefficient vector — no per-vocab state.
    """
    from autoscan_spark.operators.textstats import gopher_quality

    labeled = gopher_quality(df, text_col=text_col).select(
        qcol(id_col),
        qcol(text_col),
        F.col("gopher_ok").cast("int").alias("gate_label"),
    )
    model = train_quality_classifier(
        labeled, text_col=text_col, label_col="gate_label"
    )
    return score_quality(model, labeled, threshold).select(
        qcol(id_col), "gate_label", "quality_prob", "quality_keep"
    )
