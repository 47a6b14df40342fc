from autoscan_spark.operators.extract import (
    EXTRACTED_SCHEMA,
    drop_failed,
    extract_turns,
)
from autoscan_spark.operators.fold import DOC_SCHEMA, fold_documents
from autoscan_spark.operators.metrics import conversation_metrics

__all__ = [
    "EXTRACTED_SCHEMA",
    "extract_turns",
    "drop_failed",
    "DOC_SCHEMA",
    "fold_documents",
    "conversation_metrics",
]
