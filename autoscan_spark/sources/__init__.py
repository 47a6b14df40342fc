from autoscan_spark.sources.tables import load_table, register_views
from autoscan_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    synthesize_transcripts,
    transcripts_from_documents,
)

__all__ = [
    "load_table",
    "register_views",
    "TRANSCRIPT_SCHEMA",
    "synthesize_transcripts",
    "transcripts_from_documents",
]
