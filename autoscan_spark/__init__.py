"""autoscan_spark — a from-scratch PySpark-native main-content extraction engine.

Re-expresses the capabilities of the reference pipeline (umermansoor/autoscan,
a PDF→markdown document extraction tool) as a distributed, columnar,
Arrow-vectorized Spark pipeline over tables of multi-turn conversation /
agent transcripts:

- each *turn* plays the role of a *page* (reference: autoscan/autoscan.py:262-266)
- each *conversation* plays the role of a *document* (reference: pdf_path,
  autoscan/autoscan.py:20)
- the per-page LLM-OCR kernel is replaced by deterministic, vectorized
  extraction kernels (HTML boilerplate strip, PDF-stream layout reassembly,
  tool-markup isolation), while the reference's deterministic envelope
  semantics (fence stripping, ordered page joining, empty-page filtering,
  page-range selection, error-skip behavior, metrics aggregation) are matched
  byte-for-byte.

Layout:
  kernels/    pure-Python / pandas kernels (no Spark imports) — unit-testable
  operators/  DataFrame-level operators (extract, fold, dedup, similarity, ...)
  sources/    table loaders + deterministic transcript synthesis
  plans/      end-to-end pipelines, checkpointing, lineage
  streaming/  Structured Streaming variant of the extraction stage
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = "ex-v1"
