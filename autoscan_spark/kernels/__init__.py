"""Pure extraction kernels.

Every function in this package is a deterministic pure function on plain
Python values (or pandas Series of them) with NO Spark imports, so the exact
per-turn semantics can be unit-tested in-process and then wrapped in
mapInArrow / applyInPandas by ``autoscan_spark.operators``.
"""

from autoscan_spark.kernels.fences import strip_code_fences
from autoscan_spark.kernels.pagejoin import clean_page, join_pages

__all__ = ["strip_code_fences", "clean_page", "join_pages"]
