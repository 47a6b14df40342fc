"""Quoting helpers for SQL fragments built with ``F.expr``.

Spark column names may contain spaces, dots, quotes — even backticks.
Interpolating them raw into an ``F.expr`` string breaks (or injects into)
the expression; same for string literals (a stratum value containing a
quote). Every operator that builds SQL text routes names through
``qident`` and literals through ``qlit`` (the pattern ``profile_table``
established). ``F.col``/``select``/``groupBy`` call sites keep the plain
name — the DataFrame API resolves those without the SQL parser.
"""

from __future__ import annotations


def qident(name: str) -> str:
    """Backtick-quote a column name for use inside an ``F.expr`` string.
    Inner backticks double, per Spark's identifier grammar."""
    return "`" + name.replace("`", "``") + "`"


def qlit(value: str) -> str:
    """Escape a Python string into a single-quoted Spark SQL literal."""
    return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"


def qcol(name: str):
    """Resolve a user-supplied column name to a Column without the SQL
    parser mangling dots/backticks (``F.col(raw)`` parses the name)."""
    from pyspark.sql import functions as F

    return F.col(qident(name))
