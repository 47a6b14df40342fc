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


def reject_reserved(df, names, where: str):
    """Fail fast when an input frame already carries a column an operator
    uses internally (hoists like ``__whw``): silently overwriting it
    yields an ambiguous-column analysis error at best and wrong results
    at worst. Same contract as ``classify.score_quality``'s
    ``_RESERVED_COLS`` check. Returns ``df`` so call sites can chain."""
    clash = sorted(set(names).intersection(df.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with internal columns of "
            f"{where}; rename or drop them first"
        )
    return df


def qcol(name: str):
    """Resolve a user-supplied column name to a Column without the SQL
    parser mangling dots/backticks (``F.col(raw)`` parses the name)."""
    from pyspark.sql import functions as F

    return F.col(qident(name))
