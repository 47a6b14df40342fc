"""The local gate's type check must catch DuckDB/Spark result-type skew.

CORRECTNESS_r03 showed the driver's value hash is type-sensitive: DuckDB
``sum(BIGINT)`` returns HUGEINT (surfaced as decimal128 via Arrow) and the
driver hash diverged from Spark's ``bigint`` even though every value was
equal. These tests pin that the gate detects exactly that class pre-fix and
accepts the CAST-fixed form, so the next typing skew fails locally before a
driver round burns on it.
"""

import os
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from oracle_gate import _arrow_class, _type_skew  # noqa: E402


def test_hugeint_vs_bigint_is_skew():
    con = duckdb.connect()
    # uncast sum over BIGINT → HUGEINT, the pricing_summary pre-fix shape
    tbl = con.execute("SELECT sum(i) AS s FROM range(10) t(i)").arrow()
    spark_side = pa.schema([pa.field("s", pa.int64())])
    skew = _type_skew(spark_side, tbl.schema)
    assert skew and skew[0][0] == "s"
    assert skew[0][1] == "int" and skew[0][2].startswith("decimal")


def test_cast_bigint_fixes_skew():
    con = duckdb.connect()
    tbl = con.execute(
        "SELECT CAST(sum(i) AS BIGINT) AS s FROM range(10) t(i)"
    ).arrow()
    spark_side = pa.schema([pa.field("s", pa.int64())])
    assert _type_skew(spark_side, tbl.schema) == []


def test_integer_widths_collapse_but_float_does_not():
    # int32 vs int64 hash alike through Python ints — same class
    assert _arrow_class(pa.int32()) == _arrow_class(pa.int64())
    # float vs int do NOT (1.0 vs 1 repr-diverge in the driver canon)
    assert _arrow_class(pa.float64()) != _arrow_class(pa.int64())
    # string width variants collapse
    assert _arrow_class(pa.large_string()) == _arrow_class(pa.string())
    # nested lists carry the element class
    assert _arrow_class(pa.list_(pa.int32())) == _arrow_class(
        pa.large_list(pa.int64())
    )


def test_missing_column_reported():
    a = pa.schema([pa.field("x", pa.int64())])
    b = pa.schema([pa.field("y", pa.int64())])
    skew = _type_skew(a, b)
    assert ("x", "int", "<absent>") in skew and ("y", "<absent>", "int") in skew
