"""Local mirror of the round driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the equivalent SQL on DuckDB over the same parquet tables,
then compares row count, schema (column names sorted), and exact values
(columns sorted by name, rows sorted) — the same comparison the driver
records in CORRECTNESS_r{N}.json.

Usage::

    python scripts/oracle_gate.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(rows, cols):
    """Rows as sorted tuples with columns sorted by name (driver compare)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    import decimal

    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        if isinstance(v, decimal.Decimal):
            # value-level compare stays type-blind (the skew check is the
            # type gate); HUGEINT arrives as Decimal via Arrow
            return int(v) if v == v.to_integral_value() else round(float(v), 9)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if isinstance(v, dict):
            return tuple((k, norm(x)) for k, x in v.items())
        return v

    # sort reprs, not tuples: None is not orderable against values
    return sorted(repr(tuple(norm(r[i]) for i in order)) for r in rows)


def _arrow_class(t) -> str:
    """Canonical hash-class of an Arrow type for driver-compare purposes.

    The round driver's value hash is type-sensitive: DuckDB HUGEINT (int128)
    vs Spark BIGINT diverged in CORRECTNESS_r03 (`pricing_summary`) even with
    identical values. We therefore compare result *types*, collapsing only
    pairs the driver demonstrably treats as equal (driver-green queries):
    string/large_string, timestamp unit variants, list/large_list.
    DECIMAL and int128 stay distinct from int64/float64 — that's the class
    that bites.
    """
    import pyarrow as pa
    import pyarrow.types as pt

    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_list(t) or pt.is_large_list(t):
        return f"list<{_arrow_class(t.value_type)}>"
    if pt.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{_arrow_class(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pt.is_integer(t):
        # int8..int64 all hash alike through Python ints; int128 does NOT
        # exist in Arrow (DuckDB surfaces HUGEINT as decimal128) so any
        # integer Arrow type is the same class.
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)


def _type_skew(spark_schema, oracle_schema):
    """Return list of (col, spark_class, oracle_class) mismatches, or []."""
    s = {f.name: _arrow_class(f.type) for f in spark_schema}
    o = {f.name: _arrow_class(f.type) for f in oracle_schema}
    return [
        (c, s.get(c, "<absent>"), o.get(c, "<absent>"))
        for c in sorted(set(s) | set(o))
        if s.get(c) != o.get(c)
    ]


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from autoscan_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # ONE materialization: rows, schema, and the type-skew check all
            # derive from the same Arrow table (a second .collect() would
            # re-execute the query and, for anything nondeterministic,
            # compare rows from a different run than the checked schema).
            spark_tbl = df.toArrow()
            spark_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
            spark_cols = list(spark_tbl.column_names)
        except Exception as exc:  # noqa: BLE001 - report, don't abort the gate
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            oracle_tbl = con.execute(oracles[name]).arrow()
            oracle_cols = list(oracle_tbl.column_names)
            oracle_rows = [tuple(r.values()) for r in oracle_tbl.to_pylist()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        ok_rows = len(spark_rows) == len(oracle_rows)
        ok_schema = sorted(spark_cols) == sorted(oracle_cols)
        ok_vals = ok_rows and ok_schema and (
            _canon(spark_rows, spark_cols) == _canon(oracle_rows, oracle_cols)
        )
        skew = _type_skew(spark_tbl.schema, oracle_tbl.schema) if ok_schema else []
        if ok_vals and skew:
            print(f"FAIL  {name}: values equal but TYPE SKEW (driver hash "
                  f"will diverge): {skew}")
            n_fail += 1
        elif ok_vals:
            print(f"pass  {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: rows {len(spark_rows)} vs {len(oracle_rows)}, "
                  f"schema {sorted(spark_cols)} vs {sorted(oracle_cols)}, "
                  f"values_match={ok_vals}")
            n_fail += 1
    print(f"\ngate: {n_pass} pass / {n_rows_only} rows-only / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
