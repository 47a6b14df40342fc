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

    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    # sort reprs, not tuples: None is not orderable against values
    return sorted(repr(tuple(norm(r[i]) for i in order)) for r in rows)


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
            spark_rows = df.collect()
            spark_cols = df.columns
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
            res = con.execute(oracles[name])
            oracle_cols = [d[0] for d in res.description]
            oracle_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        ok_rows = len(spark_rows) == len(oracle_rows)
        ok_schema = sorted(spark_cols) == sorted(oracle_cols)
        ok_vals = ok_rows and ok_schema and (
            _canon(spark_rows, spark_cols) == _canon(oracle_rows, oracle_cols)
        )
        if ok_vals:
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
