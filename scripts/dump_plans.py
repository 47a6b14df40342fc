"""Dump .explain("formatted") for declared queries to plans/r07/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> [query ...]
  tag      -> suffix (before/after)
  queries  -> subset; default = all declared queries

Plans are captured WITHOUT executing the queries (lazy explain), except
queries whose constructors run driver-side work (MLlib fit etc.) — those
still only pay constructor cost.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from autoscan_spark.plans.driver_queries import QUERIES
    from autoscan_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO_ROOT, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    targets = names or sorted(QUERIES)
    for name in targets:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("EXPLAIN FAILED") else "FAIL")
    spark.stop()


if __name__ == "__main__":
    main()
