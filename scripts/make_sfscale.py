"""Deterministically scale the driver's sf0.1 test tables to an sf1-shaped
corpus for per-operator scaling benchmarks.

The round driver provides parquet only up to sf0.1 (~600k lineitem rows /
5k documents); the per-query bench suite therefore only evidences operator
cost at 10⁵-row scale while the e2e scaling ladder runs 20M turns. This
script tiles every fact table K× (default 10) with per-entity key offsets
(so all TPC-H joins stay referentially intact) and — critically — a
per-replica deterministic word mutation on ``documents.text``:

- each non-zero replica independently rewrites ~half the words
  (``hash(word, pos, replica)`` parity → append ``~k``), so a replica is
  NOT a near-duplicate of its original (3-shingle Jaccard ≈ 0.07, below
  the 0.1 near-dup threshold) and two different replicas of the same doc
  are even further apart (~0.02);
- the mutation depends only on (word, position, replica), so two docs
  that are near-duplicates of EACH OTHER in the base corpus mutate
  identically within a replica and remain near-duplicates there.

Net effect: duplicate structure (and therefore minhash/simhash/line-dedup
work) scales LINEARLY with K instead of quadratically, which is what a
real 10× corpus looks like. Naively tiling text would give every doc 9
exact copies and benchmark a pathological corpus no pipeline sees.

Dimension tables (nation/region) are copied unscaled. Events keep their
timestamps (10× event density per time window — the realistic read).
Embedding vectors are reused with shifted ids (top-k scan cost is linear
in rows; vector values don't change the plan).

Usage::

    python scripts/make_sfscale.py [--k 10] [--src /root/testdata/sf0.1] \
        [--out $SPARK_GRAFT_BENCH_TMP/sfscale]

then ``SPARK_GRAFT_SF_DIR=<out> python bench.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

# table → columns needing a per-entity offset (entity name → the base table
# whose max key defines the offset unit, so foreign keys stay aligned)
_KEY_ENTITIES = {
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "events": {"event_id": "event", "user_id": "user"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
}
_ENTITY_MAX_SRC = {
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "order": ("orders", "o_orderkey"),
    "cust": ("customer", "c_custkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
}
_DIMS = ("nation", "region")

# ~half the words per non-zero replica get a replica-suffixed rewrite;
# parity of a 3-ary hash keeps it deterministic and position-aligned
_MUTATE = (
    "concat_ws(' ', transform(split(text, ' '), (w, i) -> "
    "CASE WHEN __r = 0 THEN w "
    "WHEN pmod(hash(w, i, __r), 2) = 0 THEN concat(w, '~', __r) "
    "ELSE w END))"
)


def _tile(df: DataFrame, k: int, offsets: dict[str, int]) -> DataFrame:
    out = df.withColumn("__r", F.explode(F.expr(f"sequence(0, {k - 1})")))
    for col, unit in offsets.items():
        out = out.withColumn(col, F.col(col) + F.col("__r") * F.lit(unit))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/autoscan_bench"),
            "sfscale",
        ),
    )
    args = ap.parse_args()

    from autoscan_spark.session import get_spark

    spark = get_spark(app_name="make-sfscale")

    units: dict[str, int] = {}
    for entity, (table, col) in _ENTITY_MAX_SRC.items():
        path = os.path.join(args.src, f"{table}.parquet")
        max_key = spark.read.parquet(path).agg(F.max(col)).collect()[0][0]
        if max_key is None:
            sys.exit(f"source table {table} is empty — no {col} to offset by")
        units[entity] = max_key + 1

    os.makedirs(args.out, exist_ok=True)
    for table, keys in _KEY_ENTITIES.items():
        df = spark.read.parquet(os.path.join(args.src, f"{table}.parquet"))
        tiled = _tile(df, args.k, {c: units[e] for c, e in keys.items()})
        if table == "documents":
            tiled = tiled.withColumn("text", F.expr(_MUTATE)).withColumn(
                "n_chars", F.length("text")
            )
        tiled = tiled.drop("__r")
        dest = os.path.join(args.out, f"{table}.parquet")
        # the driver's tables are single parquet FILES; mirror that layout
        # but keep multiple row groups via coalesce for split parallelism
        tmp = dest + ".dir"
        tiled.coalesce(4).write.mode("overwrite").parquet(tmp)
        import pyarrow.parquet as pq

        pq.write_table(
            pq.ParquetDataset(tmp).read(), dest, row_group_size=1 << 20
        )
        import shutil

        shutil.rmtree(tmp)
        n = spark.read.parquet(dest).count()
        print(f"{table}: {n:,} rows -> {dest}", flush=True)
    for table in _DIMS:
        import shutil

        shutil.copyfile(
            os.path.join(args.src, f"{table}.parquet"),
            os.path.join(args.out, f"{table}.parquet"),
        )
        print(f"{table}: copied (dimension)", flush=True)


if __name__ == "__main__":
    main()
