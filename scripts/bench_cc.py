"""Benchmark: connected-components variants on a large synthetic pair set.

Compares min-label propagation (operators.dedup.connected_components,
O(diameter) rounds of two shuffle joins) against alternating large-star/
small-star contraction (connected_components_star, O(log n) rounds of two
window passes) on a duplicate-graph shaped like real near-dup output:
mostly small clusters, a heavy tail of mid-size clusters, plus one long
chain and one celebrity hub — the two adversarial shapes.

Usage: python scripts/bench_cc.py [n_edges] [chain_len]
Prints one JSON line per variant. Results recorded in BENCH/BASELINE.md.
"""

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def synth_edges(spark, n_edges: int, chain_len: int):
    """Deterministic duplicate graph: 80% of edges in random 2-50-node
    clusters, one chain of chain_len, one hub with 5% of edges."""
    from pyspark.sql import functions as F

    base = 10_000_000
    clusters = (
        spark.range(int(n_edges * 0.75))
        .select(
            # cluster id ~ edge_id / 12 → ~12 edges per cluster over ~25 nodes
            (F.floor(F.col("id") / 12)).alias("c"),
            F.col("id").alias("i"),
        )
        .select(
            (F.col("c") * 50 + F.pmod(F.xxhash64("i"), 50)).alias("id_a"),
            (F.col("c") * 50 + F.pmod(F.xxhash64("i", F.lit(1)), 50)).alias("id_b"),
        )
    )
    chain = spark.range(chain_len).select(
        (F.col("id") + base).alias("id_a"), (F.col("id") + base + 1).alias("id_b")
    )
    hub = spark.range(int(n_edges * 0.05)).select(
        F.lit(2 * base).alias("id_a"), (F.col("id") + 2 * base + 1).alias("id_b")
    )
    return (
        clusters.union(chain).union(hub)
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from autoscan_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )
    from autoscan_spark.session import get_spark

    spark = get_spark(app_name="bench-cc")
    edges = synth_edges(spark, n_edges, chain_len).cache()
    n = edges.count()

    # ground truth: driver-side union-find (bench-scale only — the whole
    # point of the distributed variants is that production can't do this)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edges.collect():
        ra, rb = find(r["id_a"]), find(r["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {node: find(node) for node in list(parent)}
    truth = {node: min(truth[node], node) for node in truth}  # root = min id
    # normalize: label every node with its root's min id
    roots: dict = {}
    for node in truth:
        roots.setdefault(find(node), set()).add(node)
    truth = {node: min(members) for members in roots.values() for node in members}
    n_true = len(roots)

    import functools

    for name, fn, iters in [
        ("star", connected_components_star, 50),
        # min_label would raise on the deep chain (by design); the bench
        # explicitly opts into the partial result to measure/report it
        ("min_label", functools.partial(connected_components, on_exhausted="warn"), 60),
    ]:
        t0 = time.perf_counter()
        got = {r["id"]: r["component"] for r in fn(edges, max_iterations=iters).collect()}
        wall = time.perf_counter() - t0
        n_comps = len(set(got.values()))
        print(json.dumps({
            "variant": name, "n_edges": n, "chain_len": chain_len,
            "sec": round(wall, 2), "n_components": n_comps,
            "n_components_true": n_true,
            "exact_match_vs_union_find": got == truth,
        }))


if __name__ == "__main__":
    main()
