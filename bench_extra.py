"""Extra benchmark harness (NOT the driver contract — bench.py is frozen).

Per guide §1.4: times individual declared queries through the noop sink so
the computation is isolated from the sink, with per-query job descriptions
(guide §1.5). Used for the r07 optimization round's before/after evidence;
numbers are cited in OPTIMIZATION_r07.md.

Usage: python bench_extra.py [-r REPEATS] [query ...]
  default queries = the round's optimization targets; -r default 3.
Prints one JSON line {"queries": {name: best_sec}, "spread": {...}, "sf": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DEFAULT_TARGETS = [
    "embedding_near_dup",
    "fuzzy_dedup",
    "knn_label_noise",
    "near_dup_survivors",
    "dedup_clusters",
    "best_of_cluster",
    "cluster_split",
    "minhash_pairs",
    "ngram_commonness",
    "semantic_dedup",
    "bloom_decontaminate",
    "cms_heavy_hitters",
    "hll_ngrams",
    "winnow_pairs",
    "simhash_pairs",
    "token_budget",
    "polish_markdown",
    "corpus_prep",
    "tfidf_terms",
    "market_share",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-r", "--repeats", type=int, default=3)
    ap.add_argument("--sink", choices=["noop", "count"], default="noop")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from autoscan_spark.plans.driver_queries import QUERIES
    from autoscan_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="autoscan-spark-bench-extra")
    targets = args.queries or DEFAULT_TARGETS

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in targets:
        walls = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} [rep {i}]")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(min(walls), 3)
        spreads[name] = round(max(walls) - min(walls), 3)
        print(f"# {name}: {timings[name]} (spread {spreads[name]})", file=sys.stderr)

    print(
        json.dumps(
            {
                "queries": timings,
                "spread": spreads,
                "sf": sf_dir,
                "sink": args.sink,
                "repeats": args.repeats,
                "master": spark.sparkContext.master,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
