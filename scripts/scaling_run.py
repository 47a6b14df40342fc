"""Single scaling-run worker: run the end-to-end extraction pipeline
(extract low + ordered fold) over a pre-materialized transcript corpus at a
given core count; print one JSON line {"cpus", "wall_s", "n_turns", "n_docs"}.

Invoked by scripts/scaling.py in a fresh process per core count so each run
gets its own JVM (no executor reuse between the two cluster sizes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=1,
                    help="repeat the timed job and report the best run — the "
                         "sandbox VM has noisy neighbors, and interference "
                         "only ever subtracts throughput")
    args = ap.parse_args()

    from autoscan_spark.operators.extract import drop_failed, extract_turns
    from autoscan_spark.operators.fold import fold_documents
    from autoscan_spark.session import get_spark

    shuffle = args.shuffle_partitions or max(2 * args.cpus, 16)
    spark = get_spark(
        app_name=f"autoscan-scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=shuffle,
    )
    transcripts = spark.read.parquet(args.input)

    # warm the JVM + python workers on a small slice so fixed startup cost
    # doesn't contaminate the throughput measurement
    warm = transcripts.limit(2000)
    fold_documents(drop_failed(extract_turns(warm, mode="low"))).count()

    walls = []
    n_docs = 0
    for _ in range(max(args.repeats, 1)):
        t0 = time.perf_counter()
        extracted = drop_failed(extract_turns(transcripts, mode="low"))
        n_docs = fold_documents(extracted).count()
        walls.append(time.perf_counter() - t0)

    wall = min(walls)
    n_turns = transcripts.count()
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "wall_s": round(wall, 2),
                "all_walls_s": [round(w, 2) for w in walls],
                "n_turns": n_turns,
                "n_docs": n_docs,
                "turns_per_sec": round(n_turns / wall, 1),
                "shuffle_partitions": shuffle,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
