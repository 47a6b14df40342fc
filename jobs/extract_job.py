"""spark-submit entrypoint for the extraction pipeline (reference U2/U3:
the autoscan() orchestrator + CLI, autoscan/autoscan.py:19-213 +
autoscan/cli.py:53-151, as a cluster job).

Usage (local sandbox):
    python jobs/extract_job.py --input /tmp/transcripts --output /tmp/out \
        --mode low --buckets 64 --waves 4

Usage (cluster):
    spark-submit --py-files autoscan_spark.zip jobs/extract_job.py \
        --input cat.db.transcripts --output s3://bucket/extracted ...

The job is resumable: re-running with the same --output continues from the
last committed bucket (plans.checkpoint). ``--no-checkpoint`` runs the plain
one-shot pipeline instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def parse_args(argv=None) -> argparse.Namespace:
    ap = argparse.ArgumentParser(description="autoscan_spark extraction job")
    ap.add_argument("--input", required=True, help="transcripts parquet dir or table")
    ap.add_argument("--output", required=True, help="output root directory")
    ap.add_argument("--mode", choices=["low", "high"], default="low",
                    help="low = parallel+drop-failed; high = serial per conversation with lag-1 context, fail-fast (reference accuracy modes)")
    ap.add_argument("--first-turn", type=int, default=None)
    ap.add_argument("--last-turn", type=int, default=None)
    ap.add_argument("--polish", action="store_true", help="whole-document consolidation pass")
    ap.add_argument("--two-phase-fold", nargs="?", const="on", default="off",
                    choices=["on", "off", "auto"],
                    help="chunked fold for heavily skewed conversation lengths; "
                         "'auto' samples per-conversation turn counts and decides "
                         "(bare flag = on)")
    ap.add_argument("--buckets", type=int, default=64, help="checkpoint commit granularity")
    ap.add_argument("--waves", type=int, default=1, help="commits per run (resume granularity)")
    ap.add_argument("--no-checkpoint", action="store_true")
    ap.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    return ap.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    from autoscan_spark.plans.checkpoint import CheckpointedExtraction
    from autoscan_spark.plans.pipeline import extract_pipeline
    from autoscan_spark.session import get_spark

    spark = get_spark(app_name="autoscan-spark-extract", master=args.master)
    transcripts = spark.read.parquet(args.input)
    if args.first_turn is not None:
        transcripts = transcripts.filter(transcripts.turn_idx >= args.first_turn)
    if args.last_turn is not None:
        transcripts = transcripts.filter(transcripts.turn_idx <= args.last_turn)

    fold_strategy = {"on": True, "off": False, "auto": "auto"}[args.two_phase_fold]
    t0 = time.perf_counter()
    if args.no_checkpoint:
        extracted, docs = extract_pipeline(
            transcripts,
            mode=args.mode,
            two_phase_fold=fold_strategy,
            polish=args.polish,
        )
        # cache: the docs fold re-reads the extraction output — one kernel
        # pass for both sinks, not two (the checkpointed path does the same)
        extracted.cache()
        try:
            extracted.write.mode("overwrite").parquet(os.path.join(args.output, "extracted"))
            docs.write.mode("overwrite").parquet(os.path.join(args.output, "doc_markdown"))
        finally:
            extracted.unpersist()
        committed = args.buckets
    else:
        ck = CheckpointedExtraction(
            root=args.output,
            n_buckets=args.buckets,
            mode=args.mode,
            two_phase_fold=fold_strategy,
            polish=args.polish,
        )
        committed = ck.run(transcripts, waves=args.waves)

    wall = time.perf_counter() - t0
    n_turns = transcripts.count()
    print(
        json.dumps(
            {
                "committed_buckets": committed,
                "wall_s": round(wall, 2),
                "n_turns": n_turns,
                "turns_per_sec": round(n_turns / wall, 1) if wall else None,
                "mode": args.mode,
                "output": args.output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
