"""Benchmark harness (driver contract).

Runs the headline pipelines at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}.

The extraction benchmarks run over a deterministic synthetic transcript
corpus (mixed payload classes, seeded — sources.transcripts) because the
north-rule metric is extracted turns/sec; corpus size scales with
$SPARK_GRAFT_BENCH_CONVS (default 8000 conversations).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _sink(df) -> int:
    """Force full computation; returns row count."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "8000"))
    # explicit, LOGGED skip list (comma-separated query names) for rungs
    # where an intentionally-non-scale-path query is pathological — e.g.
    # embedding_near_dup's exact=True O(n²) demo at the sf1 rung. Skipped
    # names are reported in the output JSON so a dropped query is never
    # mistaken for a covered one.
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",") if s
    }

    from autoscan_spark.operators.extract import drop_failed, extract_turns
    from autoscan_spark.operators.fold import fold_documents
    from autoscan_spark.plans.driver_queries import QUERIES
    from autoscan_spark.session import get_spark
    from autoscan_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark(app_name="autoscan-spark-bench")
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    # materialize the synthetic corpus once so generation cost isn't billed
    # to the extraction numbers
    corpus_path = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/autoscan_bench"),
        f"transcripts_{n_convs}",
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthesize_transcripts(spark, n_convs, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    transcripts = spark.read.parquet(corpus_path)
    n_turns = transcripts.count()

    spreads: dict[str, float] = {}

    def bench(name: str, df, repeats: int = 1) -> None:
        # repeats: best-of-K for the headline numbers — this VM has noisy
        # neighbors and interference only subtracts throughput. The spread
        # (worst - best across repeats) is recorded per query so cross-round
        # comparisons can tell a plan change from a noise window.
        walls = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            counts[name] = _sink(df)
            walls.append(time.perf_counter() - t0)
        timings[name] = round(min(walls), 3)
        spreads[name] = round(max(walls) - min(walls), 3)

    # headline: end-to-end low-mode extraction (shuffle-free kernel stage)
    bench("extract_low", extract_turns(transcripts, mode="low"), repeats=5)
    # extraction + ordered fold (the full reference pipeline)
    extracted = drop_failed(extract_turns(transcripts, mode="low"))
    bench("extract_fold_low", fold_documents(extracted), repeats=5)
    # high mode: serial per-conversation chain (parallelism = conversations)
    bench(
        "extract_fold_high",
        fold_documents(
            extract_turns(
                transcripts.filter(~transcripts.conv_id.endswith("-error")),
                mode="high",
            )
        ),
        repeats=3,
    )

    # documents/embeddings operator suite at the requested SF — best-of-3:
    # single seconds-scale runs on this VM vary 3-12s for identical work
    # (BENCH/BASELINE.md), and a fresh DataFrame is built per repeat so no
    # cache/checkpoint state carries over
    for name in (
        "doc_fold",
        "exact_dedup",
        "minhash_pairs",
        "simhash_pairs",
        "embedding_topk",
        "token_count",
        "quality_score",
        "lang_id",
        "corpus_prep",
        "repetition",
        "duplicate_spans",
        "remove_spans",
        "asof_join",
        "hash_split",
        "pricing_summary",
        "revenue_by_nation",
        "shipping_priority",
        "gopher_quality",
        "line_dedup",
        "temperature_sample",
        "familiarity",
        "chunk_documents",
        "paragraph_dedup",
        "chat_template",
        "sft_pairs",
        "response_echo",
        "preference_pairs",
        "bigram_rarity",
        "quality_model",
        "pack_sequences",
        "span_corruption",
        "readability",
        # r6: previously-unbenched dedup/prep queries (r5 verdict item 3) —
        # a regression in any of these was invisible to the round record
        "token_budget",
        "boilerplate_strip",
        "decontaminate",
        "snapshot_dedup",
        "polish_markdown",
        "embedding_near_dup",
        "near_dup_survivors",
        # r6: multimodal decode path (r5 verdict item 5) — fixed-size
        # synthetic media corpus, exercises the pure-python codecs
        "media_features",
        # r6: new oracle-backed queries land benched from day one
        "lsh_recall_at_5",
        "promo_revenue",
        "large_orders",
        "supplier_nation_revenue",
        "volume_shipping",
        "tfidf_terms",
        "repeat_upsample",
        "prompt_dedup",
        "semantic_dedup",
        "ivf_recall_at_5",
        "market_share",
        "conv_hygiene",
        "context_trim",
        "orders_histogram",
        "small_qty_revenue",
        "or_predicate_revenue",
        "fuzzy_dedup",
        "rolling_window",
        "pmi_collocations",
        "top_supplier",
        "retention_cohorts",
        "event_transitions",
        "winnow_pairs",
        "template_dedup",
        "lexicon_hits",
        "tokenizer_fertility",
        "oov_rate",
        "turn_redundancy",
        "dedup_clusters",
        "hourly_activity",
        "length_filter",
        "ngram_commonness",
        "rolling_active_users",
        "cms_heavy_hitters",
        "ccnet_buckets",
        "funnel_within",
        "cluster_split",
        "merge_turns",
        "stickiness",
        "code_fraction",
        "encoding_quality",
        "refusal_rate",
        "truncation_rate",
        "word_entropy",
        "hll_ngrams",
        "bloom_decontaminate",
        "parttype_revenue",
        "user_anomalies",
        "tool_call_stats",
        "interevent_stats",
        "length_deciles",
        "parts_per_supplier",
        "knn_label_noise",
        "sample_exact_n",
        "weekly_churn",
        "best_of_cluster",
    ):
        if name in skip:
            continue
        walls = []
        for _ in range(3):
            # time from BEFORE query construction: lazy queries only build
            # a plan there (ms), but eager-in-construction queries
            # (quality_model's MLlib fit, bpe-style loops) do their real
            # work in the constructor — excluding it would bench only the
            # cheap scoring pass
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            counts[name] = _sink(df)
            walls.append(time.perf_counter() - t0)
        timings[name] = round(min(walls), 3)
        spreads[name] = round(max(walls) - min(walls), 3)

    headline = timings["extract_fold_low"]
    turns_per_sec = round(n_turns / headline, 1) if headline > 0 else None

    print(
        json.dumps(
            {
                "metric": "extract_fold_e2e_wall_sec",
                # "value" is the HEADLINE (end-to-end extraction+fold wall,
                # the north-rule metric's denominator) — NOT the suite
                # total: the suite grows every round as operator coverage
                # widens (35 queries at r5, 80+ at r6), so a sum would read
                # as a regression whenever coverage improves. The full
                # coverage-suite total is reported separately below;
                # cross-round comparisons of individual operators should
                # use the per-query map either way.
                "value": headline,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "n_turns": n_turns,
                "turns_per_sec": turns_per_sec,
                "suite_total_sec": round(sum(timings.values()), 3),
                "n_queries_benched": len(timings),
                "counts": counts,
                "skipped": sorted(skip),
                "noise_spread_sec": spreads,
                "noise_note": (
                    "timings are best-of-K on a noisy shared VM; "
                    "noise_spread_sec[q] = worst-best across repeats"
                ),
                "master": spark.sparkContext.master,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
