"""Tests for the as-of join and deterministic sampling/split operators."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from autoscan_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
)
from autoscan_spark.operators.temporal import asof_join


def _quotes(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 10, 0, 0), 100.0),
        ("A", datetime(2024, 1, 1, 12, 0, 0), 110.0),
        ("B", datetime(2024, 1, 1, 11, 0, 0), 55.0),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["sym", "q_ts", "price"])
    )


def _trades(spark):
    rows = [
        (1, "A", datetime(2024, 1, 1, 9, 0, 0)),   # before any quote → null
        (2, "A", datetime(2024, 1, 1, 10, 0, 0)),  # exact tie → inclusive
        (3, "A", datetime(2024, 1, 1, 11, 30, 0)), # between → 10:00 quote
        (4, "A", datetime(2024, 1, 1, 13, 0, 0)),  # after all → 12:00 quote
        (5, "B", datetime(2024, 1, 1, 12, 0, 0)),  # other key → B's quote
        (6, "C", datetime(2024, 1, 1, 12, 0, 0)),  # key with no quotes
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["trade_id", "sym", "t_ts"])
    )


def test_asof_join_backward_inclusive(spark):
    out = asof_join(
        _trades(spark), _quotes(spark),
        by="sym", left_ts="t_ts", right_ts="q_ts", value_cols=["price"],
    )
    got = {r["trade_id"]: r["price"] for r in out.collect()}
    assert got == {1: None, 2: 100.0, 3: 100.0, 4: 110.0, 5: 55.0, 6: None}
    # row-preserving left join: every left row exactly once
    assert out.count() == 6


def test_asof_join_tolerance(spark):
    out = asof_join(
        _trades(spark), _quotes(spark),
        by="sym", left_ts="t_ts", right_ts="q_ts", value_cols=["price"],
        tolerance_seconds=3600,  # 1h lookback
    )
    got = {r["trade_id"]: r["price"] for r in out.collect()}
    # trade 3 (11:30) is 90 min after the 10:00 quote → dropped by tolerance;
    # trade 4 (13:00) is 60 min after 12:00 → kept (inclusive)
    assert got == {1: None, 2: 100.0, 3: None, 4: 110.0, 5: 55.0, 6: None}


def test_asof_join_single_shuffle(spark, tmp_path_factory):
    """The union-tag as-of join must cost exactly ONE hash shuffle (the
    window partition) — no range-join explosion, no extra exchanges."""
    base = str(tmp_path_factory.mktemp("asof"))
    _trades(spark).write.parquet(base + "/t")
    _quotes(spark).write.parquet(base + "/q")
    out = asof_join(
        spark.read.parquet(base + "/t"), spark.read.parquet(base + "/q"),
        by="sym", left_ts="t_ts", right_ts="q_ts", value_cols=["price"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange hashpartitioning")
    assert n == 1, f"expected 1 shuffle, got {n}:\n{plan[:2000]}"


def test_hash_split_deterministic_and_leakage_safe(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = hash_split(df, "k")
    b = hash_split(df.repartition(7), "k")  # partitioning must not matter
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    fracs = {r["split"]: r["n"] for r in
             a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(fracs) == {"train", "val", "test"}
    assert abs(fracs["train"] / 20_000 - 0.98) < 0.01
    # equal keys → same split (leakage safety)
    dup = hash_split(df.union(df), "k")
    per_key = dup.groupBy("k").agg(F.countDistinct("split").alias("n"))
    assert per_key.filter("n != 1").count() == 0

    with pytest.raises(ValueError, match="sum to 1.0"):
        hash_split(df, "k", {"train": 0.5, "test": 0.1})


def test_hash_sample_fraction_and_stability(spark):
    df = spark.range(50_000).withColumnRenamed("id", "k")
    s = hash_sample(df, "k", 0.1)
    n = s.count()
    assert abs(n / 50_000 - 0.1) < 0.01
    # nested property: a 5% sample with the same salt is a subset of the 10%
    s5 = hash_sample(df, "k", 0.05)
    assert s5.exceptAll(s).count() == 0
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(df, "k", 0.0)


def test_stratified_hash_sample(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": range(30_000), "lang": ["en", "de", "fr"] * 10_000}
        )
    )
    out = stratified_hash_sample(
        df, "k", "lang", {"en": 0.5, "de": 1.0}, default_fraction=0.0
    )
    kept = {r["lang"]: r["n"] for r in
            out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept.get("de") == 10_000        # 100% stratum kept entirely
    assert "fr" not in kept                # default 0 → dropped
    assert abs(kept["en"] / 10_000 - 0.5) < 0.02


def test_funnel_counts(spark):
    from datetime import datetime

    from autoscan_spark.operators.temporal import funnel_counts

    t = lambda m: datetime(2024, 1, 1, 10, m, 0)
    rows = [
        # u1: full ordered funnel
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # u2: first view < first click (in order) but first purchase sits
        # BETWEEN them → reaches click, not purchase
        (2, "view", t(0)), (2, "purchase", t(1)), (2, "click", t(2)),
        # u3: view only
        (3, "view", t(0)),
        # u4: click without view → depth 0 (no view at all)
        (4, "click", t(0)),
        # u5: simultaneous view+click (not strictly increasing) → view only
        (5, "view", t(0)), (5, "click", t(0)),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    )
    out = {r["step"]: r["n_users"] for r in
           funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 1}

    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(ev, [])


def test_profile_table(spark):
    from autoscan_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2, 2, None], "s": ["b", "a", None, None]}
        ).astype({"k": "Int64"})
    )
    prof = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert prof["k"]["n_rows"] == 4 and prof["k"]["n_nulls"] == 1
    assert prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_value"] == "1" and prof["k"]["max_value"] == "2"
    assert prof["s"]["n_nulls"] == 2 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_value"] == "a" and prof["s"]["max_value"] == "b"
    # approx path runs and is sane on tiny input
    approx = {r["column"]: r["n_distinct"] for r in profile_table(df).collect()}
    assert approx["k"] in (1, 2, 3)


def test_asof_join_differential_vs_pandas(spark):
    """Differential fuzz: the distributed union-tag as-of join must agree
    with pandas.merge_asof (direction='backward', allow_exact_matches=True)
    on randomized keyed time series — an independent reference
    implementation, not a reimplementation of our own logic."""
    import numpy as np

    rng = np.random.RandomState(11)
    n_l, n_r = 400, 150
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 8, n_l),
            "ts": pd.to_datetime(rng.randint(0, 10_000, n_l), unit="s"),
        }
    ).assign(lid=range(n_l))
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 10, n_r),  # some keys absent on the left
            "ts": pd.to_datetime(rng.randint(0, 10_000, n_r), unit="s"),
            "val": rng.randn(n_r).round(6),
        }
    )
    # determinism contract: one right row per (k, ts)
    right = right.drop_duplicates(subset=["k", "ts"], keep="first")

    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "r_ts"}),
        left_on="ts",
        right_on="r_ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).set_index("lid")["val"]

    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right.rename(columns={"ts": "r_ts"})),
        by="k",
        left_ts="ts",
        right_ts="r_ts",
        value_cols=["val"],
    )
    got = {r["lid"]: r["val"] for r in out.collect()}
    assert len(got) == n_l
    for lid, w in want.items():
        g = got[lid]
        if pd.isna(w):
            assert g is None, f"lid {lid}: want null, got {g}"
        else:
            assert g == pytest.approx(w), f"lid {lid}"


def test_temperature_rates_and_sample(spark):
    from autoscan_spark.operators.sampling import (
        temperature_rates,
        temperature_sample,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": range(12_600),
                "lang": ["en"] * 10_000 + ["de"] * 2_500 + ["fr"] * 100,
            }
        )
    )
    rates = {r["lang"]: r["keep_rate"] for r in
             temperature_rates(df, "lang").collect()}
    # alpha=0.5: rate = sqrt(n_min / n) — smallest stratum keeps everything
    assert rates["fr"] == 1.0
    assert rates["en"] == pytest.approx((100 / 10_000) ** 0.5)
    assert rates["de"] == pytest.approx((100 / 2_500) ** 0.5)

    kept = {r["lang"]: r["n"] for r in
            temperature_sample(df, "lang", "k")
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept["fr"] == 100  # rate 1.0 keeps all
    assert abs(kept["en"] / 10_000 - rates["en"]) < 0.02
    assert abs(kept["de"] / 2_500 - rates["de"]) < 0.02

    # alpha=1 → natural mixture, nothing dropped
    assert temperature_sample(df, "lang", "k", alpha=1.0).count() == 12_600
    # alpha=0 → equalized mixture: every stratum ≈ the smallest one
    eq = {r["lang"]: r["n"] for r in
          temperature_sample(df, "lang", "k", alpha=0.0)
          .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert eq["fr"] == 100
    assert abs(eq["en"] - 100) < 40 and abs(eq["de"] - 100) < 40

    # deterministic: same kept set regardless of partitioning
    a = temperature_sample(df, "lang", "k")
    b = temperature_sample(df.repartition(13), "lang", "k")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    with pytest.raises(ValueError, match="alpha"):
        temperature_rates(df, "lang", alpha=1.5)


def test_cap_per_group(spark):
    from autoscan_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": range(100), "grp": ["a"] * 80 + ["b"] * 15 + ["c"] * 5}
        )
    )
    capped = cap_per_group(df, "grp", "k", 10)
    sizes = {r["grp"]: r["n"] for r in
             capped.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"a": 10, "b": 10, "c": 5}  # small groups untouched
    # deterministic: same kept set regardless of partitioning
    again = cap_per_group(df.repartition(13), "grp", "k", 10)
    assert capped.exceptAll(again).count() == 0
    assert again.exceptAll(capped).count() == 0
    with pytest.raises(ValueError, match="n must be"):
        cap_per_group(df, "grp", "k", 0)


def test_token_budget_sample_prefix_semantics(spark):
    """Differential vs a Python replay of the md5 hash order: the kept set
    is exactly the per-stratum prefix whose running token sum fits."""
    import hashlib

    from autoscan_spark.operators.sampling import token_budget_sample

    def bucket(k):
        h = hashlib.md5(f"budget-v1{k}".encode()).hexdigest()[:8]
        return int(h, 16) % 1_000_000

    rows = [(i, ["en", "de"][i % 2], 10 + (i * 7) % 50) for i in range(300)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "lang", "n_tok"])
    )
    budget = 800
    want = set()
    for lang in ("en", "de"):
        cum = 0
        for k, lg, t in sorted(
            (r for r in rows if r[1] == lang), key=lambda r: (bucket(r[0]), r[0])
        ):
            cum += t
            if cum <= budget:
                want.add(k)
    out = token_budget_sample(
        df.repartition(7), budget, key_col="k", token_col="n_tok",
        strata_col="lang",
    )
    got = {r["k"] for r in out.collect()}
    assert got == want
    # per-stratum totals within budget
    sums = {r["lang"]: r["s"] for r in
            out.groupBy("lang").agg(F.sum("n_tok").alias("s")).collect()}
    assert all(s <= budget for s in sums.values())

    # prefix semantics: an oversized head blocks everything after it
    tiny = spark.createDataFrame(
        pd.DataFrame([(1, 100), (2, 1)], columns=["k", "n_tok"])
    )
    first = sorted([1, 2], key=lambda k: (bucket(k), k))[0]
    first_tok = 100 if first == 1 else 1
    kept = {r["k"] for r in
            token_budget_sample(tiny, 50, key_col="k", token_col="n_tok").collect()}
    assert kept == (set() if first_tok > 50 else {first} if first == 2 else set())

    with pytest.raises(ValueError, match="budget_tokens"):
        token_budget_sample(tiny, -1, key_col="k", token_col="n_tok")


def test_token_budget_matches_single_window_formulation(spark):
    """The bucketed two-pass implementation is bit-identical to the naive
    single-window-per-stratum running sum — including null tokens (window
    sum ignores them; a row preceded by no non-null token has NULL cum and
    drops), zero-token rows at the boundary, and budget edge values."""
    from pyspark.sql.window import Window

    from autoscan_spark.operators.sampling import _hash_bucket, token_budget_sample

    rows = []
    for i in range(400):
        tok = None if i % 17 == 0 else (0 if i % 11 == 0 else (i * 13) % 97)
        # every 7th row has a NULL stratum (undetected language) — NULLs
        # form their own budget group, exactly like the window formulation
        lang = None if i % 7 == 0 else ["en", "de", "fr"][i % 3]
        rows.append((i, lang, tok))
    # an all-null-token stratum: every row must drop
    rows += [(1000 + i, "xx", None) for i in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "lang", "n_tok"]).astype(
            {"n_tok": "Int64"}
        )
    ).repartition(5)

    def naive(budget):
        w = (
            Window.partitionBy("lang")
            .orderBy(
                F.expr(_hash_bucket("k", "budget-v1")).asc(), F.col("k").asc()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return {
            r["k"]
            for r in df.withColumn("__cum", F.sum("n_tok").over(w))
            .filter(F.col("__cum") <= budget)
            .collect()
        }

    for budget in (0, 1, 500, 3000, 10**9):
        got = {
            r["k"]
            for r in token_budget_sample(
                df, budget, key_col="k", token_col="n_tok", strata_col="lang"
            ).collect()
        }
        assert got == naive(budget), f"budget={budget}"
        assert not any(k >= 1000 for k in got)  # all-null stratum drops


def test_token_budget_no_full_stratum_sort(spark, sf_dir):
    """Scale guard: the row-level window partitions on (stratum, bucket) —
    never on the stratum alone, which would funnel a whole language through
    one reducer. The only stratum-partitioned window runs on the tiny
    per-bucket summary table."""
    from autoscan_spark.operators.sampling import token_budget_sample
    from autoscan_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.trim("text"), r"\s+"))
    )
    out = token_budget_sample(
        docs, 2000, key_col="doc_id", token_col="n_tok", strata_col="lang"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every row-level Window node over the corpus must include the bucket
    # in its partition spec: assert some (s, b) window exists and no
    # Window partitions by the stratum column alone alongside doc columns
    assert "__tbs_b" in plan
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        part_spec = m.group(1)
        if "__tbs_s" in part_spec:
            assert "__tbs_b" in part_spec or "text" not in m.group(0), (
                "full-stratum window over corpus rows:\n" + m.group(0)
            )


def test_asof_join_null_value_in_latest_right_row(spark):
    """ASOF semantics are ROW-based: a NULL value in the most recent right
    row must be returned as NULL, not skipped in favor of a stale older
    value (and tolerance must be judged against the matched ROW's ts)."""
    right = spark.createDataFrame(
        pd.DataFrame(
            [
                ("A", datetime(2024, 1, 1, 10, 0, 0), 100.0),
                ("A", datetime(2024, 1, 1, 12, 0, 0), None),
            ],
            columns=["sym", "q_ts", "price"],
        )
    )
    left = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "A", datetime(2024, 1, 1, 11, 0, 0)),  # → 10:00 row
                (2, "A", datetime(2024, 1, 1, 13, 0, 0)),  # → 12:00 row (NULL)
            ],
            columns=["trade_id", "sym", "t_ts"],
        )
    )
    got = {r["trade_id"]: r["price"] for r in asof_join(
        left, right, by="sym", left_ts="t_ts", right_ts="q_ts",
        value_cols=["price"],
    ).collect()}
    assert got == {1: 100.0, 2: None}
    # with 1h tolerance: trade 2's matched ROW (12:00) is in-window but its
    # value is NULL — the 10:00 value must NOT resurface
    got_tol = {r["trade_id"]: r["price"] for r in asof_join(
        left, right, by="sym", left_ts="t_ts", right_ts="q_ts",
        value_cols=["price"], tolerance_seconds=3600,
    ).collect()}
    assert got_tol == {1: 100.0, 2: None}


def test_temperature_sample_null_stratum_kept(spark):
    """Rows with a NULL stratum get their own rate (null-safe join), not
    silent exclusion."""
    from autoscan_spark.operators.sampling import temperature_sample

    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": range(1100), "lang": ["en"] * 1000 + [None] * 100}
        )
    )
    kept = temperature_sample(df, "lang", "k")
    null_kept = kept.filter(F.col("lang").isNull()).count()
    assert null_kept == 100  # NULL is the smallest stratum → rate 1.0


def test_profile_table_quoted_column_names(spark):
    from autoscan_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        pd.DataFrame({"user's_id": [1, 2, 2], "a`b": ["x", None, "y"]})
    )
    prof = {r["column"]: r for r in
            profile_table(df, exact_distinct=True).collect()}
    assert prof["user's_id"]["n_distinct"] == 2
    assert prof["a`b"]["n_nulls"] == 1 and prof["a`b"]["max_value"] == "y"


def test_pack_sequences_differential_and_invariants(spark, sf_dir):
    """Greedy packing vs an independent Python replay on the same
    partition-sorted stream (repartition(1) makes the global order the
    partition order); plus multi-partition invariants: every input chunk
    lands in exactly one pack, packs respect capacity unless a single
    oversized chunk, and pack text preserves chunk order."""
    import pandas as pd

    from autoscan_spark.operators.sampling import pack_sequences

    rows = []
    rng_tokens = [30, 90, 100, 512, 600, 1, 1, 511, 2, 50]
    for doc in range(6):
        for i, tok in enumerate(rng_tokens):
            rows.append((doc, i, tok, f"d{doc}c{i}"))
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"]
        )
    )

    # single partition: exact differential vs Python replay, in bin order
    # (pack_id suffix is the bin index — sort numerically, not lexically)
    got = sorted(
        (
            (int(r["pack_id"].split("-")[1]),)
            + (r["n_chunks"], r["n_tokens"], r["packed_text"])
        )
        for r in pack_sequences(df, capacity=512, num_partitions=1).collect()
    )
    ordered = sorted(rows)  # (doc, chunk) order == partition sort order
    want, cur, cur_tok = [], [], 0
    for _doc, _i, tok, txt in ordered:
        if cur and cur_tok + tok > 512:
            want.append((len(cur), cur_tok, "\n\n".join(cur)))
            cur, cur_tok = [], 0
        cur.append(txt)
        cur_tok += tok
    if cur:
        want.append((len(cur), cur_tok, "\n\n".join(cur)))
    assert [(n, t, x) for _b, n, t, x in got] == want
    # oversized chunks (600 > 512) sit alone and overflow honestly
    assert any(n == 1 and t == 600 for _b, n, t, x in got)

    # multi-partition invariants
    packs = pack_sequences(df, capacity=512, num_partitions=4).collect()
    all_chunks = [c for p in packs for c in p["packed_text"].split("\n\n")]
    assert sorted(all_chunks) == sorted(r[3] for r in rows)
    for p in packs:
        assert p["n_tokens"] <= 512 or p["n_chunks"] == 1
    # determinism under fixed partitioning
    again = pack_sequences(df, capacity=512, num_partitions=4).collect()
    assert sorted(map(tuple, packs)) == sorted(map(tuple, again))

    import pytest

    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(df, capacity=0)


def test_repeat_upsample_epoch_semantics(spark):
    from autoscan_spark.operators.sampling import repeat_upsample

    df = spark.createDataFrame(
        [(i, "hot" if i < 40 else ("cold" if i < 80 else "other"))
         for i in range(120)],
        "doc_id long, source string",
    )
    out = repeat_upsample(
        df, strata_col="source", key_col="doc_id",
        epochs={"hot": 2.5, "cold": 0.5}, default=1.0,
    )
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["doc_id"], r["copy_idx"]))
    # hot: every row 2 or 3 times; total ~ 2.5x; copy_idx dense from 0
    hot_counts = {}
    for d, c in by_src["hot"]:
        hot_counts[d] = max(hot_counts.get(d, -1), c)
    assert all(mx in (1, 2) for mx in hot_counts.values())
    assert 2 * 40 <= len(by_src["hot"]) <= 3 * 40
    # cold: each row 0 or 1 times, ~half survive
    cold_ids = [d for d, _ in by_src["cold"]]
    assert len(cold_ids) == len(set(cold_ids))
    assert 0 < len(cold_ids) < 40
    # default stratum: exactly once each
    assert sorted(d for d, _ in by_src["other"]) == list(range(80, 120))
    # deterministic: same input -> identical multiset
    again = repeat_upsample(
        df, strata_col="source", key_col="doc_id",
        epochs={"hot": 2.5, "cold": 0.5}, default=1.0,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    with pytest.raises(ValueError, match=">= 0"):
        repeat_upsample(df, "source", "doc_id", {"hot": -1.0})


def test_repeat_upsample_zero_shuffle_plan(spark, sf_dir):
    from autoscan_spark.plans.driver_queries import q_repeat_upsample

    plan = (
        q_repeat_upsample(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_rolling_time_stats_boundaries(spark):
    from autoscan_spark.operators.temporal import rolling_time_stats

    rows = [
        # user 1: events at t=0, t=3600 (INCLUDED in 1h frame — RANGE
        # bound is inclusive), t=7201 (frame restarts past both)
        (1, 1, datetime(2024, 1, 1, 0, 0, 0), 1.00),
        (2, 1, datetime(2024, 1, 1, 1, 0, 0), 2.00),
        (3, 1, datetime(2024, 1, 1, 2, 0, 1), 4.00),
        # micros truncation: 00:59:59.999999 floors to 3599 -> inside
        # event 5's frame at t=7199 (7199-3599=3600, inclusive)
        (4, 2, datetime(2024, 1, 1, 0, 59, 59, 999999), 8.00),
        (5, 2, datetime(2024, 1, 1, 1, 59, 59), 16.00),
        # other user at same times: never mixed in
        (6, 3, datetime(2024, 1, 1, 1, 0, 0), 32.00),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "value"]
    )
    got = {
        r["event_id"]: (r["n_events_win"], r["value_cents_win"])
        for r in rolling_time_stats(df).collect()
    }
    assert got == {
        1: (1, 100),
        2: (2, 300),    # includes t=0 event: 3600s back, inclusive
        3: (1, 400),    # frame start 7201-3600=3601: event 2 (t=3600) excluded
        4: (1, 800),
        5: (2, 2400),   # 999999 micros floored: 7199-3599 = 3600, inclusive
        6: (1, 3200),
    }


def test_retention_cohorts_triangle(spark):
    from autoscan_spark.operators.temporal import retention_cohorts

    # u1 first seen wk of Jan 5 (Mon), active again 2 weeks later;
    # u2 first seen wk of Jan 12, active same week twice (counted once)
    rows = [
        (1, datetime(2026, 1, 6), 10),
        (1, datetime(2026, 1, 20), 11),
        (2, datetime(2026, 1, 14), 12),
        (2, datetime(2026, 1, 15), 13),
    ]
    df = spark.createDataFrame(
        [(u, ts, i) for u, ts, i in rows], "user_id long, ts timestamp, event_id long"
    )
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2026-01-05", 0): 1,
        ("2026-01-05", 2): 1,
        ("2026-01-12", 0): 1,
    }


def test_event_transitions_counts_and_ppm(spark):
    from autoscan_spark.operators.temporal import event_transitions

    # u1: a -> b -> a ; u2: a -> b  => a->b twice, b->a once
    df = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 0, 0, 0), 1, "a"),
            (1, datetime(2026, 1, 1, 0, 0, 1), 2, "b"),
            (1, datetime(2026, 1, 1, 0, 0, 2), 3, "a"),
            (2, datetime(2026, 1, 1, 0, 0, 0), 4, "a"),
            (2, datetime(2026, 1, 1, 0, 0, 5), 5, "b"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    got = {
        (r.event_type, r.next_type): (r.n_transitions, r.p_ppm)
        for r in event_transitions(df).collect()
    }
    assert got == {("a", "b"): (2, 1000000), ("b", "a"): (1, 1000000)}


def test_event_transitions_tie_break_on_event_id(spark):
    from autoscan_spark.operators.temporal import event_transitions

    ts = datetime(2026, 1, 1)
    # equal timestamps: order must follow event_id, so a(1) -> b(2) -> c(3)
    df = spark.createDataFrame(
        [(1, ts, 2, "b"), (1, ts, 1, "a"), (1, ts, 3, "c")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    got = sorted(
        (r.event_type, r.next_type) for r in event_transitions(df).collect()
    )
    assert got == [("a", "b"), ("b", "c")]


def test_hourly_profile_shares(spark):
    from autoscan_spark.operators.temporal import hourly_profile

    df = spark.createDataFrame(
        [
            (datetime(2026, 1, 1, 9, 5), "click"),
            (datetime(2026, 1, 2, 9, 55), "click"),
            (datetime(2026, 1, 1, 14, 0), "click"),
            (datetime(2026, 1, 1, 9, 30), "view"),
        ],
        "ts timestamp, event_type string",
    )
    got = {(r.event_type, r.hour_of_day): (r.n_events, r.share_ppm)
           for r in hourly_profile(df).collect()}
    assert got == {
        ("click", 9): (2, 666666),
        ("click", 14): (1, 333333),
        ("view", 9): (1, 1000000),
    }


def test_rolling_active_users_window(spark):
    from autoscan_spark.operators.temporal import rolling_active_users

    df = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 8)),
            (2, datetime(2026, 1, 1, 9)),
            (1, datetime(2026, 1, 5, 9)),   # u1 active again day 5
        ],
        "user_id long, ts timestamp",
    )
    got = {r.day: r.n_active_users
           for r in rolling_active_users(df, window_days=3).collect()}
    # u1,u2 visible Jan1-3; u1 re-visible Jan5-7 but clipped at max day Jan5
    assert got == {
        "2026-01-01": 2,
        "2026-01-02": 2,
        "2026-01-03": 2,
        "2026-01-05": 1,
    }


def test_funnel_within_time_bound(spark):
    from autoscan_spark.operators.temporal import funnel_within

    df = spark.createDataFrame(
        [
            # u1 converts within bounds: a@0, b@+30s, c@+50s
            (1, datetime(2026, 1, 1, 0, 0, 0), "a"),
            (1, datetime(2026, 1, 1, 0, 0, 30), "b"),
            (1, datetime(2026, 1, 1, 0, 0, 50), "c"),
            # u2: b arrives 2 min after a -> outside 60s bound
            (2, datetime(2026, 1, 1, 0, 0, 0), "a"),
            (2, datetime(2026, 1, 1, 0, 2, 0), "b"),
            # u3: b BEFORE a -> not ordered, fails step 2
            (3, datetime(2026, 1, 1, 0, 1, 0), "a"),
            (3, datetime(2026, 1, 1, 0, 0, 0), "b"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = {r.step: r.n_users
           for r in funnel_within(df, ["a", "b", "c"], 60).collect()}
    assert got == {"a": 3, "b": 1, "c": 1}


def test_funnel_within_clock_restarts_at_each_step(spark):
    from autoscan_spark.operators.temporal import funnel_within

    # b at +50s (within 60), c at +50s after b (+100s after a): the
    # 60s clock restarts at b, so c still qualifies
    df = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 0, 0, 0), "a"),
            (1, datetime(2026, 1, 1, 0, 0, 50), "b"),
            (1, datetime(2026, 1, 1, 0, 1, 40), "c"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = {r.step: r.n_users
           for r in funnel_within(df, ["a", "b", "c"], 60).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_cluster_split_no_straddle(spark):
    from autoscan_spark.operators.sampling import cluster_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    rows = cluster_split(docs, pairs, {"train": 0.5, "test": 0.5}).collect()
    split = {r.doc_id: r.split for r in rows}
    cid = {r.doc_id: r.cluster_id for r in rows}
    # whole cluster shares one split — near-dups can't straddle
    assert split[1] == split[2] == split[3] and cid[1] == cid[2] == cid[3] == 1
    assert split[5] == split[6] and cid[5] == 5
    assert cid[4] == 4 and cid[7] == 7  # singletons key by own id


def test_stickiness_dau_wau_ratio(spark):
    """DAU/WAU per day: hand-computed trailing-7-day windows; ppm is
    exact integer division; only days with activity appear."""
    from autoscan_spark.operators.temporal import stickiness

    rows = [
        # u1 active day 1 and day 3; u2 active day 1; u3 active day 10
        (1, datetime(2024, 1, 1, 5), ), (2, datetime(2024, 1, 1, 9), ),
        (1, datetime(2024, 1, 3, 1), ), (1, datetime(2024, 1, 3, 2), ),
        (3, datetime(2024, 1, 10, 0), ),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"])
    ).repartition(3)
    got = {
        r.day: (r.dau, r.wau, r.stickiness_ppm)
        for r in stickiness(df, window_days=7).collect()
    }
    # day 1: dau {u1,u2}=2, wau (days -6..1 visible) = {u1,u2} = 2
    # day 3: dau {u1}=1,   wau = {u1,u2} (both active within prior 7d) = 2
    # day 10: dau {u3}=1,  wau = {u3} (day-3 activity expired on day 9) = 1
    assert got == {
        "2024-01-01": (2, 2, 1000000),
        "2024-01-03": (1, 2, 500000),
        "2024-01-10": (1, 1, 1000000),
    }
    # only active days appear (no fabricated rows for days 2, 4-9)
    assert len(got) == 3


def test_zscore_outliers_flags_only_extremes(spark):
    from autoscan_spark.operators.temporal import zscore_outliers

    # user 1: ten values at 10.00 plus one at 500.00 -> only the spike
    # flags (a lone spike among n-1 constants has z = sqrt(n-1), so n=11
    # gives z ~ 3.16 > 3; n=10 would sit EXACTLY on the k=3 boundary and
    # the strict inequality excludes it). user 2: constant values -> zero
    # variance, nothing flags. user 3: below min_n.
    rows = [(1, i, 10.0) for i in range(10)] + [(1, 10, 500.0)]
    rows += [(2, 20 + i, 42.0) for i in range(6)]
    rows += [(3, 100, 1.0), (3, 101, 99999.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    out = zscore_outliers(df, k=3, min_n=5).collect()
    assert [(r.user_id, r.event_id, r.value_c, r.n_events) for r in out] == [
        (1, 10, 50000, 11)
    ]


def test_zscore_outliers_min_n_and_k_gates(spark):
    from autoscan_spark.operators.temporal import zscore_outliers

    rows = [(1, i, 10.0) for i in range(4)] + [(1, 4, 500.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    # n=5 spike has z = sqrt(4) = 2: k=1 flags it, k=3 does not;
    # min_n=6 suppresses the group entirely regardless of k
    assert zscore_outliers(df, k=1, min_n=5).count() == 1
    assert zscore_outliers(df, k=3, min_n=5).count() == 0
    assert zscore_outliers(df, k=1, min_n=6).count() == 0
    with pytest.raises(ValueError):
        zscore_outliers(df, k=0)
    with pytest.raises(ValueError):
        zscore_outliers(df, min_n=0)


def test_zscore_outliers_single_shuffle_plan(spark):
    from autoscan_spark.operators.temporal import zscore_outliers

    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0)], "user_id long, event_id long, value double"
    )
    plan = zscore_outliers(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_interevent_stats_gaps(spark):
    from datetime import datetime

    from autoscan_spark.operators.temporal import interevent_stats

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0)),
        (1, datetime(2024, 1, 1, 0, 0, 10)),
        (1, datetime(2024, 1, 1, 0, 1, 10)),   # gaps 10, 60
        (2, datetime(2024, 1, 1, 0, 0, 0)),
        (2, datetime(2024, 1, 1, 0, 0, 0)),    # tie -> gap 0
        (2, datetime(2024, 1, 1, 0, 0, 7)),    # gaps 0, 7 -> avg 3 (DIV)
        (3, datetime(2024, 1, 1, 12, 0, 0)),   # single event -> no row
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"])
    ).repartition(2)
    out = {r["user_id"]: r for r in interevent_stats(df).collect()}
    assert (out[1]["n_gaps"], out[1]["min_gap_s"], out[1]["max_gap_s"],
            out[1]["avg_gap_s"]) == (2, 10, 60, 35)
    assert (out[2]["n_gaps"], out[2]["min_gap_s"], out[2]["max_gap_s"],
            out[2]["avg_gap_s"]) == (2, 0, 7, 3)
    assert 3 not in out


def test_interevent_stats_single_shuffle_plan(spark):
    from datetime import datetime

    from autoscan_spark.operators.temporal import interevent_stats

    df = spark.createDataFrame(
        pd.DataFrame(
            [(1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 2))],
            columns=["user_id", "ts"],
        )
    )
    plan = interevent_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_length_deciles_tile_assignment(spark):
    from autoscan_spark.operators.profile import length_deciles

    # 7 docs in one lang, 3 tiles -> sizes 3,2,2 in (len, id) order
    rows = [(i, "en", ln) for i, ln in enumerate([10, 20, 30, 40, 50, 60, 70])]
    rows += [(100, "de", 5)]  # singleton group: every tile boundary safe
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"])
    ).repartition(3)
    out = {(r["lang"], r["tile"]): r for r in length_deciles(df, n_tiles=3).collect()}
    assert (out[("en", 1)]["n_docs"], out[("en", 1)]["min_len"],
            out[("en", 1)]["max_len"]) == (3, 10, 30)
    assert (out[("en", 2)]["n_docs"], out[("en", 2)]["min_len"],
            out[("en", 2)]["max_len"]) == (2, 40, 50)
    assert (out[("en", 3)]["n_docs"], out[("en", 3)]["max_len"]) == (2, 70)
    assert (out[("de", 1)]["n_docs"], out[("de", 1)]["min_len"]) == (1, 5)
    with pytest.raises(ValueError):
        length_deciles(df, n_tiles=0)


def test_length_deciles_single_shuffle_plan(spark):
    from autoscan_spark.operators.profile import length_deciles

    df = spark.createDataFrame(
        [(1, "en", 10)], "doc_id long, lang string, n_chars long"
    )
    plan = length_deciles(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_hash_top_n_exact_nested_and_stable(spark):
    from autoscan_spark.operators.sampling import hash_top_n

    df = spark.range(10_000).withColumnRenamed("id", "k")
    s10 = hash_top_n(df, "k", 1000)
    assert s10.count() == 1000
    # partitioning must not change the draw
    s10b = hash_top_n(df.repartition(13), "k", 1000)
    assert s10.exceptAll(s10b).count() == 0 and s10b.exceptAll(s10).count() == 0
    # nested: top-300 of the same salt is a subset of the top-1000
    s3 = hash_top_n(df, "k", 300)
    assert s3.exceptAll(s10).count() == 0
    # different salt draws a (near-certainly) different set
    other = hash_top_n(df, "k", 1000, salt="other")
    assert other.exceptAll(s10).count() > 0
    with pytest.raises(ValueError):
        hash_top_n(df, "k", 0)


def test_hash_top_n_plans_as_take_ordered(spark, tmp_path_factory):
    from autoscan_spark.operators.sampling import hash_top_n

    base = str(tmp_path_factory.mktemp("topn"))
    spark.range(5000).withColumnRenamed("id", "k").write.parquet(base + "/t")
    plan = (
        hash_top_n(spark.read.parquet(base + "/t"), "k", 50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort — per-partition heaps only


def test_zscore_outliers_differential_vs_python_ints(spark):
    """Randomized differential: the DECIMAL(38,0) cross-multiplied flag
    must equal the same identity evaluated in unbounded Python ints
    (an independent exact reference, no floats anywhere)."""
    import numpy as np

    from autoscan_spark.operators.temporal import zscore_outliers

    rng = np.random.RandomState(23)
    rows = []
    eid = 0
    for user in range(60):
        n = rng.randint(1, 40)
        base = rng.uniform(-1000, 1000)
        for _ in range(n):
            v = base + rng.choice([0.0, rng.uniform(-5, 5), rng.uniform(-5000, 5000)])
            rows.append((user, eid, float(v)))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    got = {
        (r.user_id, r.event_id)
        for r in zscore_outliers(df, k=3, min_n=5).collect()
    }
    # exact integer reference
    import collections
    import math

    cents = {(u, e): math.floor(v * 100 + 0.5) for u, e, v in rows}
    per_user = collections.defaultdict(list)
    for (u, e), c in cents.items():
        per_user[u].append((e, c))
    want = set()
    for u, evs in per_user.items():
        n = len(evs)
        if n < 5:
            continue
        s = sum(c for _, c in evs)
        q = sum(c * c for _, c in evs)
        for e, c in evs:
            if (n * c - s) ** 2 > 9 * (n * q - s * s):
                want.add((u, e))
    assert got == want and len(want) > 0


def test_interevent_stats_differential_vs_pandas(spark):
    import numpy as np

    from autoscan_spark.operators.temporal import interevent_stats

    rng = np.random.RandomState(31)
    n = 800
    pdf = pd.DataFrame(
        {
            "user_id": rng.randint(0, 40, n),
            "ts": pd.to_datetime(rng.randint(0, 100_000, n), unit="s"),
        }
    )
    got = {
        r.user_id: (r.n_gaps, r.min_gap_s, r.max_gap_s, r.avg_gap_s)
        for r in interevent_stats(spark.createDataFrame(pdf)).collect()
    }
    want = {}
    for u, g in pdf.groupby("user_id"):
        es = np.sort(g["ts"].astype("int64").to_numpy() // 10**9)
        if len(es) < 2:
            continue
        gaps = np.diff(es)
        want[u] = (
            len(gaps), int(gaps.min()), int(gaps.max()),
            int(gaps.sum()) // len(gaps),
        )
    assert got == want and len(want) > 0


def test_weekly_churn_hand_case(spark):
    from datetime import datetime

    from autoscan_spark.operators.temporal import weekly_churn

    # Mondays: 2024-01-01, -08, -15. user 1 active w1+w2 (retained in
    # w1, churned in w2? -> w2 is not last... w3 = -15 is the corpus max
    # week and must be EXCLUDED). user 2 active w1 only -> churned in w1.
    # user 3 active w1 and w3 (skips w2) -> churned in w1 despite
    # returning later.
    rows = [
        (1, datetime(2024, 1, 2, 10)), (1, datetime(2024, 1, 9, 10)),
        (2, datetime(2024, 1, 3, 11)),
        (3, datetime(2024, 1, 4, 12)), (3, datetime(2024, 1, 16, 9)),
        (4, datetime(2024, 1, 15, 8)),  # only in the excluded max week
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"])
    ).repartition(2)
    out = {r["week"]: r for r in weekly_churn(df).collect()}
    assert set(out) == {"2024-01-01", "2024-01-08"}
    w1 = out["2024-01-01"]
    assert (w1["n_active"], w1["n_churned"]) == (3, 2)  # users 2 and 3
    assert w1["churn_ppm"] == 666666
    w2 = out["2024-01-08"]
    assert (w2["n_active"], w2["n_churned"]) == (1, 1)  # user 1 leaves
