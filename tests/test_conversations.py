"""Conversation-level training-data ops: chat-template rendering and
SFT (context, response) pair extraction."""

import pandas as pd
import pytest

TURNS = [
    ("c1", 1, "user", "hello"),
    ("c1", 2, "assistant", "hi there"),
    ("c1", 3, "user", "how are you"),
    ("c1", 4, "assistant", "great"),
    ("c2", 1, "assistant", "unprompted opener"),
    ("c2", 2, "user", "ok"),
]


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(TURNS, columns=["conv_id", "turn_idx", "role", "text"])
    ).repartition(3)


def test_chatml_render_order_and_markers(spark):
    from autoscan_spark.operators.conversations import render_chat_template

    out = {
        r["conv_id"]: r
        for r in render_chat_template(_df(spark)).collect()
    }
    assert out["c1"]["n_turns"] == 4
    assert out["c1"]["training_text"] == (
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\nhi there<|im_end|>\n"
        "<|im_start|>user\nhow are you<|im_end|>\n"
        "<|im_start|>assistant\ngreat<|im_end|>\n"
    )
    assert out["c2"]["training_text"].startswith("<|im_start|>assistant\n")


def test_colon_template_and_invalid(spark):
    from autoscan_spark.operators.conversations import render_chat_template

    out = {
        r["conv_id"]: r["training_text"]
        for r in render_chat_template(_df(spark), template="colon").collect()
    }
    assert out["c1"] == (
        "user: hello\nassistant: hi there\n"
        "user: how are you\nassistant: great\n"
    )
    with pytest.raises(ValueError, match="template"):
        render_chat_template(_df(spark), template="alpaca")


def test_sft_pairs_contexts(spark):
    from autoscan_spark.operators.conversations import sft_pairs

    rows = {
        (r["conv_id"], r["turn_idx"]): (r["context"], r["response"])
        for r in sft_pairs(_df(spark)).collect()
    }
    assert set(rows) == {("c1", 2), ("c1", 4), ("c2", 1)}
    assert rows[("c1", 2)] == ("user: hello", "hi there")
    assert rows[("c1", 4)] == (
        "user: hello\nassistant: hi there\nuser: how are you",
        "great",
    )
    # assistant opener: empty (not NULL) context
    assert rows[("c2", 1)] == ("", "unprompted opener")


def test_conversation_ops_shuffle_budget(spark, sf_dir):
    """Plan pins: chat-template rendering is ONE shuffle (the conv groupBy,
    no sort — array_sort orders within the aggregate); SFT pairs are ONE
    shuffle + its window sort; span removal stays at three wide exchanges
    (window-hash tag, covered-distinct, anti-join/reassembly with AQE
    reuse). Regressions here mean an operator grew a corpus-wide shuffle."""
    from autoscan_spark.plans.driver_queries import (
        q_chat_template,
        q_remove_spans,
        q_sft_pairs,
    )

    def shape(q):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning"), plan.count("Sort [")

    assert shape(q_chat_template) == (1, 0)
    assert shape(q_sft_pairs) == (1, 1)
    ex, _ = shape(q_remove_spans)
    assert ex <= 3


def test_conversations_weird_column_names(spark):
    from autoscan_spark.operators.conversations import (
        render_chat_template,
        sft_pairs,
    )

    df = (
        _df(spark)
        .withColumnRenamed("conv_id", "conv id`x")
        .withColumnRenamed("text", "the'text")
    )
    out = render_chat_template(
        df, conv_col="conv id`x", text_col="the'text"
    ).collect()
    assert {r["n_turns"] for r in out} == {4, 2}
    pairs = sft_pairs(df, conv_col="conv id`x", text_col="the'text").collect()
    assert len(pairs) == 3


def test_response_echo_counts(spark):
    """Echo metric against hand-computed 3-gram sets: a response that
    copies context words scores high ppm; a fresh response scores 0; a
    short (<3-word) response falls back to the whole-text shingle."""
    from autoscan_spark.operators.conversations import response_echo

    turns = [
        ("e1", 1, "user", "alpha beta gamma delta"),
        ("e1", 2, "assistant", "alpha beta gamma delta"),  # pure echo
        ("e2", 1, "user", "one two three four"),
        ("e2", 2, "assistant", "five six seven eight"),  # no overlap
        ("e3", 1, "user", "tiny"),
        ("e3", 2, "assistant", "ok"),  # <3 words: single whole shingle
    ]
    df = spark.createDataFrame(
        pd.DataFrame(turns, columns=["conv_id", "turn_idx", "role", "text"])
    ).repartition(3)
    out = {r["conv_id"]: r for r in response_echo(df).collect()}
    # e1 response: 3-grams {'alpha beta gamma','beta gamma delta'}; the
    # context is 'user: alpha beta gamma delta' whose 3-gram set contains
    # 'alpha beta gamma' and 'beta gamma delta' (split on whitespace keeps
    # 'user:' as a token) — both echoed
    assert out["e1"]["n_resp_ngrams"] == 2
    assert out["e1"]["n_echoed"] == 2
    assert out["e1"]["echo_ppm"] == 1_000_000
    assert out["e2"]["n_echoed"] == 0
    assert out["e2"]["echo_ppm"] == 0
    assert out["e3"]["n_resp_ngrams"] == 1  # whole-text fallback shingle
    assert out["e3"]["n_echoed"] == 0


def test_preference_pairs_ranking_and_min_group(spark):
    """Chosen = highest alpha-ppm score (ties → lowest turn); rejected =
    lowest score (ties → highest turn); single-response conversations
    emit nothing."""
    from autoscan_spark.operators.conversations import preference_pairs

    turns = [
        # p1: clean text beats digit-ridden text
        ("p1", 1, "user", "q"),
        ("p1", 2, "assistant", "all alpha words here"),        # 1_000_000
        ("p1", 3, "assistant", "numbers 123 456 789"),         # 250_000
        # p2: all responses tie → chosen = first turn, rejected = last
        ("p2", 1, "assistant", "same clean score"),
        ("p2", 2, "assistant", "also clean text"),
        ("p2", 3, "assistant", "more clean text"),
        # p3: single assistant turn → no pair
        ("p3", 1, "assistant", "alone"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(turns, columns=["conv_id", "turn_idx", "role", "text"])
    ).repartition(3)
    out = {r["conv_id"]: r for r in preference_pairs(df).collect()}
    assert set(out) == {"p1", "p2"}
    assert out["p1"]["chosen_turn"] == 2
    assert out["p1"]["rejected_turn"] == 3
    assert out["p1"]["chosen_score_ppm"] == 1_000_000
    assert out["p1"]["rejected_score_ppm"] == 250_000
    assert out["p1"]["chosen_response"] == "all alpha words here"
    assert out["p2"]["chosen_turn"] == 1
    assert out["p2"]["rejected_turn"] == 3
    assert out["p2"]["chosen_score_ppm"] == out["p2"]["rejected_score_ppm"]


def test_long_response_no_ansi_overflow(spark):
    """A response with >= 2148 distinct 3-grams (echo) or >= 2148
    alphabetic words (preference score) used to throw ARITHMETIC_OVERFLOW
    under Spark 4's default ANSI mode: the ppm numerator was INT*INT and
    1e6 * 2148 > 2^31. The multiply now promotes to BIGINT first; pin the
    exact ppm on a long fully-echoed response so the regression can't
    silently come back as a negative wrap with ANSI off."""
    import itertools
    import string

    from autoscan_spark.operators.conversations import (
        preference_pairs,
        response_echo,
    )

    long_words = [
        "".join(p)
        for p in itertools.islice(
            itertools.product(string.ascii_lowercase, repeat=3), 2500
        )
    ]
    long_text = " ".join(long_words)
    turns = [
        ("c1", 1, "user", long_text),  # context fully contains the response
        ("c1", 2, "assistant", long_text),
        ("c1", 3, "assistant", "short clean reply"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(turns, columns=["conv_id", "turn_idx", "role", "text"])
    ).repartition(2)
    echo = {r["turn_idx"]: r for r in response_echo(df).collect()}
    # 2500 words -> 2498 distinct 3-grams, all present in the context
    assert echo[2]["n_resp_ngrams"] == 2498
    assert echo[2]["n_echoed"] == 2498
    assert echo[2]["echo_ppm"] == 1_000_000
    pref = preference_pairs(df).collect()[0]
    # both responses are fully alphabetic -> both score exactly 1e6 ppm
    assert pref["chosen_score_ppm"] == 1_000_000
    assert pref["rejected_score_ppm"] == 1_000_000
    assert pref["chosen_turn"] == 2 and pref["rejected_turn"] == 3


def test_new_conversation_ops_shuffle_budget(spark, sf_dir):
    """response_echo inherits sft_pairs' single window shuffle;
    preference_pairs is one groupBy-conv shuffle, no window sort, no
    join."""
    from autoscan_spark.plans.driver_queries import (
        q_preference_pairs,
        q_response_echo,
    )

    def shape(q):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning"), plan.count("SortMergeJoin")

    assert shape(q_response_echo) == (1, 0)
    assert shape(q_preference_pairs) == (1, 0)


def test_hoist_column_collision_rejected(spark):
    """Operators that add fixed internal hoist columns must fail fast when
    the input already carries one of those names (same contract as
    classify.score_quality's reserved-column check) instead of producing
    an ambiguous-column error or silently wrong shingles."""
    from autoscan_spark.operators.conversations import (
        preference_pairs,
        response_echo,
    )
    from autoscan_spark.operators.dedup import word_shingles

    base = spark.createDataFrame(
        [("c1", 0, "user", "hi there friend")],
        "conv_id string, turn_idx int, role string, text string",
    )
    with pytest.raises(ValueError, match="__rg.*response_echo"):
        response_echo(base.withColumnRenamed("conv_id", "__rg"), conv_col="__rg")
    with pytest.raises(ValueError, match="__s.*preference_pairs"):
        preference_pairs(base.withColumnRenamed("conv_id", "__s"), conv_col="__s")
    docs = spark.createDataFrame(
        [(1, "a b c d", 0)], "doc_id long, text string, __ws_hoist int"
    )
    with pytest.raises(ValueError, match="__ws_hoist.*word_shingles"):
        word_shingles(docs)


def test_dedup_prompts_survivor_and_counts(spark):
    from autoscan_spark.operators.conversations import dedup_prompts

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "How do I sort a list?"),
            ("c1", 1, "assistant", "Use sorted()."),
            ("c2", 0, "user", "  how do I   sort a LIST? "),  # same normalized
            ("c2", 1, "assistant", "sorted()"),
            ("c3", 0, "user", "What is Spark?"),
            ("c0", 5, "user", "how do i sort a list?"),  # earliest conv wins
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {r["prompt"]: r for r in dedup_prompts(df).collect()}
    assert len(out) == 2
    sort_row = [r for r in out.values() if "sort" in r["prompt"].lower()][0]
    assert (sort_row["conv_id"], sort_row["turn_idx"]) == ("c0", 5)
    assert sort_row["n_dupes"] == 3
    spark_row = out["What is Spark?"]
    assert spark_row["n_dupes"] == 1


def test_conversation_hygiene_flags(spark):
    from autoscan_spark.operators.conversations import conversation_hygiene

    turns = [
        # clean: user-first, assistant-last, strict alternation
        ("ok", 1, "user", "q1"), ("ok", 2, "assistant", "a1"),
        # double-user run + assistant-first + user-last
        ("bad", 1, "assistant", "opener"),
        ("bad", 2, "user", "q"), ("bad", 3, "user", "q again"),
        ("bad", 4, "assistant", "a"), ("bad", 5, "user", "trailing"),
        # single-turn user-only conv: no repeats but wrong envelope tail
        ("solo", 1, "user", "just me"),
    ]
    df = spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string"
    ).repartition(3)
    out = {r["conv_id"]: r for r in conversation_hygiene(df).collect()}
    ok, bad, solo = out["ok"], out["bad"], out["solo"]
    assert (ok["n_turns"], ok["n_role_repeats"]) == (2, 0)
    assert ok["starts_with_user"] and ok["ends_with_assistant"] and ok["is_clean"]
    assert (bad["n_turns"], bad["n_role_repeats"]) == (5, 1)
    assert not bad["starts_with_user"] and not bad["ends_with_assistant"]
    assert not bad["is_clean"]
    assert (solo["n_role_repeats"], solo["starts_with_user"]) == (0, True)
    assert not solo["ends_with_assistant"] and not solo["is_clean"]


def test_trim_context_suffix_budget(spark):
    from autoscan_spark.operators.conversations import trim_context

    turns = [
        # tokens per turn: 3, 2, 4, 1 — budget 5 keeps suffix (4, 1)? no:
        # revcum from end: t4=1, t3=5, t2=7 → keep t3,t4
        ("c1", 1, "user", "one two three"),
        ("c1", 2, "assistant", "four five"),
        ("c1", 3, "user", "a b c d"),
        ("c1", 4, "assistant", "z"),
        # single oversize turn still survives (most-recent guarantee)
        ("c2", 1, "user", "w1 w2 w3 w4 w5 w6 w7 w8"),
        # whitespace-only turn counts zero tokens
        ("c3", 1, "user", "   "),
        ("c3", 2, "assistant", "yes"),
    ]
    df = spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string"
    ).repartition(3)
    out = trim_context(df, 5).collect()
    kept = sorted((r["conv_id"], r["turn_idx"]) for r in out)
    assert kept == [("c1", 3), ("c1", 4), ("c2", 1), ("c3", 1), ("c3", 2)]
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in out}
    assert by_key[("c1", 3)]["suffix_tokens"] == 5
    assert by_key[("c1", 4)]["suffix_tokens"] == 1
    assert by_key[("c2", 1)]["suffix_tokens"] == 8  # over budget, rd=1 keeps it
    assert by_key[("c3", 1)]["n_tokens"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_tokens"):
        trim_context(df, -1)


def test_hygiene_trim_shuffle_budget(spark, sf_dir):
    """Both new ops key every window/agg on the conversation, so each
    whole query plan carries exactly ONE hash exchange and no join."""
    from autoscan_spark.plans.driver_queries import q_context_trim, q_conv_hygiene

    def shape(q):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning"), plan.count("Join")

    assert shape(q_conv_hygiene) == (1, 0)
    assert shape(q_context_trim) == (1, 0)


def test_turn_redundancy_consecutive_assistant_overlap(spark):
    from autoscan_spark.operators.conversations import turn_redundancy

    df = spark.createDataFrame(
        [
            ("c1", 1, "user", "question one"),
            ("c1", 2, "assistant", "alpha beta gamma delta"),
            ("c1", 3, "user", "question two"),
            ("c1", 4, "assistant", "alpha beta gamma epsilon"),
            ("c2", 1, "assistant", "lone answer no predecessor"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    rows = {(r.conv_id, r.turn_idx): r for r in turn_redundancy(df, n=2).collect()}
    # only c1 turn 4 has a previous assistant turn
    assert set(rows) == {("c1", 4)}
    r = rows[("c1", 4)]
    # 2-grams of turn4: {alpha beta, beta gamma, gamma epsilon}; overlap 2
    assert (r.n_grams, r.n_overlap, r.redund_ppm) == (3, 2, 666666)


def test_turn_redundancy_ansi_overflow_guard(spark):
    """Long responses (>2148 distinct 2-grams) must not overflow."""
    from autoscan_spark.operators.conversations import turn_redundancy

    long_text = " ".join(f"t{i}" for i in range(2500))
    df = spark.createDataFrame(
        [("c", 1, "assistant", long_text), ("c", 2, "assistant", long_text)],
        "conv_id string, turn_idx int, role string, text string",
    )
    r = turn_redundancy(df, n=2).collect()[0]
    assert r.redund_ppm == 1000000 and r.n_grams == 2499


def test_merge_adjacent_turns_runs_collapse(spark):
    """Gaps-and-islands merge: same-role runs collapse to one turn keeping
    the first turn_idx, newline-joined text in turn order, and the run
    length; alternating turns pass through unchanged."""
    from autoscan_spark.operators.conversations import merge_adjacent_turns

    rows = [
        ("c1", 1, "user", "a"),
        ("c1", 2, "user", "b"),
        ("c1", 3, "assistant", "c"),
        ("c1", 4, "user", "d"),
        ("c1", 5, "user", "e"),
        ("c1", 6, "user", "f"),
        ("c2", 1, "assistant", "solo"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    ).repartition(3)
    got = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.n_merged)
        for r in merge_adjacent_turns(df).collect()
    }
    assert got == {
        ("c1", 1): ("user", "a\nb", 2),
        ("c1", 3): ("assistant", "c", 1),
        ("c1", 4): ("user", "d\ne\nf", 3),
        ("c2", 1): ("assistant", "solo", 1),
    }
    # custom separator
    sep = {
        r.turn_idx: r.text
        for r in merge_adjacent_turns(df, sep=" | ").collect()
        if r.conv_id == "c1"
    }
    assert sep[4] == "d | e | f"


def test_merge_adjacent_turns_rejects_reserved(spark):
    from autoscan_spark.operators.conversations import merge_adjacent_turns

    d = _df(spark)
    with pytest.raises(ValueError, match="__run"):
        merge_adjacent_turns(d.withColumn("__run", d.turn_idx))


def test_refusal_stats_flags_stems_and_ppm(spark):
    from autoscan_spark.operators.conversations import refusal_stats

    rows = [
        ("r1", 1, "user", "please help"),
        ("r1", 2, "assistant", "I cannot help with that request."),
        ("r1", 3, "user", "why"),
        ("r1", 4, "assistant", "Here is the answer you asked for."),
        ("r2", 1, "assistant", "AS AN AI language model I must decline."),
        ("r3", 1, "assistant", "sure, done."),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    ).repartition(2)
    out = {r["conv_id"]: r for r in refusal_stats(df).collect()}
    assert out["r1"]["n_assistant"] == 2
    assert out["r1"]["n_refusals"] == 1
    assert out["r1"]["refusal_ppm"] == 500000
    # case-insensitive stem match
    assert out["r2"]["n_refusals"] == 1 and out["r2"]["refusal_ppm"] == 1000000
    assert out["r3"]["n_refusals"] == 0 and out["r3"]["refusal_ppm"] == 0
    # user turns never counted
    assert out["r1"]["n_assistant"] + out["r2"]["n_assistant"] + out[
        "r3"
    ]["n_assistant"] == 4


def test_truncation_stats_terminal_set_and_empty(spark):
    from autoscan_spark.operators.conversations import truncation_stats

    rows = [
        ("t1", 1, "assistant", "Complete sentence."),
        ("t1", 2, "assistant", "cut off mid wor"),
        ("t1", 3, "assistant", "trailing whitespace counts as complete.   "),
        ("t2", 1, "assistant", ""),          # empty target = truncated
        ("t2", 2, "assistant", "code block`"),
        ("t3", 1, "user", "never counted,"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    ).repartition(2)
    out = {r["conv_id"]: r for r in truncation_stats(df).collect()}
    assert out["t1"]["n_assistant"] == 3
    assert out["t1"]["n_truncated"] == 1
    assert out["t1"]["truncated_ppm"] == 333333
    assert out["t2"]["n_truncated"] == 1  # only the empty one
    assert "t3" not in out  # no assistant turns -> no row


def test_tool_call_stats_counts_and_ppm(spark):
    from autoscan_spark.operators.conversations import tool_call_stats

    rows = [
        ("c1", 1, "user", "run it", None),
        ("c1", 2, "tool", "$ ls", "shell"),
        ("c1", 3, "tool", "{}", "browser"),
        ("c1", 4, "assistant", "done", ""),      # empty = not a tool turn
        ("c2", 1, "user", "hi", "   "),          # whitespace-only = none
        ("c2", 2, "assistant", "hello", None),
        ("c3", 1, "tool", "x", "shell"),
        ("c3", 2, "tool", "y", "shell "),        # trims to same tool
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    ).repartition(3)
    out = {r["conv_id"]: r for r in tool_call_stats(df).collect()}
    assert (out["c1"]["n_turns"], out["c1"]["n_tool_turns"],
            out["c1"]["n_distinct_tools"]) == (4, 2, 2)
    assert out["c1"]["first_tool"] == "browser"
    assert out["c1"]["tool_ppm"] == 500000
    assert (out["c2"]["n_tool_turns"], out["c2"]["first_tool"]) == (0, None)
    assert out["c2"]["tool_ppm"] == 0
    assert (out["c3"]["n_tool_turns"], out["c3"]["n_distinct_tools"],
            out["c3"]["tool_ppm"]) == (2, 1, 1000000)


def test_tool_call_stats_single_shuffle_plan(spark):
    from autoscan_spark.operators.conversations import tool_call_stats

    df = spark.createDataFrame(
        [("c1", 1, "tool", "x", "shell")],
        "conv_id string, turn_idx long, role string, text string, tool string",
    )
    plan = tool_call_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
