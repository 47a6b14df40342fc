"""Differential tests for the Myers bit-parallel batch Levenshtein kernel
(kernels/editdist.py) against a reference DP implementation and, at the
integration level, against Spark's ``F.levenshtein`` (the JVM source of
truth the fuzzy-dup operator previously called per pair)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from autoscan_spark.kernels.editdist import batch_levenshtein


def _dp_lev(a: str, b: str) -> int:
    """Textbook O(mn) reference."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_edge_cases():
    a = ["", "", "abc", "abc", "abc", None, "abc", "a" * 64, "a" * 65]
    b = ["", "xy", "", "abc", "axc", "abc", None, "a" * 64 + "b", "a" * 130]
    got = batch_levenshtein(a, b)
    want = [-1 if (x is None or y is None) else _dp_lev(x, y)
            for x, y in zip(a, b)]
    assert got.tolist() == want


@pytest.mark.parametrize("alpha,maxlen", [
    ("ab", 10),            # tiny alphabet, short: dense edit interactions
    ("abcdefgh ", 200),    # word-ish strings crossing the 64/128 boundary
    ("abc", 400),          # multi-block (up to 7 blocks)
])
def test_random_differential(alpha, maxlen):
    rng = random.Random(hash((alpha, maxlen)) & 0xFFFF)
    a_list, b_list = [], []
    for _ in range(300):
        la, lb = rng.randrange(maxlen + 1), rng.randrange(maxlen + 1)
        a_list.append("".join(rng.choice(alpha) for _ in range(la)))
        b_list.append("".join(rng.choice(alpha) for _ in range(lb)))
    got = batch_levenshtein(a_list, b_list)
    for i, (x, y) in enumerate(zip(a_list, b_list)):
        assert got[i] == _dp_lev(x, y), (i, x[:40], y[:40])


def test_near_duplicate_mutations():
    """The fuzzy-dup regime: long base strings with few localized edits —
    exact distances at and around the operator's k=64 threshold."""
    rng = random.Random(99)
    alpha = "abcdefghij "
    base = "".join(rng.choice(alpha) for _ in range(300))
    a_list, b_list, want = [], [], []
    for n_edits in (0, 1, 7, 33, 64, 65, 100):
        s = list(base)
        for _ in range(n_edits):
            op = rng.choice("ins del sub".split())
            i = rng.randrange(len(s))
            if op == "ins":
                s.insert(i, rng.choice(alpha))
            elif op == "del":
                del s[i]
            else:
                s[i] = rng.choice(alpha)
        t = "".join(s)
        a_list.append(base)
        b_list.append(t)
        want.append(_dp_lev(base, t))
    got = batch_levenshtein(a_list, b_list)
    assert got.tolist() == want


def test_unicode_codepoints():
    a = ["café", "你好世界", "a\U0001F600b"]
    b = ["cafe", "你好", "ab"]
    got = batch_levenshtein(a, b)
    assert got.tolist() == [_dp_lev(x, y) for x, y in zip(a, b)]


def test_block_boundaries_exhaustive():
    """Lengths straddling every 64-bit block boundary up to 4 blocks."""
    rng = random.Random(5)
    alpha = "xyz"
    a_list, b_list = [], []
    for m in (1, 63, 64, 65, 127, 128, 129, 191, 192, 193, 255, 256, 257):
        a = "".join(rng.choice(alpha) for _ in range(m))
        for dn in (-2, 0, 3):
            nl = max(0, m + dn)
            b = "".join(rng.choice(alpha) for _ in range(nl))
            a_list.append(a)
            b_list.append(b)
    got = batch_levenshtein(a_list, b_list)
    for i, (x, y) in enumerate(zip(a_list, b_list)):
        assert got[i] == _dp_lev(x, y), (i, len(x), len(y))


def test_numpy_matches_spark_levenshtein(spark):
    """Integration source-of-truth check: the kernel must agree with the
    JVM ``levenshtein`` on real corpus text pairs."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "text").limit(60).collect()
    texts = [r["text"] for r in rows]
    a_list = [texts[i] for i in range(len(texts)) for j in range(i + 1, min(i + 4, len(texts)))]
    b_list = [texts[j] for i in range(len(texts)) for j in range(i + 1, min(i + 4, len(texts)))]
    got = batch_levenshtein(a_list, b_list)
    pdf = spark.createDataFrame(
        [(x, y) for x, y in zip(a_list, b_list)], ["a", "b"]
    ).withColumn("lev", F.levenshtein("a", "b"))
    want = [r["lev"] for r in pdf.collect()]
    assert got.tolist() == want


@pytest.mark.parametrize("k", [1, 3, 17, 63, 64, 65, 128, 200])
def test_banded_matches_exact_within_k(k):
    """max_distance=k: exact for true distance <= k, strictly > k otherwise
    (the thresholding contract), fuzzed across block boundaries."""
    rng = random.Random(1000 + k)
    alphabet = "abcdefg"
    cases = []
    for _ in range(300):
        n = rng.choice([0, 1, 5, 63, 64, 65, 127, 128, 129, 200, 300, 321])
        base = "".join(rng.choice(alphabet) for _ in range(n))
        # mutated sibling at a controlled distance scale
        n_edits = rng.choice([0, 1, k // 2 + 1, k, k + 1, k + 40, n])
        other = list(base)
        for _ in range(n_edits):
            op = rng.randrange(3)
            pos = rng.randrange(len(other) + 1) if other else 0
            if op == 0 and other:
                other.pop(pos % len(other))
            elif op == 1:
                other.insert(pos, rng.choice(alphabet))
            elif other:
                other[pos % len(other)] = rng.choice(alphabet)
        cases.append((base, "".join(other)))
        # plus a totally unrelated pair (often far beyond k)
        m = rng.choice([0, 2, 70, 180, 400])
        cases.append((base, "".join(rng.choice(alphabet) for _ in range(m))))
    a = [c[0] for c in cases]
    b = [c[1] for c in cases]
    banded = batch_levenshtein(a, b, max_distance=k)
    exact = batch_levenshtein(a, b)
    for i, (x, y) in enumerate(cases):
        true = exact[i]
        if true <= k:
            assert banded[i] == true, (k, i, len(x), len(y), banded[i], true)
        else:
            assert banded[i] > k, (k, i, len(x), len(y), banded[i], true)


def test_banded_none_sides_and_k_zero_like():
    got = batch_levenshtein(["abc", None, ""], ["abd", "x", "yy"], max_distance=1)
    assert got[0] == 1
    assert got[1] == -1
    assert got[2] == 2  # empty pattern short-circuit is band-independent
