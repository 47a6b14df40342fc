"""Byte-exact contract tests for the ordered document fold.

Expected values derived by hand from the reference semantics
(_join_markdown_pages, autoscan/autoscan.py:353-383).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from autoscan_spark.kernels.pagejoin import clean_page, combine_chunks, fold_chunk, join_pages


CASES = [
    ([], ""),
    (["only"], "only"),
    (["a", "b"], "a\n\nb"),
    # table continuation: prev ends '|' AND cur starts '|' → single newline
    (["| h1 | h2 |\n| 1 | 2 |", "| 3 | 4 |"], "| h1 | h2 |\n| 1 | 2 |\n| 3 | 4 |"),
    # only one side pipe-ish → double newline
    (["ends with |", "no pipe start"], "ends with |\n\nno pipe start"),
    (["no pipe end", "| starts"], "no pipe end\n\n| starts"),
    # marker scrub + rstrip happens before adjacency
    (["row |---PAGE BREAK---  ", "| next"], "row |\n| next"),
    # empty pages removed BEFORE adjacency: a|b where middle vanishes
    (["| a |", "   \n  ", "| b |"], "| a |\n| b |"),
    (["", "x", ""], "x"),
    (["---PAGE BREAK---", "x"], "x"),
    (["  \n ", "\t"], ""),
    # rstrip only (leading whitespace preserved)
    (["  indented", "next"], "  indented\n\nnext"),
    # marker in the middle of a page
    (["before ---PAGE BREAK--- after", "z"], "before  after\n\nz"),
]


@pytest.mark.parametrize("pages,expected", CASES)
def test_join_pages(pages, expected):
    assert join_pages(pages) == expected


def test_clean_page():
    assert clean_page("x ---PAGE BREAK--- y  \n") == "x  y"
    assert clean_page("---PAGE BREAK---") == ""


page_strategy = st.text(
    alphabet=st.sampled_from(list("ab|#- \n\t")), max_size=24
) | st.just("---PAGE BREAK---") | st.just("| a |\n|---|\n| 1 |")


@settings(max_examples=300, deadline=None)
@given(st.lists(page_strategy, max_size=30), st.integers(min_value=1, max_value=7))
def test_two_phase_fold_equivalent(pages, chunk_size):
    """The distributed two-level fold must equal the flat fold for any input."""
    chunks = [
        fold_chunk(pages[i : i + chunk_size]) for i in range(0, len(pages), chunk_size)
    ]
    assert combine_chunks(chunks) == join_pages(pages)
