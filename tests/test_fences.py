"""Byte-exact contract tests for strip_code_fences.

Expected values derived by hand from the reference semantics
(autoscan/utils/llm.py:1-24); each case is frozen as a literal.
"""

import pytest

from autoscan_spark.kernels.fences import strip_code_fences


CASES = [
    # (input, expected)
    ("hello", "hello"),
    ("hello   \n\t ", "hello"),
    ("```\nhello\n```", "hello"),
    ("```markdown\nhello\n```", "hello"),
    ("```md\nhello\n```", "hello"),
    # "markdown" tag checked before "md"
    ("```markdown\n# Title\n```", "# Title"),
    # language-tag path strips ALL leading whitespace after the tag
    ("```md\n    indented\n```", "indented"),
    # no-tag path strips only leading newlines, preserving indentation
    ("```\n    indented\n```", "    indented"),
    ("```\n\r\n  keep spaces\n```", "  keep spaces"),
    # not fully fenced → untouched apart from trailing strip
    ("```\nstart fence only", "```\nstart fence only"),
    ("end fence only\n```", "end fence only\n```"),
    # fences with trailing whitespace outside
    ("```\nx\n```   \n", "x"),
    # inner content ending in backticks is preserved
    ("```\ncode: ``inline``\n```", "code: ``inline``"),
    # degenerate fences
    ("```", ""),
    ("``````", ""),
    ("```x```", "x"),
    ("```md```", ""),
    ("```markdown```", ""),
    # tag-as-prefix-of-word quirk: "md" prefix is stripped even mid-word
    ("```mdx content\n```", "x content"),
    # multi-line with internal fences not at the very ends
    ("```\na\n```\nb\n```", "a\n```\nb"),
    ("", ""),
    ("   \n ", ""),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_strip_code_fences(raw, expected):
    assert strip_code_fences(raw) == expected
