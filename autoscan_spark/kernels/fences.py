"""Code-fence stripping — byte-exact contract with the reference.

Semantics mirror ``strip_code_fences`` (reference: autoscan/utils/llm.py:1-24),
which the reference applies to every per-page model output
(autoscan/llm_processors/base_llm_processor.py:113 with
``is_strip_code_fences=True``). Contract, in order:

1. Trailing whitespace is removed unconditionally.
2. If (and only if) the remaining string both starts AND ends with ```````,
   the enclosing fences are removed.
3. After fence removal, trailing whitespace is removed again.
4. If the inner content then begins with a language tag — ``markdown`` checked
   before ``md`` — the tag is removed and ALL leading whitespace after the tag
   is stripped.
5. If no language tag is present, only leading newlines (``\n`` and ``\r``)
   are stripped, preserving leading spaces/tabs (i.e. indentation of the
   first content line survives).
6. A string that is not fully fenced is returned untouched apart from step 1.
"""

_LANG_TAGS = ("markdown", "md")  # longer tag first: "markdown" wins over "md"
_FENCE = "```"


def strip_code_fences(content: str) -> str:
    """Remove an enclosing triple-backtick fence (and optional language tag)
    when the entire string is fenced; preserve internal indentation."""
    content = content.rstrip()
    if not (content.startswith(_FENCE) and content.endswith(_FENCE)):
        return content

    inner = content[len(_FENCE):]
    if inner.endswith(_FENCE):
        inner = inner[: -len(_FENCE)]
    inner = inner.rstrip()

    for tag in _LANG_TAGS:
        if inner.startswith(tag):
            # Language tag line: drop the tag, then strip all leading
            # whitespace (the newline after the tag plus any indentation of
            # the tag line itself).
            return inner[len(tag):].lstrip()

    # No language tag: strip only leading newlines so that a first content
    # line that is intentionally indented keeps its spaces/tabs.
    return inner.lstrip("\n\r")
