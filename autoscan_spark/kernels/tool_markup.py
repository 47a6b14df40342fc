"""Tool-output markup isolation kernel.

Tool turns (``role='tool'``) interleave prose with machine noise — fenced
JSON/log/traceback dumps. Main-content isolation keeps the prose and any
*content-bearing* fenced blocks, and drops the machine-noise blocks entirely,
mirroring the reference's "extract the content, not the chrome" behavior
(reference system prompt: autoscan/prompts.py:1-26).

Frozen spec (extractor version ``ex-v1``):

- A fenced block is a region delimited by lines starting with `````` ``` ``````;
  the opening fence may carry a language tag.
- Blocks whose tag (lowercased) is in ``NOISE_TAGS`` (json, log, logs,
  traceback, stdout, stderr, raw, hexdump) are removed, fences included.
- All other fenced blocks are kept verbatim (fences included) — e.g. code
  examples are content.
- Outside fences, text is kept as-is.
- Each maximal run of kept lines becomes one region; regions are joined with
  a blank line (``"\n\n"``) so a removed block leaves a paragraph break.
- Runs of 3+ newlines in the result collapse to exactly 2; the result is
  right-stripped and leading newlines are stripped.

Spans: one ``(start, end, 'tool_text')`` span per kept region of the ORIGINAL
payload (contiguous kept lines are merged into a single span).
"""

from __future__ import annotations

import re
from typing import List, Tuple

NOISE_TAGS = {"json", "log", "logs", "traceback", "stdout", "stderr", "raw", "hexdump"}

_COLLAPSE = re.compile(r"\n{3,}")


def extract_tool_markup(raw: str) -> Tuple[str, List[Tuple[int, int, str]]]:
    """Return ``(kept_text, spans)`` with noise fences removed."""
    lines = raw.split("\n")
    kept: List[bool] = [True] * len(lines)

    in_fence = False
    fence_is_noise = False
    fence_open_idx = -1
    for i, line in enumerate(lines):
        stripped = line.lstrip()
        if stripped.startswith("```"):
            if not in_fence:
                in_fence = True
                tag = stripped[3:].strip().lower()
                fence_is_noise = tag in NOISE_TAGS
                fence_open_idx = i
                if fence_is_noise:
                    kept[i] = False
            else:
                in_fence = False
                if fence_is_noise:
                    kept[i] = False
                fence_is_noise = False
        elif in_fence and fence_is_noise:
            kept[i] = False
    # unterminated noise fence: drop through end of payload
    if in_fence and fence_is_noise:
        for i in range(fence_open_idx, len(lines)):
            kept[i] = False

    # reconstruct text + spans over kept line runs
    runs: List[List[str]] = []
    spans: List[Tuple[int, int, str]] = []
    offset = 0
    run_start = -1
    run_end = -1
    for i, line in enumerate(lines):
        start = offset
        end = offset + len(line)
        offset = end + 1  # the '\n'
        if kept[i]:
            if run_start < 0:
                run_start = start
                runs.append([])
            run_end = end
            runs[-1].append(line)
        else:
            if run_start >= 0:
                spans.append((run_start, run_end, "tool_text"))
                run_start = -1
    if run_start >= 0:
        spans.append((run_start, min(run_end, len(raw)), "tool_text"))

    text = "\n\n".join("\n".join(run) for run in runs)
    text = _COLLAPSE.sub("\n\n", text).rstrip().lstrip("\n")
    return text, spans
