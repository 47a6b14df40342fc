"""PDF page-stream layout reassembly kernel (pdfminer-style).

Deterministic replacement for the reference's rasterize→OCR path
(reference: autoscan/image_processing.py:11-59 +
autoscan/llm_processors/img_to_md_processor.py:28-89): a turn whose payload is
a PDF-derived page stream — positioned text boxes in arbitrary emission
order — is reassembled into reading order and emitted as markdown-ish text.

Payload wire format (defined by our fixture generator; versioned):

    %PDF-STREAM v1
    <x>;<y>;<text>
    <x>;<y>;<text>
    ...

``x`` grows rightward, ``y`` grows UPWARD (PDF user space), records may appear
in any order, and one visual line may be split across several boxes.

Frozen reassembly spec (extractor version ``ex-v1``):

1. Parse records; a malformed record raises ``PdfStreamError`` (feeds the
   reference's error semantics: drop in low mode / fail-fast in high mode —
   autoscan/autoscan.py:250-255,283-289).
2. Line clustering: boxes sorted by ``-y``; boxes whose ``y`` differ by
   ≤ ``LINE_TOL`` (2.0) from the current line's anchor join that line; within
   a line boxes sort by ``x`` and join with a single space.
3. Paragraph segmentation: consecutive line gaps are measured; a gap >
   ``PARA_FACTOR`` (1.8) × the median positive gap starts a new paragraph.
4. Hyphenation repair inside a paragraph: a line ending with ``-`` whose next
   line starts with a lowercase letter merges with the hyphen dropped and no
   space; otherwise lines in a paragraph join with a single space.
5. Paragraphs join with ``"\n\n"``.

Spans: one span per emitted paragraph, ``(start, end, 'pdf_para')``, where
``start``/``end`` are the min start / max end offsets in the ORIGINAL payload
of the records that contributed to the paragraph.
"""

from __future__ import annotations

from typing import List, Tuple

HEADER = "%PDF-STREAM v1"
LINE_TOL = 2.0
PARA_FACTOR = 1.8


class PdfStreamError(ValueError):
    """Raised on a malformed page-stream payload."""


class _Box:
    __slots__ = ("x", "y", "text", "start", "end")

    def __init__(self, x: float, y: float, text: str, start: int, end: int) -> None:
        self.x, self.y, self.text, self.start, self.end = x, y, text, start, end


def _parse(raw: str) -> List[_Box]:
    lines = raw.split("\n")
    if not lines or lines[0].strip() != HEADER:
        raise PdfStreamError("missing %PDF-STREAM v1 header")
    boxes: List[_Box] = []
    offset = len(lines[0]) + 1
    for line in lines[1:]:
        start = offset
        offset += len(line) + 1
        if not line.strip():
            continue
        parts = line.split(";", 2)
        if len(parts) != 3:
            raise PdfStreamError(f"malformed record: {line[:50]!r}")
        try:
            x = float(parts[0])
            y = float(parts[1])
        except ValueError as exc:
            raise PdfStreamError(f"non-numeric coordinates: {line[:50]!r}") from exc
        boxes.append(_Box(x, y, parts[2], start, min(offset - 1, len(raw))))
    return boxes


def extract_pdf_stream(raw: str) -> Tuple[str, List[Tuple[int, int, str]]]:
    """Reassemble a page stream into reading-order text.

    Returns ``(text, spans)``; raises ``PdfStreamError`` on malformed input.
    """
    boxes = _parse(raw)
    if not boxes:
        return "", []

    # 1. cluster into visual lines (descending y = top to bottom)
    boxes.sort(key=lambda b: (-b.y, b.x))
    lines: List[List[_Box]] = []
    anchor_y: float | None = None
    for box in boxes:
        if anchor_y is None or anchor_y - box.y > LINE_TOL:
            lines.append([box])
            anchor_y = box.y
        else:
            lines[-1].append(box)
    for line in lines:
        line.sort(key=lambda b: b.x)

    # 2. paragraph segmentation by vertical gap
    line_ys = [line[0].y for line in lines]
    gaps = [line_ys[i - 1] - line_ys[i] for i in range(1, len(line_ys))]
    pos_gaps = sorted(g for g in gaps if g > 0)
    median_gap = pos_gaps[len(pos_gaps) // 2] if pos_gaps else 0.0
    para_break = [False] + [
        median_gap > 0 and g > PARA_FACTOR * median_gap for g in gaps
    ]

    # 3. emit with hyphenation repair
    paragraphs: List[str] = []
    spans: List[Tuple[int, int, str]] = []
    cur_text = ""
    cur_start, cur_end = -1, -1

    def flush() -> None:
        nonlocal cur_text, cur_start, cur_end
        if cur_text:
            paragraphs.append(cur_text)
            spans.append((cur_start, cur_end, "pdf_para"))
        cur_text, cur_start, cur_end = "", -1, -1

    for i, line in enumerate(lines):
        line_text = " ".join(b.text for b in line).strip()
        lo = min(b.start for b in line)
        hi = max(b.end for b in line)
        if para_break[i]:
            flush()
        if not cur_text:
            cur_text, cur_start, cur_end = line_text, lo, hi
        else:
            if cur_text.endswith("-") and line_text[:1].islower():
                cur_text = cur_text[:-1] + line_text
            else:
                cur_text = cur_text + " " + line_text
            cur_start = min(cur_start, lo)
            cur_end = max(cur_end, hi)
    flush()

    return "\n\n".join(paragraphs), spans
