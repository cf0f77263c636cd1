"""layout-arm extraction kernel (MinerU analog, SURVEY §7.0 / §2.4 M9).

Replaces the reference's MinerU layout-analysis pipeline (reference:
backends/mineru/mineru_backend.py:260-354: doc_analyze → middle_json →
union_make markdown) with deterministic CPU layout parsing over a PDF
stand-in format ("PAGEDOC": a JSON layout tree of positioned text blocks —
real PDF decode libs are not in this container, so the payload format is the
documented synthetic stand-in; the Spark-side plumbing is real).

Steps mirror the reference pipeline's observable semantics:
1. block detection   — parse the layout tree, drop margin boilerplate
                       (header/footer bands by position, the layout-analysis
                       equivalent of boilerplate stripping);
2. reading-order sort — (y-band, x, stored-index), the 2D reading-order
                       contract of SURVEY §2.4 M6;
3. markdown assembly — blocks joined with blank lines (union_make "MM_MD"
                       analog, mineru_backend.py:331-333).
"""

from __future__ import annotations

import json

PAGEDOC_MAGIC = "PAGEDOC1\n"
# Margin bands treated as running header/footer chrome.
HEADER_BAND = 60
FOOTER_BAND = 50
# Vertical quantization for the reading-order sort: blocks whose y differ by
# less than this land in the same visual row and are ordered left-to-right.
ROW_BAND = 40


def extract_pagedoc_pages(payload: bytes) -> list[tuple[int, list[str]]]:
    """Parse a PAGEDOC payload into ordered (page, [block_text]) groups.

    Raises ValueError with deterministic messages on malformed payloads
    (missing magic, truncated JSON) — surfaced by the caller as the
    reference's "OCR/PDF processing failed: ..." error rows.
    """
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        raise ValueError("document payload is not valid utf-8")
    if not text.startswith(PAGEDOC_MAGIC):
        raise ValueError("invalid PAGEDOC payload: bad magic")
    try:
        doc = json.loads(text[len(PAGEDOC_MAGIC):])
    except json.JSONDecodeError:
        raise ValueError("invalid PAGEDOC payload: truncated layout tree")
    pages_out: list[tuple[int, list[str]]] = []
    for page in doc.get("pages", []):
        page_no = int(page["page"])
        height = int(page.get("height", 2000))
        kept = []
        for idx, blk in enumerate(page.get("blocks", [])):
            y = int(blk["y"])
            h = int(blk.get("h", 0))
            if y < HEADER_BAND or y + h > height - FOOTER_BAND:
                continue  # margin chrome: running header/footer
            kept.append((y // ROW_BAND, int(blk["x"]), idx, str(blk["text"])))
        kept.sort(key=lambda t: (t[0], t[1], t[2]))
        pages_out.append((page_no, [t[3] for t in kept]))
    if not any(texts for _, texts in pages_out):
        raise ValueError("No inference results from layout analysis")
    pages_out.sort(key=lambda p: p[0])
    return pages_out
