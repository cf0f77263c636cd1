"""html-arm extraction kernel (DeepSeek-OCR analog, SURVEY §7.0).

Replaces the reference's vision-LLM OCR (reference:
backends/deepseek-ocr/deepseek_ocr_backend.py:413-457, replaced per SURVEY
§2.4 M7) with a deterministic CPU DOM walk: stdlib ``html.parser`` tree
traversal with boilerpipe/readability-style heuristics — semantic boilerplate
containers (nav/header/footer/aside) are dropped, as is any text block whose
link density (anchor-text chars / total chars) exceeds a threshold. Content
blocks are attributed to their enclosing page container (``div[data-page]``),
preserving document order.

The kernel is a pure function ``bytes -> list[(page_1idx, [block_text])]``;
the Spark layer runs it inside Arrow-batched ``mapInPandas`` (no per-row
Python at the DataFrame level).
"""

from __future__ import annotations

from html.parser import HTMLParser

BOILERPLATE_TAGS = {"nav", "header", "footer", "aside", "script", "style"}
BLOCK_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote"}
LINK_DENSITY_MAX = 0.5


class _Block:
    __slots__ = ("page", "text_parts", "anchor_chars")

    def __init__(self, page: int):
        self.page = page
        self.text_parts: list[str] = []
        self.anchor_chars = 0

    @property
    def text(self) -> str:
        return "".join(self.text_parts)

    @property
    def link_density(self) -> float:
        total = len(self.text)
        return self.anchor_chars / total if total else 1.0


class _ContentParser(HTMLParser):
    """Single-pass DOM walk collecting candidate text blocks per page."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.boiler_depth = 0
        self.anchor_depth = 0
        self.current_page = 1
        self.page_stack: list[int] = []
        self.block: _Block | None = None
        self.blocks: list[_Block] = []

    def _finish_block(self):
        blk = self.block
        self.block = None
        if blk is not None and blk.text.strip() and blk.link_density < LINK_DENSITY_MAX:
            self.blocks.append(blk)

    def handle_starttag(self, tag, attrs):
        if tag in BOILERPLATE_TAGS:
            # an unclosed block before boilerplate chrome ends implicitly
            self._finish_block()
            self.boiler_depth += 1
        if tag == "a":
            self.anchor_depth += 1
        if tag == "div":
            # EVERY div pushes (a no-op restore for plain divs): the end-tag
            # handler pops per </div>, so pushing only for page containers
            # would let a nested plain div's close prematurely restore the
            # OUTER page and mis-attribute the rest of the container
            self.page_stack.append(self.current_page)
            attr_map = dict(attrs)
            page = attr_map.get("data-page")
            if page is not None and page.isdigit():
                self.current_page = int(page)
        if tag in BLOCK_TAGS and self.boiler_depth == 0:
            # browsers close an open paragraph when a new block begins —
            # real-world HTML routinely omits </p>/</li>
            self._finish_block()
            self.block = _Block(self.current_page)

    def handle_endtag(self, tag):
        if tag in BOILERPLATE_TAGS and self.boiler_depth > 0:
            self.boiler_depth -= 1
        if tag == "a" and self.anchor_depth > 0:
            self.anchor_depth -= 1
        if tag == "div" and self.page_stack:
            self.current_page = self.page_stack.pop()
        if tag in BLOCK_TAGS:
            self._finish_block()

    def close(self):
        super().close()
        self._finish_block()  # flush a block left open at document end

    def handle_data(self, data):
        if self.block is not None and self.boiler_depth == 0:
            self.block.text_parts.append(data)
            if self.anchor_depth > 0:
                self.block.anchor_chars += len(data)


def extract_html_pages(payload: bytes) -> list[tuple[int, list[str]]]:
    """Parse an HTML payload into ordered (page, [block_text]) groups.

    Raises ValueError with a deterministic message when no content block
    survives the boilerplate heuristics (truncated/malformed documents) — the
    error path the reference reaches when its backend yields nothing
    (reference: mineru_backend.py:351 "No inference results from Mineru").
    """
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        raise ValueError("document payload is not valid utf-8")
    parser = _ContentParser()
    parser.feed(text)
    parser.close()
    if not parser.blocks:
        raise ValueError("no text blocks detected in document")
    pages: dict[int, list[str]] = {}
    for blk in parser.blocks:
        pages.setdefault(blk.page, []).append(blk.text)
    return sorted(pages.items())
