"""Golden unit tests for the byte-identity-critical post-processing kernels
(SURVEY §2.5 P1-P6, §2.4 M8, §2.3 D2/D3; FIXTURES.md §3).

Every expected string below is derived from the reference's exact semantics
(file:line cited in the implementation docstrings); these are the locks that
§7.3 says must land before touching scale.
"""

from __future__ import annotations

import pytest

from ocr_project_spark.functions.markers import (
    assemble_pages,
    count_tiles,
    denormalize_box,
    extract_markdown,
    make_span_marker,
    ngram_window_banned,
    page_separator,
    parse_spans,
    select_pages_exact,
    select_pages_range,
    strip_end_of_text,
    suppress_repeats,
    tiling_plan,
)


# --- P1 ---------------------------------------------------------------------
def test_strip_end_of_text():
    assert strip_end_of_text("hello<|endoftext|>") == "hello"
    assert strip_end_of_text("a<|endoftext|>b<|endoftext|>") == "ab"
    assert strip_end_of_text("plain") == "plain"


# --- P2: markdown extraction (deepseek_ocr_backend.py:471-497) --------------
def test_extract_markdown_basic():
    raw = "<|ref|>Title<|/ref|><|det|>[[1,2,3,4]]<|/det|><|ref|>Body<|/ref|>"
    assert extract_markdown(raw) == "Title\n\nBody"


def test_extract_markdown_drops_image_refs():
    raw = "<|ref|>image 1<|/ref|><|det|>[[1,2,3,4]]<|/det|><|ref|>kept<|/ref|>"
    assert extract_markdown(raw) == "kept"


def test_extract_markdown_collapses_blank_runs():
    raw = "<|ref|>a\n\n\n\nb<|/ref|>"
    assert extract_markdown(raw) == "a\n\nb"


def test_extract_markdown_empty_sentinel():
    # markers present but nothing survives → the exact reference sentinel
    assert (
        extract_markdown("<|ref|>image only<|/ref|>")
        == "No text extracted from OCR output"
    )
    # a fully empty raw output returns "" (the reference never reaches the
    # sentinel without markers — it returns early on empty content)
    assert extract_markdown("") == ""


def test_extract_markdown_dotall_spans_newlines():
    raw = "<|ref|>line1\nline2<|/ref|>"
    assert extract_markdown(raw) == "line1\nline2"


# --- P3: span parse (deepseek_ocr_backend.py:517-543) -----------------------
def test_parse_spans_basic():
    raw = "<|ref|>Title<|/ref|><|det|>[[10, 20, 30, 40]]<|/det|>"
    assert parse_spans(raw) == [("Title", 10, 20, 30, 40)]


def test_parse_spans_requires_double_bracket_and_four_ints():
    assert parse_spans("<|ref|>x<|/ref|><|det|>[1,2,3,4]<|/det|>") == []
    assert parse_spans("<|ref|>x<|/ref|><|det|>[[1,2,3]]<|/det|>") == []
    assert parse_spans("<|ref|>x<|/ref|><|det|>[[a,b,c,d]]<|/det|>") == []


def test_parse_spans_empty_ref_becomes_text():
    raw = "<|ref|><|/ref|><|det|>[[1,2,3,4]]<|/det|>"
    assert parse_spans(raw) == [("text", 1, 2, 3, 4)]


def test_parse_spans_multiple():
    raw = (
        "<|ref|>a<|/ref|><|det|>[[1,2,3,4]]<|/det|>junk"
        "<|ref|>b<|/ref|><|det|>[[5,6,7,8]]<|/det|>"
    )
    assert parse_spans(raw) == [("a", 1, 2, 3, 4), ("b", 5, 6, 7, 8)]


# --- P4: 0-999 grid → pixels (deepseek_ocr_backend.py:568-572) --------------
def test_denormalize_box():
    assert denormalize_box((0, 0, 999, 999), 800, 600) == (0, 0, 800, 600)
    assert denormalize_box((500, 500, 999, 999), 999, 999) == (500, 500, 999, 999)
    # int() truncation, not rounding — the reference uses int(x/999 * dim)
    assert denormalize_box((1, 1, 2, 2), 100, 100) == (0, 0, 0, 0)


# --- marker round-trip ------------------------------------------------------
def test_marker_round_trip():
    marker = make_span_marker("Header", (40, 40, 959, 90))
    assert marker == "<|ref|>Header<|/ref|><|det|>[[40, 40, 959, 90]]<|/det|>"
    assert parse_spans(marker) == [("Header", 40, 40, 959, 90)]
    assert extract_markdown(marker) == "Header"


# --- P6: page assembly (deepseek_ocr_backend.py:351-377) --------------------
def test_page_separator_exact_bytes():
    assert page_separator(3) == "\n<--- Page 3 --->\n"


def test_assemble_pages_ordering_and_separators():
    md, processed = assemble_pages([(2, "two"), (1, "one")])
    assert md == "one\n<--- Page 1 --->\n\ntwo\n<--- Page 2 --->\n"
    assert processed == [1, 2]


def test_assemble_pages_strips_endoftext():
    md, _ = assemble_pages([(1, "a<|endoftext|>")])
    assert md == "a\n<--- Page 1 --->\n"


# --- R4: page selection semantics divergence (SURVEY §7.3 item 4) -----------
def test_select_pages_exact_set_semantics():
    # DeepSeek keeps the exact valid set, preserving request order
    assert select_pages_exact([3, 1, 99], 5) == [3, 1]
    assert select_pages_exact(None, 3) == [1, 2, 3]
    with pytest.raises(ValueError, match="No valid pages selected"):
        select_pages_exact([99], 5)


def test_select_pages_range_semantics():
    # MinerU keeps the contiguous range min..max, clamped
    assert select_pages_range([1, 3], 5) == [1, 2, 3]
    assert select_pages_range([2, 99], 5) == [2, 3, 4, 5]
    assert select_pages_range(None, 2) == [1, 2]
    with pytest.raises(ValueError):
        select_pages_range([99], 5)


def test_page_selection_divergence():
    # the same request [1, 3] differs across arms — the reference discrepancy
    assert select_pages_exact([1, 3], 5) == [1, 3]
    assert select_pages_range([1, 3], 5) == [1, 2, 3]


# --- M8: no-repeat n-gram window (process/ngram_norepeat.py:18-40) ----------
def test_ngram_window_bans_repeat():
    # seen 3-gram (a,b,c); current prefix (a,b) → c banned
    assert ngram_window_banned(["a", "b", "c", "x", "a", "b"]) == {"c"}


def test_ngram_window_respects_window_size():
    toks = ["a", "b", "c"] + ["x"] * 200 + ["a", "b"]
    assert ngram_window_banned(toks, window_size=100) == set()
    assert ngram_window_banned(toks, window_size=300) == {"c"}


def test_ngram_window_whitelist():
    toks = ["a", "b", "c", "x", "a", "b"]
    assert ngram_window_banned(toks, whitelist={"c"}) == set()


def test_suppress_repeats_greedy():
    toks = ["a", "b", "c", "a", "b", "c", "a", "b", "c"]
    out = suppress_repeats(toks)
    # the second completion of (a,b)->c is dropped each time it recurs
    assert out == ["a", "b", "c", "a", "b", "a", "b"]


# --- D2/D3: tiling plan (process/image_process.py:21-111,345-355) -----------
def test_tiling_small_image_bypass():
    assert tiling_plan(640, 640) == (1, 1)
    assert tiling_plan(100, 640) == (1, 1)


def test_tiling_grid_selection():
    # 2:1 landscape → (2,1); 1:2 portrait → (1,2)
    assert count_tiles(1280, 640) == (2, 1)
    assert count_tiles(640, 1280) == (1, 2)
    # near-square large image prefers the larger grid at equal ratio diff
    w, h = count_tiles(1920, 1920)
    assert w == h
    # grid area stays within the reference's 2..6 bound (or 1×1 bypass)
    for dims in [(1000, 700), (3000, 500), (700, 2100)]:
        tw, th = count_tiles(*dims)
        assert 2 <= tw * th <= 6


def test_vision_token_cost_golden():
    """M2 token interleave replayed exactly (image_process.py:383-401 with
    the config constants): global view = (16+1)*16+1 = 273; a tiled image
    adds (10*nw + 1) * (10*nh)."""
    from ocr_project_spark.functions.markers import tiling_plan, vision_token_cost

    # small-image bypass: (1,1) tiles -> global view only
    assert tiling_plan(320, 320) == (1, 1)
    assert vision_token_cost(320, 320) == 273
    # a 2:1 landscape tiles (2,1): 273 + (10*2+1)*(10*1) = 483
    nw, nh = tiling_plan(1280, 640)
    assert (nw, nh) == (2, 1)
    assert vision_token_cost(1280, 640) == 273 + (10 * 2 + 1) * 10
    # cost is monotone in tile count
    assert vision_token_cost(1920, 1280) > vision_token_cost(1280, 640)
