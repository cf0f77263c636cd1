"""Property-based tests (hypothesis) for the pure kernels: the round-trip
invariant — payload synthesis followed by extraction recovers the ground
truth byte-identically — must hold for arbitrary word sequences and doc ids,
not just the driver corpus.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocr_project_spark.datagen import build_html, build_pagedoc
from ocr_project_spark.functions.markers import (
    assemble_pages,
    extract_markdown,
    make_span_marker,
    parse_spans,
)
from ocr_project_spark.kernels.html_extract import extract_html_pages
from ocr_project_spark.kernels.layout_extract import extract_pagedoc_pages

# word alphabet mirrors realistic tokens: letters, digits, a few symbols
# that are inert in both HTML text nodes and JSON strings
WORDS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.,;:!?()-'\"",
    min_size=1,
    max_size=12,
)
TEXTS = st.lists(WORDS, min_size=1, max_size=120).map(" ".join)
DOC_IDS = st.integers(min_value=0, max_value=10_000_000)
LANGS = st.sampled_from(["en", "de", "fr", "es", "zh"])


@settings(max_examples=200, deadline=None)
@given(doc_id=DOC_IDS, text=TEXTS, lang=LANGS)
def test_html_roundtrip_property(doc_id, text, lang):
    pages = extract_html_pages(build_html(doc_id, text, lang).encode("utf-8"))
    recovered = " ".join(t for _, blocks in pages for t in blocks)
    assert recovered == text


@settings(max_examples=200, deadline=None)
@given(doc_id=DOC_IDS, text=TEXTS, lang=LANGS)
def test_pagedoc_roundtrip_property(doc_id, text, lang):
    pages = extract_pagedoc_pages(build_pagedoc(doc_id, text, lang).encode("utf-8"))
    recovered = " ".join(t for _, blocks in pages for t in blocks)
    assert recovered == text


@settings(max_examples=200, deadline=None)
@given(
    ref=st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .,-",
        min_size=1,
        max_size=40,
    ).filter(lambda s: s.strip() and not s.startswith("image")),
    box=st.tuples(*[st.integers(min_value=0, max_value=999)] * 4),
)
def test_span_marker_roundtrip_property(ref, box):
    marker = make_span_marker(ref, box)
    assert parse_spans(marker) == [(ref, *box)]
    assert extract_markdown(marker) == ref.strip()


@settings(max_examples=150, deadline=None)
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=400),
        min_size=1,
        max_size=6,
    ),
    with_requests=st.booleans(),
    compression=st.sampled_from([None, "record", "file"]),
)
def test_warc_roundtrip_property(payloads, with_requests, compression):
    """WARC framing survives arbitrary payload bytes — including embedded
    CRLFCRLF sequences and gzip magic — because records are
    Content-Length-framed, in all three compression layouts."""
    from datetime import datetime, timezone

    from ocr_project_spark.sources.warc import (
        parse_warc_records,
        synthesize_warc_segment,
    )

    ts = datetime(2025, 5, 1, tzinfo=timezone.utc)
    docs = [
        (f"https://h{i}.example.org/p{i}", ts, payload)
        for i, payload in enumerate(payloads)
    ]
    seg = synthesize_warc_segment(
        docs, include_request_records=with_requests, compression=compression
    )
    records = parse_warc_records(seg)
    assert [(u, p) for u, _, p in records] == [(u, p) for u, _, p in docs]


@settings(max_examples=100, deadline=None)
@given(
    contents=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz \n",
                min_size=0,
                max_size=30,
            ),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_assemble_pages_property(contents, ):
    md, processed = assemble_pages(contents)
    assert processed == sorted(p for p, _ in contents)
    # every page separator present, in ascending order
    positions = [md.find(f"\n<--- Page {p} --->\n") for p in processed]
    assert all(p >= 0 for p in positions)
    assert positions == sorted(positions)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_netpbm_roundtrip_property(w, h, seed):
    import numpy as np

    from ocr_project_spark.multimodal import decode_netpbm, encode_ppm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_ppm(img)), img)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=4000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    import numpy as np

    from ocr_project_spark.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    samples = rng.uniform(-1, 1, size=n)
    out, out_rate = decode_wav(encode_wav(samples, rate))
    assert out_rate == rate and len(out) == n
    # truncation (1 LSB) + the 32767-encode/32768-decode scale skew
    assert np.max(np.abs(out - samples)) <= 2.0 / 32768


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    filter_type=st.integers(min_value=0, max_value=4),
    gray=st.booleans(),
)
def test_png_roundtrip_property(w, h, seed, filter_type, gray):
    """decode(encode(img, any filter, any color arm)) == img for arbitrary
    pixel content and dimensions — the PNG unfiltering recurrences hold
    everywhere, not just on the planted fixtures."""
    import numpy as np

    from ocr_project_spark.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if gray:
        img = img[:, :, :1].repeat(3, axis=2)
    out = decode_png(encode_png(img, filter_type=filter_type, gray=gray))
    assert np.array_equal(out, img)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=24),
    n_frames=st.integers(min_value=1, max_value=6),
    num=st.integers(min_value=1, max_value=60),
    den=st.integers(min_value=1, max_value=2),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_y4m_roundtrip_property(w, h, n_frames, num, den, seed):
    import numpy as np

    from ocr_project_spark.multimodal import decode_y4m, encode_y4m

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(n_frames)
    ]
    decoded, dw, dh, fps = decode_y4m(encode_y4m(frames, fps=(num, den)))
    assert (dw, dh, fps) == (w, h, (num, den))
    assert len(decoded) == n_frames
    for (luma, _), orig in zip(decoded, frames):
        assert np.array_equal(luma, orig)


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=5),
    bh=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    mode=st.sampled_from(["gray", "444", "420", "422"]),
    restart=st.sampled_from([0, 1, 3]),
)
def test_jpeg_unit_quant_roundtrip_property(bw, bh, seed, mode, restart):
    """decode(encode(img, unit quant)) stays within the documented
    rounding bounds for arbitrary pixel content, MCU-aligned dimensions,
    every sampling mode, and restart-marker intervals — the Huffman /
    DCT / upsampling paths hold everywhere, not just on the gradient
    fixtures. Subsampled modes use channel-equal pixels (constant chroma)
    so chroma averaging is lossless and the bound stays tight."""
    import numpy as np

    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    align = 16 if mode in ("420", "422") else 8
    w = bw * align
    h = bh * (16 if mode == "420" else 8)
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if mode != "444":
        img = img[:, :, :1].repeat(3, axis=2)  # constant chroma / gray
    q1 = np.ones((8, 8), dtype=np.int64)
    payload = encode_jpeg(
        img,
        gray=(mode == "gray"),
        subsample=mode if mode in ("420", "422") else False,
        quant=q1,
        restart_interval=restart,
    )
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    bound = 3 if mode == "444" else 2
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= bound, (mode, err)
