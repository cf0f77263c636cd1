"""Baseline JPEG codec anchors. No reference codec exists in this
environment, so these tests break encoder↔decoder error cancellation
structurally: the zigzag table and the Huffman/IDCT paths are each checked
against independently hand-written spec artifacts, and only then do
round-trips assert tolerance bounds.
"""

from __future__ import annotations

import numpy as np
import pytest

# the spec's zigzag sequence, hard-coded independently of the package's
# programmatic diagonal walk
SPEC_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_spec_table():
    from ocr_project_spark.jpegcodec import ZIGZAG

    assert ZIGZAG == SPEC_ZIGZAG


def test_idct_matches_explicit_cosine_sum():
    """The matrix-product IDCT must equal the spec's explicit double cosine
    sum (independent code path) on arbitrary coefficients."""
    from ocr_project_spark.jpegcodec import idct_blocks

    rng_free = (np.arange(64, dtype=np.int64) * 37 % 401 - 200).reshape(8, 8)
    F = rng_free.astype(np.float64)

    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[x, y] = s / 4.0
    got = idct_blocks(F[None, :, :])[0]
    assert np.allclose(got, ref, atol=1e-9)


def test_decode_handbuilt_spec_table_fixture():
    """A JPEG assembled BY THE TEST — spec Annex-K DC-luminance Huffman
    table, its own bit stream, never touching encode_jpeg — must decode to
    the exact expected constant block. Validates canonical-code
    construction, receive/extend, dequantization, and IDCT scaling against
    the spec rather than against this repo's encoder."""
    import struct

    from ocr_project_spark.jpegcodec import decode_jpeg

    # DC value for constant 200 gray: F00 = 8·(200−128) = 576, quant 1
    # category 10 → spec DC-lum code 11111110 (8 bits), then 576 in 10 bits
    dc_lum_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_lum_vals = list(range(12))
    # minimal AC table: single symbol EOB with code length 1 (code 0)
    ac_bits = [1] + [0] * 15
    ac_vals = [0x00]

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    entropy_bits = "11111110" + format(576, "010b") + "0"  # DC + EOB
    entropy_bits += "1" * (-len(entropy_bits) % 8)  # 1-pad
    entropy = int(entropy_bits, 2).to_bytes(len(entropy_bits) // 8, "big")

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(dc_lum_bits) + bytes(dc_lum_vals))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, np.full((8, 8, 3), 200, dtype=np.uint8))


def _block_constant_gray(w=32, h=48, seed=17):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8, :] = (
                seed + 3 * bx + 5 * by
            ) % 256
    return img


def test_block_constant_gray_is_exact():
    """The media_jpeg oracle contract: block-constant grayscale decodes
    LOSSLESSLY (DC-only blocks, DC quantizer divides exactly)."""
    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    img = _block_constant_gray()
    assert np.array_equal(decode_jpeg(encode_jpeg(img, gray=True)), img)


def test_restart_markers_reset_predictors():
    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    img = _block_constant_gray()
    out = decode_jpeg(encode_jpeg(img, gray=True, restart_interval=2))
    assert np.array_equal(out, img)


def _gradient_color(n=32):
    g = np.arange(n)[:, None] * 3 + np.arange(n)[None, :] * 5
    return np.stack(
        [((g + c * 40) % 200 + 20) for c in range(3)], axis=2
    ).astype(np.uint8)


def test_near_lossless_roundtrips_at_unit_quant():
    """With all-ones quantization the only loss is DCT/color-transform
    rounding: grayscale within ±2, 4:4:4 color within ±3, and 4:2:0 with
    constant chroma within ±2 (chroma averaging is lossless there)."""
    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    q1 = np.ones((8, 8), dtype=np.int64)
    color = _gradient_color()
    gray = np.stack([color[:, :, 0]] * 3, axis=2)

    err_g = np.abs(
        decode_jpeg(encode_jpeg(gray, gray=True, quant=q1)).astype(int)
        - gray.astype(int)
    ).max()
    assert err_g <= 2, err_g

    err_c = np.abs(
        decode_jpeg(encode_jpeg(color, quant=q1)).astype(int)
        - color.astype(int)
    ).max()
    assert err_c <= 3, err_c

    mono = np.stack([color[:, :, 1]] * 3, axis=2)
    err_s = np.abs(
        decode_jpeg(encode_jpeg(mono, subsample=True, quant=q1)).astype(int)
        - mono.astype(int)
    ).max()
    assert err_s <= 2, err_s

    # 4:2:2 (horizontal-only chroma subsampling) through the same MCU path
    err_422 = np.abs(
        decode_jpeg(encode_jpeg(mono, subsample="422", quant=q1)).astype(int)
        - mono.astype(int)
    ).max()
    assert err_422 <= 2, err_422


def test_default_quant_roundtrip_bounded():
    """With the fixture quant table (AC quantizer 16) a sharp sawtooth image
    round-trips within a documented lossy bound."""
    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    color = _gradient_color()
    err = np.abs(
        decode_jpeg(encode_jpeg(color)).astype(int) - color.astype(int)
    ).max()
    assert err <= 48, err


def test_undecodable_jpegs_raise_valueerror():
    import struct

    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"GIF89a notjpeg")
    # progressive frame marker
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(
            b"\xff\xd8"
            + struct.pack(">BBH", 0xFF, 0xC2, 11)
            + b"\x00" * 9
            + b"\xff\xd9"
        )
    # truncated mid-segment
    good = encode_jpeg(_block_constant_gray(), gray=True)
    with pytest.raises(ValueError):
        decode_jpeg(good[:20])


def test_image_pixel_stats_strict_on_jpeg(spark):
    """End-to-end through the Arrow operator: a good baseline JPEG decodes
    exactly; a broken one degrades to a corrupt row, not a dead batch."""
    from ocr_project_spark.jpegcodec import encode_jpeg
    from ocr_project_spark.multimodal import image_pixel_stats

    img = _block_constant_gray(w=24, h=16, seed=9)
    good = encode_jpeg(img, gray=True)
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:30]))],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in image_pixel_stats(media, decode="strict").collect()
    }
    assert (rows[1]["width"], rows[1]["height"]) == (24, 16)
    assert rows[1]["pixel_sum"] == int(img.astype(np.int64).sum())
    assert not rows[1]["corrupt"]
    assert rows[2]["corrupt"]


def test_synthesize_jpeg_media_sql_contract(spark):
    """The planted-JPEG contract the driver oracle replays: width, height
    and pixel_sum are the documented pure functions of the id."""
    from ocr_project_spark.multimodal import image_pixel_stats, synthesize_jpeg_media

    the_ids = list(range(0, 50, 7))
    ids = spark.createDataFrame([(i,) for i in the_ids], "doc_id long")
    out = {
        r["media_id"]: r
        for r in image_pixel_stats(
            synthesize_jpeg_media(ids), decode="strict"
        ).collect()
    }
    for i in the_ids:
        w = 16 + 8 * (i % 6)
        h = 16 + 8 * ((i // 7) % 5)
        expect = 3 * sum(
            64 * ((i + 3 * bx + 5 * by) % 256)
            for bx in range(w // 8)
            for by in range(h // 8)
        )
        r = out[i]
        assert (r["width"], r["height"], r["pixel_sum"], r["corrupt"]) == (
            w,
            h,
            expect,
            False,
        )


def test_structurally_broken_jpegs_raise_valueerror_not_keyerror():
    """Payloads that parse past the marker walk but reference undefined
    tables / zero sampling factors / short segments must surface as
    ValueError (the strict-mode Arrow catch), never KeyError /
    ZeroDivisionError / struct.error that would kill a whole batch."""
    import struct

    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # SOF0 referencing quant table 3 that was never defined -> KeyError path
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 3]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bad_tq = b"\xff\xd8" + sof + sos + b"\x00" * 8 + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(bad_tq)

    # zero sampling nibble -> ZeroDivisionError path
    good = encode_jpeg(_block_constant_gray(), gray=True)
    i = good.index(b"\xff\xc0")
    # component bytes sit at offset i+4(ihdr)+6: id, hv, tq
    broken = bytearray(good)
    broken[i + 4 + 6 + 1] = 0x00  # h=0, v=0
    with pytest.raises(ValueError):
        decode_jpeg(bytes(broken))

    # 4-byte SOF0 body -> struct.error path
    short_sof = b"\xff\xd8" + seg(0xC0, bytes([8, 0, 8])) + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(short_sof)


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: extra 0xFF padding before a marker is spec-legal and
    must not be parsed as a marker itself."""
    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    img = np.full((16, 16, 1), 128, dtype=np.uint8)
    payload = encode_jpeg(img, gray=True)
    # insert a fill byte before the first post-SOI marker (SOI is bytes 0-1)
    assert payload[2] == 0xFF
    padded = payload[:2] + b"\xff" + payload[2:]
    out = decode_jpeg(padded)
    assert out.shape[:2] == (16, 16)


def test_huge_declared_dimensions_raise_valueerror():
    """A tiny payload declaring 65535x65535 must raise ValueError (the
    corrupt-row path), never allocate its way to a MemoryError."""
    import struct

    import pytest

    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    payload = bytearray(encode_jpeg(np.zeros((8, 8, 1), dtype=np.uint8), gray=True))
    i = payload.find(b"\xff\xc0")
    payload[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="exceed decode limit"):
        decode_jpeg(bytes(payload))


def test_duplicate_component_ids_raise_valueerror():
    import pytest

    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    payload = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = payload.find(b"\xff\xc0")
    # component ids live at offsets 10, 13, 16 within the SOF0 segment
    # (marker+len+precision+h+w+ncomp, then 3 bytes per component)
    payload[i + 10] = payload[i + 13]  # duplicate the second component's id
    with pytest.raises(ValueError, match="duplicate component ids"):
        decode_jpeg(bytes(payload))


def test_jpeg_entropy_decode_throughput():
    """The documented decode budget for the Huffman walk (the dominant cost
    on real corpora, which are mostly JPEG — round-4 verdict item 3): a
    1024×1024 RGB 4:4:4 image built from high-frequency ramps so that
    quantization zeroes almost nothing (~40 entropy symbols per block,
    ~2.4 MB of entropy data — several times denser than a real photo) must
    decode well under 10 s. The table-driven walk (one 16-bit peek + two
    list indexes per symbol, reader state in plain locals) does it in
    ~3 s; the old per-bit dict-probe walk took ~7 s on the same fixture
    and scaled worse. Mirrors test_png_paeth_decode_throughput."""
    import time

    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    rng_free = (
        np.arange(1024, dtype=np.int64)[:, None] * 7
        + np.arange(1024, dtype=np.int64)[None, :] * 13
    )
    img = (
        (rng_free[:, :, None] + 85 * np.arange(3)[None, None, :]) % 256
    ).astype(np.uint8)
    payload = encode_jpeg(img)
    assert len(payload) > 1_500_000  # the fixture really is entropy-dense
    t0 = time.monotonic()
    out = decode_jpeg(payload)
    elapsed = time.monotonic() - t0
    assert out.shape == (1024, 1024, 3)
    # sanity: the decode is a real lossy roundtrip, not a stub
    assert abs(float(out.astype(np.int64).mean()) - float(img.mean())) < 8.0
    assert elapsed < 10.0, f"JPEG entropy decode took {elapsed:.1f}s for 1 MP"


def test_out_of_baseline_huffman_size_nibbles_raise_valueerror():
    """DHT values outside the baseline magnitude bounds (spec tables
    F.1/F.2: DC categories 0-11, AC sizes 1-10) must be rejected at
    table-build time with a named ValueError (the corrupt-row path) —
    otherwise an out-of-spec size nibble drives the entropy walk's 27-bit
    refill budget negative mid-block."""
    import struct

    import pytest

    from ocr_project_spark.jpegcodec import decode_jpeg, encode_jpeg

    good = encode_jpeg(_block_constant_gray(), gray=True)

    def mutate_first_dht_value(payload, want_tc, new_value):
        buf = bytearray(payload)
        i = 2  # past SOI
        while i < len(buf) - 1:
            assert buf[i] == 0xFF
            marker = buf[i + 1]
            seglen = struct.unpack(">H", bytes(buf[i + 2 : i + 4]))[0]
            if marker == 0xC4:
                j = i + 4
                while j < i + 2 + seglen:
                    tcth = buf[j]
                    nvals = sum(buf[j + 1 : j + 17])
                    if (tcth >> 4) == want_tc:
                        assert nvals >= 1
                        buf[j + 17] = new_value
                        return bytes(buf)
                    j += 17 + nvals
            if marker == 0xDA:
                break
            i += 2 + seglen
        raise AssertionError("requested DHT class not found")

    # DC category 12 > 11
    with pytest.raises(ValueError, match="DC category"):
        decode_jpeg(mutate_first_dht_value(good, want_tc=0, new_value=12))
    # AC size nibble 11 > 10 (run=0, size=11)
    with pytest.raises(ValueError, match="AC size"):
        decode_jpeg(mutate_first_dht_value(good, want_tc=1, new_value=0x0B))
