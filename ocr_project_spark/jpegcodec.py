"""Baseline JPEG (ITU-T T.81 sequential DCT) decode — stdlib + numpy only.

Real crawl corpora are mostly JPEG, so strict-mode image operators need a
native decode path just like PNG/netpbm (round-3 verdict). This module
implements the baseline sequential profile: SOF0 frames, 8-bit samples,
embedded DQT/DHT tables, grayscale and 3-component YCbCr with any
sampling-factor combination up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers, byte stuffing. Progressive (SOF2), arithmetic coding, 12-bit and
hierarchical modes raise ValueError — strict-mode callers degrade those to
``corrupt`` rows, never dead Arrow batches.

Validation strategy (no codec library exists in this environment to
differentiate against, so the tests break encoder↔decoder error
cancellation structurally):

- the zigzag order is generated programmatically here and asserted against
  the spec's hard-coded 64-entry sequence in tests;
- a hand-built fixture bypasses :func:`encode_jpeg` entirely — the test
  writes its own entropy stream with the spec's standard DC-luminance
  Huffman table, which the decoder must reproduce exactly;
- the IDCT is cross-checked against an explicit cosine double-loop in
  tests (different code path from the matrix product used here);
- the driver's ``media_jpeg`` oracle plants block-constant grayscale
  images whose decode is mathematically EXACT (a constant block has only a
  DC coefficient; with the DC quantizer = 8 the quantization is lossless),
  so DuckDB predicts the pixel sums with integer arithmetic while the
  engine earns them by real Huffman + dequantization + IDCT work.

Entropy decoding is a sequential bit-stream walk (sequential by nature,
like the PNG Paeth scan), but it is TABLE-DRIVEN, not per-bit: each
Huffman table is expanded once into a 2^16-entry (symbol, code-length)
lookup so every symbol costs one 16-bit peek + two list indexes instead
of up-to-16 dict probes, the bit reader refills four bytes at a time,
and destuffing/restart splitting is regex + bytes.replace (C speed).
The IDCT, color transform and block→plane assembly are vectorized numpy
over all blocks at once. A ≥1 MP throughput budget is enforced in
tests/test_jpeg.py (mirroring the PNG Paeth budget in
tests/test_multimodal.py) so the walk cannot silently regress to per-bit
cost; a production deployment would still swap in a codec library on the
executors while keeping the same operator contract.
"""

from __future__ import annotations

import re
import struct

import numpy as np


def zigzag_order() -> list[int]:
    """Raster index for each zigzag position (diagonal walk; asserted
    against the spec's hard-coded table in tests/test_multimodal.py)."""
    order = []
    for s in range(15):
        lo, hi = max(0, s - 7), min(s, 7)
        rows = range(lo, hi + 1) if s % 2 else range(hi, lo - 1, -1)
        for r in rows:
            order.append(r * 8 + (s - r))
    return order


ZIGZAG = zigzag_order()

# decode sanity cap: 64 MP covers any plausible crawl image while bounding
# worst-case block allocations to well under a GB (see the SOF check)
MAX_DECODE_PIXELS = 64_000_000

# orthonormal 8-point DCT-II basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16);
# the spec FDCT is F = A f Aᵀ and the IDCT is f = Aᵀ F A
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks → (n, 8, 8) spatial samples
    (level shift NOT applied) — one einsum over every block at once."""
    return np.einsum("xu,nuv,vy->nxy", _A.T, coefs, _A)


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples → (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,yv->nuv", _A, blocks, _A.T)


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment. Refills the
    integer bit buffer four bytes at a time; past the end of the segment
    it pads with 1-bits (spec F.1.2.3 scan padding), exactly like the old
    per-byte reader."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            chunk = self.data[self.pos : self.pos + 4]
            if chunk:
                self.buf = (self.buf << (8 * len(chunk))) | int.from_bytes(
                    chunk, "big"
                )
                self.nbits += 8 * len(chunk)
                self.pos += len(chunk)
            else:
                # spec: pad with 1-bits at the end of the scan
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8

    def read(self, n: int) -> int:
        if self.nbits < n:
            self._fill(n)
        self.nbits -= n
        out = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return out

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1


def _build_huffman(bits: list[int], values: list[int]) -> tuple[list, list]:
    """Canonical JPEG Huffman table expanded to a flat 2^16 lookup:
    ``(symbols, lengths)`` lists indexed by the next 16 bits of the
    stream — ``lengths[idx] == 0`` marks bit patterns no code covers
    (the old per-bit walk's "invalid Huffman code" case). One symbol
    decode is a peek16 + two list indexes + a skip."""
    syms = np.zeros(1 << 16, dtype=np.int64)
    lens = np.zeros(1 << 16, dtype=np.int64)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("malformed JPEG Huffman table (BITS overflow)")
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            syms[lo:hi] = values[k]
            lens[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return syms.tolist(), lens.tolist()


def _decode_symbol(reader: _BitReader, table: tuple[list, list]) -> int:
    syms, lens = table
    idx = reader.peek16()
    length = lens[idx]
    if length == 0:
        raise ValueError("invalid JPEG Huffman code")
    reader.skip(length)
    return syms[idx]


def _extend(v: int, s: int) -> int:
    """receive/extend (spec F.2.2.1): s-bit magnitude → signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


_RST_RE = re.compile(b"\xff[\xd0-\xd7]")


def _destuff(data: bytes) -> list[bytes]:
    """Entropy-coded bytes → restart-interval segments with the 0xFF00
    stuffing removed (RSTn markers delimit segments). In entropy-coded
    data every 0xFF is followed by 0x00 (stuffing) or a marker, so the
    scan ends at the first 0xFF whose successor is neither 0x00 nor RSTn,
    RST boundaries are unambiguous byte pairs (regex split), and the
    stuffing removal is one ``bytes.replace`` per segment — all C-speed;
    the Python loop below only hops between 0xFF occurrences."""
    n = len(data)
    end = n
    i = 0
    while True:
        j = data.find(b"\xff", i)
        if j < 0:
            break
        if j + 1 >= n:  # trailing lone 0xFF: scan ends before it
            end = j
            break
        nxt = data[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i = j + 2
            continue
        end = j  # next marker (EOI or otherwise): scan ends
        break
    body = data[:end]
    return [seg.replace(b"\xff\x00", b"\xff") for seg in _RST_RE.split(body)]


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG → (h, w, 3) uint8 (grayscale replicated —
    the shared contract of decode_netpbm/decode_png). Raises ValueError on
    any non-baseline or malformed payload — INCLUDING structurally broken
    ones whose parse fails deeper in (undefined table ids → KeyError, a
    zero sampling nibble → ZeroDivisionError, short segments →
    struct.error/IndexError): strict-mode Arrow callers catch ValueError
    to degrade one bad image to a corrupt row, so nothing else may escape
    and kill the batch."""
    try:
        return _decode_jpeg(payload)
    except ValueError:
        raise
    except (
        KeyError,
        IndexError,
        ZeroDivisionError,
        struct.error,
        OverflowError,
        TypeError,
    ) as exc:
        raise ValueError(
            f"malformed JPEG: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    scan = None
    scan_comps = None
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — skip them, or a spec-legal FF FF DB sequence would parse
        # 0xFF as the marker and garbage as the segment length
        while pos + 4 <= n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = table.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                values = list(body[i + 17 : i + 17 + nvals])
                # baseline magnitude bounds (spec tables F.1/F.2: DC
                # categories 0-11, AC sizes 1-10): the entropy walk's
                # single 27-bit refill covers a 16-bit code peek plus an
                # 11-bit magnitude — an out-of-spec size nibble would
                # drive the bit budget negative mid-block, so reject it
                # here with a named error (→ a corrupt row, not a crash)
                if tc == 0:
                    if any(v > 11 for v in values):
                        raise ValueError("JPEG DC category exceeds baseline")
                else:
                    if any((v & 0x0F) > 10 for v in values):
                        raise ValueError("JPEG AC size exceeds baseline")
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    bits, values
                )
                i += 17 + nvals
        elif marker == 0xC0:  # SOF0 — baseline sequential
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", body[1:5])
            # cap total pixels: a tiny payload can declare 65535x65535 and
            # drive tens of GB of block allocations — the resulting
            # MemoryError would escape the ValueError contract and kill
            # the whole Arrow batch instead of one corrupt row
            if w * h > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {w}x{h} exceed decode limit "
                    f"({MAX_DECODE_PIXELS} pixels)"
                )
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG frame (marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            scan = payload[pos + 2 + seglen :]
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS in JPEG payload")
    if len(frame["comps"]) not in (1, 3):
        raise ValueError("only 1- or 3-component JPEG supported")

    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    if len(by_id) != len(comps):
        # duplicate component ids would silently interleave two components'
        # blocks into one plane — malformed frames must raise, not decode
        raise ValueError("duplicate component ids in JPEG frame")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component coefficient storage: a flat list of zigzag-indexed
    # 64-int lists per component, MCU-interleaved (converted to one numpy
    # array per component AFTER the sequential walk — plain-int list
    # assignment in the hot loop beats per-element numpy scalar writes)
    coef_lists: dict[int, list[list[int]]] = {c["id"]: [] for c in comps}
    # resolve per-scan-component state ONCE, outside the MCU loop
    scan_plan = []
    for sc in scan_comps:
        comp = by_id.get(sc["id"])
        if comp is None:
            raise ValueError("JPEG scan references a missing frame component")
        dc_table = huff_dc.get(sc["td"])
        ac_table = huff_ac.get(sc["ta"])
        if dc_table is None or ac_table is None:
            raise ValueError("JPEG scan references a missing DHT table")
        scan_plan.append(
            (comp["id"], comp["h"] * comp["v"], dc_table, ac_table,
             coef_lists[comp["id"]])
        )
    segments = _destuff(scan)
    seg_idx = 0
    pred = {c["id"]: 0 for c in comps}
    zigzag = ZIGZAG
    # receive/extend lookup: value v of size s is negative iff its top bit
    # is 0, in which case subtract (1<<s)-1 (spec F.2.2.1)
    half = [1 << (s - 1) if s else 1 for s in range(17)]
    esub = [(1 << s) - 1 for s in range(17)]
    # the bit-stream walk is THE hot path (millions of symbols on a 1 MP
    # image), so the reader state lives in plain locals here — one
    # ensure-27-bits refill per symbol covers the 16-bit code peek plus
    # the ≤11 magnitude bits, and buf is re-masked once per symbol
    data = segments[0]
    pos = 0
    buf = 0
    nbits = 0
    mcu_count = 0
    for _mcu in range(mcus_y * mcus_x):
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            data = segments[seg_idx]
            pos = 0
            buf = 0
            nbits = 0
            pred = {c["id"]: 0 for c in comps}
        for cid, n_blocks, dc_table, ac_table, out_list in scan_plan:
            dc_syms, dc_lens = dc_table
            ac_syms, ac_lens = ac_table
            for _ in range(n_blocks):
                blk = [0] * 64
                # --- DC: code + magnitude in one refill window
                if nbits < 27:
                    chunk = data[pos : pos + 4]
                    lc = len(chunk)
                    buf = (buf << (8 * lc)) | int.from_bytes(chunk, "big")
                    nbits += 8 * lc
                    pos += lc
                    while nbits < 27:  # spec: pad scan end with 1-bits
                        buf = (buf << 8) | 0xFF
                        nbits += 8
                idx = (buf >> (nbits - 16)) & 0xFFFF
                length = dc_lens[idx]
                if length == 0:
                    raise ValueError("invalid JPEG Huffman code")
                nbits -= length
                s = dc_syms[idx]
                if s:
                    nbits -= s
                    v = (buf >> nbits) & esub[s]
                    pred[cid] += v if v >= half[s] else v - esub[s]
                buf &= (1 << nbits) - 1
                blk[0] = pred[cid]
                # --- AC coefficients
                k = 1
                while k < 64:
                    if nbits < 27:
                        chunk = data[pos : pos + 4]
                        lc = len(chunk)
                        buf = (buf << (8 * lc)) | int.from_bytes(chunk, "big")
                        nbits += 8 * lc
                        pos += lc
                        while nbits < 27:
                            buf = (buf << 8) | 0xFF
                            nbits += 8
                    idx = (buf >> (nbits - 16)) & 0xFFFF
                    length = ac_lens[idx]
                    if length == 0:
                        raise ValueError("invalid JPEG Huffman code")
                    nbits -= length
                    rs = ac_syms[idx]
                    s = rs & 0x0F
                    if s == 0:
                        buf &= (1 << nbits) - 1
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    nbits -= s
                    v = (buf >> nbits) & esub[s]
                    buf &= (1 << nbits) - 1
                    blk[zigzag[k]] = v if v >= half[s] else v - esub[s]
                    k += 1
                out_list.append(blk)
        mcu_count += 1

    # dequantize + IDCT + assemble per component, all blocks at once
    planes: dict[int, np.ndarray] = {}
    for comp in comps:
        cv, chf = comp["v"], comp["h"]
        cw = mcus_x * chf  # blocks per row
        ch = mcus_y * cv
        blocks = np.array(coef_lists[comp["id"]], dtype=np.int64).reshape(
            -1, 8, 8
        )
        coefs = blocks * qt[comp["tq"]][None, :, :]
        spatial = idct_blocks(coefs.astype(np.float64)) + 128.0
        # blocks arrive MCU-interleaved: per MCU, v×h blocks row-major —
        # scatter every block to its raster position in one fancy-index
        # write, then fold the (ch, cw, 8, 8) grid into the plane
        seq = np.arange(len(spatial))
        my, rem = np.divmod(seq, mcus_x * cv * chf)
        mx, rem2 = np.divmod(rem, cv * chf)
        bv, bh = np.divmod(rem2, chf)
        raster = (my * cv + bv) * cw + (mx * chf + bh)
        grid = np.empty((ch * cw, 8, 8), dtype=np.float64)
        grid[raster] = spatial
        plane = (
            grid.reshape(ch, cw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ch * 8, cw * 8)
        )
        # upsample to full resolution (sample replication) and crop
        ry, rx = vmax // cv, hmax // chf
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[comp["id"]] = plane[:h, :w]

    if len(comps) == 1:
        gray = np.clip(np.round(planes[comps[0]["id"]]), 0, 255).astype(np.uint8)
        return gray[:, :, None].repeat(3, axis=2)
    y, cb, cr = (planes[c["id"]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (test-fixture inverse): baseline sequential, simple flat-length
# canonical Huffman tables embedded via DHT — any spec-valid table works,
# and NOT reusing the spec's default tables means a decoder bug in canonical
# code construction cannot cancel against the encoder.
# ---------------------------------------------------------------------------

_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _flat_table(symbols: list[int], length: int) -> tuple[list[int], dict]:
    """All-same-length canonical table: (BITS array, symbol → (code, len))."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for flat code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {sym: (i, length) for i, sym in enumerate(symbols)}
    return bits, codes


_DC_BITS, _DC_CODES = _flat_table(_DC_SYMS, 4)
_AC_BITS, _AC_CODES = _flat_table(_AC_SYMS, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.buf = (self.buf << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.buf &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (size category s, s-bit magnitude code)."""
    if v == 0:
        return 0, 0
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _encode_block(
    writer: _BitWriter, coefs: np.ndarray, pred: int
) -> int:
    """Quantized (8,8) int block → entropy bits; returns the new DC pred."""
    zz = coefs.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    s, m = _magnitude(dc - pred)
    code, length = _DC_CODES[s]
    writer.write(code, length)
    if s:
        writer.write(m, s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s, m = _magnitude(v)
        code, length = _AC_CODES[(run << 4) | s]
        writer.write(code, length)
        writer.write(m, s)
        run = 0
    if last_nz < 63:
        code, length = _AC_CODES[0x00]  # EOB
        writer.write(code, length)
    return dc


# quantization tables used by the fixtures: DC quantizer 8 (divides the
# 8·(v−128) DC coefficient of any constant block exactly → lossless on
# block-constant images), AC quantizer 16
_Q_EXACT = np.full((8, 8), 16, dtype=np.int64)
_Q_EXACT[0, 0] = 8


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) plane (H, W multiples of 8) → (n, 8, 8) raster-order blocks."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_jpeg(
    img: np.ndarray,
    gray: bool = False,
    subsample: bool | str = False,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 → baseline JPEG bytes (the test-fixture inverse of
    :func:`decode_jpeg`). ``gray`` encodes one component from channel 0;
    ``subsample`` takes True/"420" for 4:2:0 (dims multiples of 16) or
    "422" for 4:2:2 (width multiple of 16), else 4:4:4 with dims multiples
    of 8. ``quant`` overrides the default exact-on-constant-blocks table."""
    q = _Q_EXACT if quant is None else np.asarray(quant, dtype=np.int64)
    mode = {True: "420", False: None}.get(subsample, subsample)
    h, w = img.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("fixture encoder requires dims divisible by 8")
    if mode == "420" and (h % 16 or w % 16):
        raise ValueError("4:2:0 fixture encoder requires dims divisible by 16")
    if mode == "422" and w % 16:
        raise ValueError("4:2:2 fixture encoder requires width divisible by 16")

    def quantize(plane: np.ndarray) -> np.ndarray:
        coefs = fdct_blocks(_blocks_of(plane.astype(np.float64) - 128.0))
        return np.round(coefs / q[None, :, :]).astype(np.int64)

    if gray:
        comps = [(1, 1, 1, quantize(img[:, :, 0]))]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if mode == "420":
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            comps = [
                (1, 2, 2, quantize(y)),
                (2, 1, 1, quantize(cb)),
                (3, 1, 1, quantize(cr)),
            ]
        elif mode == "422":
            cb = cb.reshape(h, w // 2, 2).mean(axis=2)
            cr = cr.reshape(h, w // 2, 2).mean(axis=2)
            comps = [
                (1, 2, 1, quantize(y)),
                (2, 1, 1, quantize(cb)),
                (3, 1, 1, quantize(cr)),
            ]
        else:
            comps = [
                (1, 1, 1, quantize(y)),
                (2, 1, 1, quantize(cb)),
                (3, 1, 1, quantize(cr)),
            ]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = w // (8 * hmax)
    mcus_y = h // (8 * vmax)

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    zz_q = bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
    segment(0xDB, bytes([0x00]) + zz_q)  # DQT table 0
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch_, cv, _ in comps:
        sof += bytes([cid, (ch_ << 4) | cv, 0])
    segment(0xC0, sof)
    segment(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS))
    segment(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMS))
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    segment(0xDA, sos)

    writer = _BitWriter()
    pred = {cid: 0 for cid, _, _, _ in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out.extend(writer.flush())
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                writer = _BitWriter()
                pred = {cid: 0 for cid, _, _, _ in comps}
            for cid, ch_, cv, coefs in comps:
                bw = mcus_x * ch_  # blocks per row for this component
                for bv in range(cv):
                    for bh in range(ch_):
                        idx = (my * cv + bv) * bw + (mx * ch_ + bh)
                        pred[cid] = _encode_block(writer, coefs[idx], pred[cid])
            mcu_count += 1
    out.extend(writer.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
