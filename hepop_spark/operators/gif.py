"""Pure-Python GIF codec (decoder + fixture encoder), zero media
libraries — the third REAL compressed-image family in the repo after
DEFLATE (operators/png.py) and DCT/Huffman (operators/jpeg.py): GIF is
LZW with a variable-width code stream, palette indirection, sub-block
framing, and (for animations) multiple image descriptors per stream.

Decoder coverage: GIF87a/GIF89a headers, logical screen descriptor,
global and local color tables, extension blocks (skipped by sub-block
framing — including Graphic Control), multiple frames, interlaced rows
(Adam-style 8/8-4/8-2/4-1 pass deinterlace), the full GIF-variant LZW
(clear/end codes, growing code width to 12 bits, the KwKwK case).
Malformed streams raise ValueError (the decode-guard contract in
operators/multimodal.py).

GIF is lossless within its palette, so decoded pixels equal the
generator exactly — the same strongest-possible-oracle property PNG has.

Scale: per-item work behind Arrow-batched mapInPandas wrappers
(multimodal.decode_gif_frames) — no shuffle, nothing on the driver.
Reference parity: sipcapture/HEPop has no media path; north-star surface.
"""

from __future__ import annotations

import struct

import numpy as np


class _SubBlockReader:
    """GIF data sub-blocks: (len byte, payload)* terminated by len=0."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos

    def read_all(self) -> bytes:
        out = bytearray()
        while True:
            if self.pos >= len(self.data):
                raise ValueError("truncated sub-block stream")
            n = self.data[self.pos]
            self.pos += 1
            if n == 0:
                return bytes(out)
            if self.pos + n > len(self.data):
                raise ValueError("truncated sub-block payload")
            out += self.data[self.pos:self.pos + n]
            self.pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    CLEAR resets the table, width grows after the table fills its width,
    capped at 12 bits until the next CLEAR."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader state (LSB-first within the byte stream)
    acc = nbits = bytepos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, bytepos
        while nbits < width:
            if bytepos >= len(data):
                raise ValueError("LZW stream exhausted before END code")
            acc |= data[bytepos] << nbits
            nbits += 8
            bytepos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset_table():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset_table()
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table, width = reset_table()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first LZW code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table {len(table)}")
        if n_out + len(entry) > n_pixels:
            raise ValueError("LZW output exceeds frame pixel count")
        out[n_out:n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out != n_pixels:
        raise ValueError(f"LZW produced {n_out} of {n_pixels} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Standard GIF LZW encoder (dictionary build, CLEAR emitted up
    front and whenever the table would exceed 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, end + 1, \
            min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    w = b""
    for b in indices.astype(np.uint8).tobytes():
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code - 1 == (1 << 12):
            emit(clear, width)
            table, next_code, width = fresh()
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(data: bytes):
    """Decode every frame: yields (frame_idx, rgb uint8 [h, w, 3]).
    Frames smaller than the logical screen are returned at their own
    geometry (no compositing — per-frame stats want the frame's pixels)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    idx = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ends without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            r = _SubBlockReader(data, pos)
            r.read_all()
            pos = r.pos
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _l, _t, w, h, ipk = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        table = gct
        if ipk & 0x80:
            n = 2 << (ipk & 0x07)
            table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("frame has no color table")
        if pos >= len(data):
            raise ValueError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad LZW min code size {mcs}")
        r = _SubBlockReader(data, pos)
        lzw = r.read_all()
        pos = r.pos
        indices = _lzw_decode(lzw, mcs, w * h).reshape(h, w)
        if ipk & 0x40:
            indices = _deinterlace(indices)
        if int(indices.max(initial=0)) >= len(table):
            raise ValueError("palette index out of range")
        yield idx, table[indices]
        idx += 1


def encode_gif(frames: list[np.ndarray], palette: np.ndarray,
               interlace_frame0: bool = False) -> bytes:
    """Fixture encoder: frames are [h, w] palette-index arrays sharing one
    global color table (palette [n, 3] uint8, n a power of two >= 4).
    Animated when len(frames) > 1 (a Graphic Control Extension precedes
    each frame, exercising the decoder's extension skipping)."""
    n = len(palette)
    if n & (n - 1) or n < 4:
        raise ValueError("palette size must be a power of two >= 4")
    depth = n.bit_length() - 1
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    mcs = max(2, depth)
    for i, fr in enumerate(frames):
        # GCE: delay 4/100 s, no transparency — pure extension traffic
        out += b"\x21\xF9\x04\x00\x04\x00\x00\x00"
        ipk = 0x40 if (interlace_frame0 and i == 0) else 0
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, ipk)
        out += bytes([mcs])
        fi = fr
        if ipk & 0x40:
            order = [y for start, step in _INTERLACE_PASSES
                     for y in range(start, h, step)]
            fi = fr[order]
        lzw = _lzw_encode(fi.reshape(-1), mcs)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
