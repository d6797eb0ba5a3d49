"""Pure-Python GIF87a/89a codec: real LZW, both directions.

Completes the compression-family matrix of the multimodal surface: DEFLATE
(PNG, multimodal/columns.py), DCT + Huffman (JPEG, multimodal/jpeg.py),
and now DICTIONARY CODING — the LZW variant GIF mandates (variable-width
codes, LSB-first bit packing, clear/EOI codes, table growth to 12 bits,
the KwKwK edge case). GIF is lossless and palette-indexed, so unlike JPEG
the oracle is EXACT: the decoder must reproduce every palette index
bit-for-bit and the position-weighted checksum convention of
media_png_pixel_roundtrip applies unchanged.

Encoder and decoder share only the spec constants (code sizes, block
layout); the decoder parses the logical screen descriptor, color table,
image descriptor, and sub-block chain from the bytes — never encoder
state.
"""

from __future__ import annotations

import struct

N_COLORS = 64  # global color table entries (power of 2; size bits = 5)
_MIN_CODE_SIZE = 6  # 2^6 = 64 literal codes
_CLEAR = 1 << _MIN_CODE_SIZE
_EOI = _CLEAR + 1
_MAX_WIDTH = 12


def palette() -> bytes:
    """Deterministic 64-entry RGB palette (index j -> fixed arithmetic)."""
    out = bytearray()
    for j in range(N_COLORS):
        out += bytes(((j * 4 + 1) % 256, (j * 2 + 3) % 256, (255 - j * 4) % 256))
    return bytes(out)


class _LsbBitWriter:
    """LSB-first bit packing (GIF's order — the mirror of JPEG's MSB)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _lzw_encode(indices: bytes) -> bytes:
    bw = _LsbBitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(_CLEAR)}
    next_code = _EOI + 1
    width = _MIN_CODE_SIZE + 1
    bw.write(_CLEAR, width)
    w = b""
    for ch in indices:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
            width += 1
        if next_code >= (1 << _MAX_WIDTH):
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(_CLEAR)}
            next_code = _EOI + 1
            width = _MIN_CODE_SIZE + 1
        w = bytes([ch])
    if w:
        bw.write(table[w], width)
    bw.write(_EOI, width)
    return bw.flush()


def _lzw_decode(data: bytes, n_expected: int) -> bytes | None:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(_CLEAR)] + [b"", b""]
    width = _MIN_CODE_SIZE + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return None  # truncated stream
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == _CLEAR:
            table = [bytes([i]) for i in range(_CLEAR)] + [b"", b""]
            width = _MIN_CODE_SIZE + 1
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None  # invalid code
        out += entry
        prev = entry
        # widen AFTER appending, per spec: when the next code to be
        # assigned no longer fits the current width
        if len(table) == (1 << width) and width < _MAX_WIDTH:
            width += 1
        if len(out) >= n_expected:
            break
    return bytes(out[:n_expected])


def encode_gif(w: int, h: int, indices: bytes) -> bytes:
    """GIF89a with a 64-color global table; one image, no interlace."""
    assert len(indices) == w * h
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, color resolution 5, size 5
    out += struct.pack("<HHBBB", w, h, 0b1_101_0_101, 0, 0)
    out += palette()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(_MIN_CODE_SIZE)
    data = _lzw_encode(indices)
    for i in range(0, len(data), 255):  # sub-block chain
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes] | None:
    """Parse + LZW-decode; returns (w, h, palette indices) or None."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if packed & 0x80:  # global color table
        gct_n = 2 << (packed & 0x07)
        pos += 3 * gct_n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            min_code = payload[pos]
            pos += 1
            if min_code != _MIN_CODE_SIZE:
                return None  # only the 64-color profile is supported
            data = bytearray()
            while payload[pos]:
                n = payload[pos]
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(bytes(data), w * h)
            if idx is None or len(idx) != w * h:
                return None
            return w, h, idx
        elif block == 0x3B:  # trailer
            return None
        else:
            return None
    return None
