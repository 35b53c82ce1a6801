"""Pure-stdlib PNG codec (zlib + struct only) — a REAL image codec for
the multimodal pipeline in a container with no PIL/cv2/imageio.

Scope: 8-bit grayscale (color type 0), truecolor (2), and
truecolor+alpha (6); all five PNG filter types (None/Sub/Up/Average/
Paeth) on both sides; no interlacing, no palette. That covers every
PNG this pipeline produces and the common crawl-image baseline cases.

The encoder and decoder are written as INDEPENDENT implementations of
RFC 2083 §6 (different code paths, no shared filter helpers), so
encode→decode roundtrip equality in tests is evidence both match the
spec rather than each other. CRCs are verified on decode; truncated or
corrupt streams raise ``ValueError``.

Reference: RFC 2083 (PNG specification); filter heuristics follow
libpng's per-row choice freedom — any per-row filter is valid, and the
encoder deliberately CYCLES row filters (row % 5) so every decoder
unfilter path is exercised by any image taller than 4 rows.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes, width: int, height: int, color_type: int = 0
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``
    bytes) into a PNG, cycling the row filter through all five types
    (row % 5) — spec-legal and maximally exercising for any decoder."""
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(f"expected {stride * height} bytes, got {len(pixels)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - ch] if i >= ch else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            out = bytearray()
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((row[i] - pred) & 0xFF)
            raw += out
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG produced by any spec-conforming encoder (8-bit,
    color types 0/2/6, no interlace). Returns ``(width, height,
    channels, pixels)`` with pixels row-major unfiltered bytes.
    Verifies chunk CRCs; raises ``ValueError`` on malformed input."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            # the CRC guard keeps a stream cut inside the 4 CRC bytes on
            # the documented ValueError path instead of struct.error
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG: depth={depth} ct={color_type}")
            if inter != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")
    pixels = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        pixels += line
        prev = line
    return width, height, ch, bytes(pixels)


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of raw 8-bit pixels — the real
    resize primitive behind the multimodal resize stage."""
    out = bytearray(out_w * out_h * channels)
    for oy in range(out_h):
        sy = min(oy * height // out_h, height - 1)
        for ox in range(out_w):
            sx = min(ox * width // out_w, width - 1)
            src = (sy * width + sx) * channels
            dst = (oy * out_w + ox) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return bytes(out)
