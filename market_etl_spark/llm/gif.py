"""Pure-stdlib GIF87a codec (8-bit grayscale subset).

Third member of the real-codec family (PNG = DEFLATE, JPEG =
DCT+Huffman, GIF = LZW): an INDEPENDENT encoder and decoder of the
GIF87a structure — logical screen descriptor, 256-entry grayscale
global color table, image descriptor, and the GIF variant of LZW
(variable-width codes 9→12 bits LSB-first, CLEAR/EOI codes, dictionary
reset at 4096, 255-byte sub-blocks).  Interlacing, local color tables,
and extensions are out of scope (87a baseline).

Encoder and decoder share only the header constants; the LZW string
table, bit packing, and sub-block framing are written twice, so a
roundtrip is a conformance check of the LZW coder itself.  GIF is
lossless, so the registered query (``llm_gif_decode_stats``) pins
EXACT roundtrip equality — same oracle strategy as PNG.
"""

from __future__ import annotations

import struct

_HEADER = b"GIF87a"
_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


class _BitPacker:
    """LSB-first bit stream → 255-byte GIF sub-blocks."""

    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._bytes = bytearray()

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self._bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def finish(self) -> bytes:
        if self._nbits:
            self._bytes.append(self._acc & 0xFF)
        out = bytearray()
        data = bytes(self._bytes)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
        return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    packer = _BitPacker()

    def reset_table():
        return {bytes([i]): i for i in range(clear)}, eoi + 1

    table, next_code = reset_table()
    width = min_code_size + 1
    packer.write(clear, width)
    current = b""
    for b in indices:
        probe = current + bytes([b])
        if probe in table:
            current = probe
            continue
        packer.write(table[current], width)
        table[probe] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code >= _DICT_LIMIT:
            packer.write(clear, width)
            table, next_code = reset_table()
            width = min_code_size + 1
        current = bytes([b])
    if current:
        packer.write(table[current], width)
    packer.write(eoi, width)
    return packer.finish()


class _BitReader:
    """GIF sub-blocks → LSB-first bit stream."""

    def __init__(self, data: bytes, pos: int) -> None:
        self._buf = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated image data")
            n = data[pos]
            pos += 1
            if n == 0:
                break
            self._buf += data[pos : pos + n]
            if len(data) < pos + n:
                raise ValueError("truncated sub-block")
            pos += n
        self.end = pos
        self._acc = 0
        self._nbits = 0
        self._i = 0

    def read(self, width: int) -> int:
        while self._nbits < width:
            if self._i >= len(self._buf):
                raise ValueError("LZW stream exhausted before EOI")
            self._acc |= self._buf[self._i] << self._nbits
            self._i += 1
            self._nbits += 8
        v = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._nbits -= width
        return v


def _lzw_decode(data: bytes, pos: int, min_code_size: int = 8) -> tuple[bytes, int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data, pos)

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}, eoi + 1

    table, next_code = reset_table()
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table, next_code = reset_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and next_code < _DICT_LIMIT:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    return bytes(out), br.end


def encode_gif(pixels: bytes, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale ``pixels`` (row-major, len == w*h) as a
    GIF87a stream with a 256-entry grayscale global color table."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    out = bytearray(_HEADER)
    # logical screen descriptor: GCT present, 8 bits/pixel, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):  # grayscale GCT
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW minimum code size
    out += _lzw_encode(pixels, 8)
    out += b"\x3b"
    return bytes(out)


def encode_gif_frames(frames: list[bytes], width: int, height: int) -> bytes:
    """Encode a SEQUENCE of full-screen 8-bit grayscale frames as one
    GIF87a stream: one logical screen, one grayscale global color
    table, and one image descriptor + LZW-coded raster per frame
    (multiple image blocks are legal 87a; the 89a animation extras —
    graphic-control delays, Netscape looping — are presentation
    metadata the raster path does not need)."""
    if not frames:
        raise ValueError("at least one frame required")
    out = bytearray(_HEADER)
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):  # grayscale GCT
        out += bytes((i, i, i))
    for pixels in frames:
        if len(pixels) != width * height:
            raise ValueError("frame buffer does not match dimensions")
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW minimum code size
        out += _lzw_encode(pixels, 8)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(
    data: bytes,
    max_frames: int | None = None,
) -> tuple[int, int, list[tuple[int, int, int, int, int, bytes]]]:
    """Decode EVERY image block of a GIF87a/89a stream (or just the
    first ``max_frames`` when given — the scan stops early): returns
    ``(screen_w, screen_h, frames)`` where each frame is ``(left, top,
    width, height, byte_offset, grayscale_pixels)`` — byte_offset is
    the position of the frame's image descriptor in ``data`` and each
    pixel is the color table's red channel.  Raises ``ValueError`` on
    malformed or unsupported input (interlace, local color tables,
    out-of-range palette indices)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    gct_entries = 0
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        gct_entries = n
        pos += 3 * n
    frames: list[tuple[int, int, int, int, int, bytes]] = []
    while pos < len(data):
        if max_frames is not None and len(frames) >= max_frames:
            # lazy scan: a first-frame caller never pays for (or
            # fails on) later frames
            break
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02x}")
        desc_pos = pos
        if pos + 11 > len(data):
            # malformed-input contract is ValueError, not struct.error
            raise ValueError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        if ipacked & 0x80:
            raise ValueError("local color tables not supported")
        if gct is None:
            raise ValueError("missing global color table")
        pos += 10
        min_code_size = data[pos]
        pos += 1
        indices, pos = _lzw_decode(data, pos, min_code_size)
        if len(indices) < w * h:
            raise ValueError("decoded pixel count short of image size")
        indices = indices[: w * h]
        # an externally-produced stream may carry a small GCT
        # (packed & 0x07 < 7) or corrupt indices past the table — the
        # malformed-input contract is ValueError, not IndexError
        if indices and max(indices) >= gct_entries:
            raise ValueError(
                f"palette index {max(indices)} out of range "
                f"(color table has {gct_entries} entries)"
            )
        px = bytes(gct[3 * i] for i in indices)
        frames.append((left, top, w, h, desc_pos, px))
    if not frames:
        raise ValueError("no image descriptor")
    return sw, sh, frames


def count_frames(data: bytes) -> int:
    """Count a GIF's image blocks by walking the descriptor / sub-block
    FRAMING only — no LZW decode, so a long animation costs O(bytes
    skipped) instead of O(pixels decoded) (ADVICE r8: the metadata
    path was paying full per-frame LZW just to report n_frames).
    Framing-level validation matches :func:`decode_gif_frames`
    (ValueError on a bad signature, truncated descriptor, unexpected
    block, or zero image blocks); pixel-level corruption is
    intentionally NOT detected here — counting is a metadata
    operation, the decode path owns pixel validation."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
        if pos > len(data):
            raise ValueError("truncated global color table")
    n = 0
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            if pos >= len(data):
                # ran off the end without consuming the 0 terminator —
                # a truncated extension is a framing error here exactly
                # as in the strict image-data walk below (ADVICE r9:
                # this used to fall out of the loop and return a
                # positive count for the torn stream)
                raise ValueError("truncated extension")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02x}")
        if pos + 11 > len(data):
            raise ValueError("truncated image descriptor")
        ipacked = data[pos + 9]
        pos += 10
        if ipacked & 0x80:  # local color table rides before the data
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # LZW min code size
        # skip the data sub-blocks by their length bytes — STRICT: a
        # length byte promising absent bytes (or a missing 0
        # terminator) is a framing error here exactly as it is in
        # _lzw_decode, so a torn frame cannot be silently counted
        while True:
            if pos >= len(data):
                raise ValueError("truncated sub-block")
            ln = data[pos]
            if ln == 0:
                pos += 1
                break
            if pos + 1 + ln > len(data):
                raise ValueError("truncated sub-block")
            pos += 1 + ln
        n += 1
    if n == 0:
        raise ValueError("no image descriptor")
    return n


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode the FIRST image of a GIF87a/89a stream (global color
    table, no interlace); returns ``(width, height, grayscale_pixels)``
    where each pixel is the color table's red channel.  Raises
    ``ValueError`` on malformed or unsupported input.  Multi-frame
    streams: :func:`decode_gif_frames`.  Decodes LAZILY (``max_frames=1``):
    the scan stops after the first image block, so a stream with a
    valid first frame but truncated later frames still decodes and a
    long animation costs one frame's LZW work here."""
    _sw, _sh, frames = decode_gif_frames(data, max_frames=1)
    _left, _top, w, h, _off, px = frames[0]
    return w, h, px
