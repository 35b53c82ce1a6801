"""Baseline-DCT JPEG codec (grayscale subset; stdlib + optional numpy).

The round-6 real-codec discipline (``llm/png.py``) applied to the
crawl-dominant image format: an INDEPENDENT encoder and decoder of the
ISO/IEC 10918-1 baseline process — 8×8 FDCT, uniform quantization,
zigzag ordering, DC-difference + AC run/size Huffman entropy coding
with the Annex K reference tables, 0xFF byte stuffing, and the
SOI/DQT/SOF0/DHT/SOS/EOI marker stream — restricted to 8-bit grayscale
(one component, no subsampling), dimensions padded to multiples of 8 by
edge replication.

Encoder and decoder share only the constant tables (quant matrix,
zigzag order, Huffman spec — all public Annex K data); the DCT/IDCT,
bit I/O, and Huffman code construction are written twice, so a
roundtrip crossing both is a real conformance check, not self-identity.

Baseline JPEG is lossy, so the oracle strategy differs from PNG's
exact-roundtrip: the registered query (``llm_jpeg_decode_stats``)
encodes images whose 8×8 blocks are FLAT.  For a flat block every AC
coefficient is exactly zero and the reconstruction has the closed form

    decoded = clamp(128 + round(round(8·(v−128)/q00)·q00 / 8))

which a SQL oracle can compute without running any codec; property
tests additionally bound the error on arbitrary images under an
all-ones quant table (every coefficient rounds by ≤0.5).
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# Public constant tables (ISO/IEC 10918-1 Annex K)
# ---------------------------------------------------------------------------

#: Annex K.1 luminance quantization table, natural (row-major) order.
QUANT_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)

#: Zigzag scan: natural index of the k-th zigzag position.
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K.3.1 — luminance DC Huffman spec: (BITS[1..16], HUFFVAL).
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

#: Annex K.3.2 — luminance AC Huffman spec.
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
    0xF9, 0xFA,
)

#: cos((2x+1)uπ/16) basis, shared pre-computable math (not code).
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7
#: (1/4)·C(u)·C(v) with the (0,0) entry EXACT (0.125): in floats
#: (1/√2)² = 0.5000000000000001, which nudges a DC landing exactly on a
#: round-half boundary (8·(v−128)/q00 ∈ ½·ℤ for flat blocks) to the
#: wrong side and breaks the closed-form oracle by ±q00/8.
_ALPHA = [[0.25 * _C[u] * _C[v] for v in range(8)] for u in range(8)]
_ALPHA[0][0] = 0.125

# Optional vectorized transform path: the pure-Python O(64²) loops cost
# ~18 ms/block, which is codec-prohibitive for a 5k-doc corpus pass;
# the numpy form (S = Cᵀ·X·C, F = α ⊙ S — alpha applied ELEMENTWISE so
# the exact 0.125 DC entry survives) is ~100× faster and bit-identical
# on the flat-block oracle path (the DC sum of ≤2²⁰-magnitude integers
# is exact in float64 under any summation order).
try:  # pragma: no cover - environment-dependent
    import numpy as _np

    _COS_M = _np.array(_COS)  # [x, u]
    _ALPHA_M = _np.array(_ALPHA)  # [u, v]
except ImportError:  # pragma: no cover
    _np = None


def _round_half_away(x: float) -> int:
    """JPEG quantizer rounding: half away from zero (matches DuckDB /
    Spark ROUND on doubles, so the flat-block oracle is bit-exact)."""
    return int(x + 0.5) if x >= 0 else -int(-x + 0.5)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # truncate the accumulator to the residual bits: emitted high
        # bits otherwise pile up in an unbounded bigint and bit I/O
        # turns quadratic over a corpus-scale entropy stream
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec


def _build_codes(bits: tuple, vals: tuple) -> dict[int, tuple[int, int]]:
    """Annex C code assignment: value -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits value) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    extra = v if v > 0 else v + (1 << cat) - 1
    return cat, extra


def _fdct_quant(block: list[int], quant: tuple) -> list[int]:
    """Level-shift, 2-D DCT-II, quantize — natural order out."""
    if _np is not None:
        x = _np.asarray(block, dtype=_np.float64).reshape(8, 8) - 128.0
        f = _ALPHA_M * (_COS_M.T @ x @ _COS_M)
        q = f / _np.asarray(quant, dtype=_np.float64).reshape(8, 8)
        # round half away from zero (np.round is half-even)
        return [int(v) for v in _np.trunc(q + _np.copysign(0.5, q)).ravel()]
    shifted = [p - 128 for p in block]
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _COS[x][u]
                row = x * 8
                for y in range(8):
                    s += shifted[row + y] * cu * _COS[y][v]
            f = _ALPHA[u][v] * s
            out[u * 8 + v] = _round_half_away(f / quant[u * 8 + v])
    return out


def encode_jpeg(
    pixels: bytes, width: int, height: int, quant: tuple = QUANT_LUMA
) -> bytes:
    """Encode 8-bit grayscale ``pixels`` (row-major, len == w*h) as a
    baseline JFIF stream.  Edge-replicates to pad to 8×8 blocks."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    bw = (width + 7) // 8
    bh = (height + 7) // 8

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # DQT (table 0, 8-bit precision), zigzag order per spec
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(quant[ZIGZAG[k]] for k in range(64))
    # SOF0: baseline, 8-bit, 1 component, no subsampling (1x1), qtable 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    # DHT: DC table 0 then AC table 0
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([cls << 4]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = []
            for y in range(8):
                sy = min(by * 8 + y, height - 1)
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    block.append(pixels[sy * width + sx])
            coef = _fdct_quant(block, quant)
            # DC difference
            diff = coef[0] - prev_dc
            prev_dc = coef[0]
            cat, extra = _magnitude(diff)
            code, ln = dc_codes[cat]
            w.write(code, ln)
            if cat:
                w.write(extra, cat)
            # AC run/size over zigzag order
            zz = [coef[ZIGZAG[k]] for k in range(1, 64)]
            run = 0
            last_nz = -1
            for i, c in enumerate(zz):
                if c:
                    last_nz = i
            for i in range(last_nz + 1):
                c = zz[i]
                if c == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    w.write(code, ln)
                    run -= 16
                cat, extra = _magnitude(c)
                code, ln = ac_codes[(run << 4) | cat]
                w.write(code, ln)
                w.write(extra, cat)
                run = 0
            if last_nz < 62:
                code, ln = ac_codes[0x00]  # EOB
                w.write(code, ln)
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (independent implementation)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, n: int) -> int:
        while self._nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated entropy-coded segment")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
            self._acc = (self._acc << 8) | b
            self._nbits += 8
        self._nbits -= n
        v = (self._acc >> self._nbits) & ((1 << n) - 1)
        # same accumulator truncation as the writer (see _BitWriter)
        self._acc &= (1 << self._nbits) - 1
        return v


def _build_decode_table(bits: tuple, vals: tuple) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol — built by the SAME Annex C counting
    walk but into the inverse mapping the decoder needs."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(extra: int, cat: int) -> int:
    if cat == 0:
        return 0
    return extra if extra >= (1 << (cat - 1)) else extra - (1 << cat) + 1


def _dequant_idct(coef: list[int], quant: tuple) -> list[int]:
    if _np is not None:
        f = _ALPHA_M * (
            _np.asarray(coef, dtype=_np.float64).reshape(8, 8)
            * _np.asarray(quant, dtype=_np.float64).reshape(8, 8)
        )
        s = _COS_M @ f @ _COS_M.T
        p = _np.trunc(s + _np.copysign(0.5, s)) + 128.0
        return [int(v) for v in _np.clip(p, 0, 255).ravel()]
    vals = [coef[i] * quant[i] for i in range(64)]
    out = []
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _COS[x][u]
                row = u * 8
                for v in range(8):
                    s += _ALPHA[u][v] * vals[row + v] * cu * _COS[y][v]
            p = _round_half_away(s) + 128
            out.append(0 if p < 0 else 255 if p > 255 else p)
    return out


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JFIF stream produced by any
    conforming encoder (single component, no restart markers).
    Returns ``(width, height, pixels)``; raises ``ValueError`` on
    malformed or unsupported input."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, tuple] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comp_q = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = body[i + 1 : i + 65]
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                quant[tq] = tuple(nat)
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp != 1:
                raise ValueError("only 8-bit grayscale baseline supported")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("non-baseline JPEG process unsupported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = tuple(body[i + 1 : i + 17])
                n = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("interleaved scans unsupported")
            dc_tid, ac_tid = body[2] >> 4, body[2] & 0xF
            # malformed-input contract is ValueError, not KeyError, when
            # a stream reaches SOS without its referenced DQT/DHT tables
            if comp_q not in quant:
                raise ValueError(f"missing quantization table {comp_q}")
            if (0, dc_tid) not in huff or (1, ac_tid) not in huff:
                raise ValueError(
                    f"missing huffman table (dc={dc_tid}, ac={ac_tid})"
                )
            scan = data[pos + seglen :]
            return _decode_scan(
                scan,
                width,
                height,
                quant[comp_q],
                huff[(0, dc_tid)],
                huff[(1, ac_tid)],
            )
        pos += seglen
    raise ValueError("no SOS marker")


def _decode_scan(scan, width, height, quant, dc_table, ac_table):
    if width is None:
        raise ValueError("SOS before SOF")
    br = _BitReader(scan)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    padded = bytearray(bw * 8 * bh * 8)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            coef = [0] * 64
            cat = _read_symbol(br, dc_table)
            diff = _extend(br.read(cat), cat) if cat else 0
            prev_dc += diff
            coef[0] = prev_dc
            k = 1
            while k < 64:
                rs = _read_symbol(br, ac_table)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                coef[ZIGZAG[k]] = _extend(br.read(size), size)
                k += 1
            pix = _dequant_idct(coef, quant)
            stride = bw * 8
            for y in range(8):
                row = (by * 8 + y) * stride + bx * 8
                padded[row : row + 8] = bytes(pix[y * 8 : (y + 1) * 8])
    # crop padding
    stride = bw * 8
    out = bytearray(width * height)
    for y in range(height):
        out[y * width : (y + 1) * width] = padded[y * stride : y * stride + width]
    return width, height, bytes(out)


def flat_block_expected(v: int, q00: int = QUANT_LUMA[0]) -> int:
    """Closed-form baseline-JPEG reconstruction of a FLAT 8×8 block of
    value ``v``: only the DC coefficient survives (every AC basis sums
    to zero over a constant block), so
    ``decoded = clamp(128 + round(round(8(v-128)/q00)·q00/8))``.
    The llm_jpeg_decode_stats oracle evaluates exactly this in SQL."""
    dc = _round_half_away(8.0 * (v - 128) / q00)
    p = _round_half_away(dc * q00 / 8.0) + 128
    return 0 if p < 0 else 255 if p > 255 else p
