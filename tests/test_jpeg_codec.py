"""Baseline-DCT JPEG codec (llm/jpeg.py): flat-block closed-form
conformance, bounded-loss roundtrips, marker/corruption rejection, the
numpy-vs-pure-Python transform equivalence, and the multimodal
dispatch."""

from __future__ import annotations

import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_etl_spark.llm import jpeg
from market_etl_spark.llm.multimodal import decode_payload

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_ONES = tuple([1] * 64)


def _flat_image(vals, bw=2, bh=2):
    """bw×bh flat 8×8 blocks → (pixels, width, height)."""
    w, h = bw * 8, bh * 8
    px = bytearray(w * h)
    for b, v in enumerate(vals):
        bx, by = b % bw, b // bw
        for y in range(8):
            row = (by * 8 + y) * w + bx * 8
            px[row : row + 8] = bytes([v]) * 8
    return bytes(px), w, h


@settings(**_SETTINGS)
@given(vals=st.lists(st.integers(0, 255), min_size=4, max_size=4))
def test_flat_blocks_match_closed_form(vals):
    """For flat blocks only the DC coefficient survives, so the decoded
    value has an exact closed form — the basis of the SQL oracle."""
    px, w, h = _flat_image(vals)
    _, _, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, w, h))
    for b, v in enumerate(vals):
        bx, by = b % 2, b // 2
        got = {dec[(by * 8 + y) * w + bx * 8 + x] for y in range(8) for x in range(8)}
        assert got == {jpeg.flat_block_expected(v)}, (b, v)


@settings(**_SETTINGS)
@given(
    dims=st.sampled_from([(8, 8), (16, 8), (13, 9), (24, 17)]),
    data=st.data(),
)
def test_roundtrip_bounded_error_allones_quant(dims, data):
    """With an all-ones quant table every coefficient rounds by ≤0.5,
    so the per-pixel reconstruction error is small and bounded —
    arbitrary-content coverage the lossy format can support."""
    w, h = dims
    px = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    ww, hh, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, w, h, quant=_ONES))
    assert (ww, hh) == (w, h)
    assert max(abs(a - b) for a, b in zip(px, dec)) <= 3


def test_numpy_and_pure_python_paths_bit_identical():
    """The numpy fast path must produce the SAME bitstream and decode
    as the pure-Python reference loops (exactness argument in the
    module: elementwise alpha with the exact 0.125 DC entry)."""
    import random

    rng = random.Random(11)
    px = bytes(rng.randrange(256) for _ in range(16 * 16))
    saved = jpeg._np
    assert saved is not None, "numpy expected in this environment"
    try:
        blob_np = jpeg.encode_jpeg(px, 16, 16)
        dec_np = jpeg.decode_jpeg(blob_np)
        jpeg._np = None
        blob_py = jpeg.encode_jpeg(px, 16, 16)
        dec_py = jpeg.decode_jpeg(blob_py)
    finally:
        jpeg._np = saved
    assert blob_np == blob_py
    assert dec_np == dec_py


def test_malformed_rejected():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x89PNG not a jpeg")
    px, w, h = _flat_image([10, 20, 30, 40])
    blob = bytearray(jpeg.encode_jpeg(px, w, h))
    # corrupt the SOF0 marker into a progressive SOF2
    idx = bytes(blob).find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(blob))
    # truncated inside a segment
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(jpeg.encode_jpeg(px, w, h)[:20])


def test_byte_stuffing_roundtrips():
    """A block pattern whose entropy stream contains 0xFF bytes must
    survive the stuff/unstuff path; verified by scanning for stuffed
    pairs across many patterns and requiring at least one hit."""
    import random

    rng = random.Random(5)
    found = False
    for _ in range(32):
        px = bytes(rng.randrange(256) for _ in range(16 * 16))
        blob = jpeg.encode_jpeg(px, 16, 16, quant=_ONES)
        scan = blob[blob.find(b"\xff\xda") + 10 : -2]
        if b"\xff\x00" in scan:
            found = True
            w, h, dec = jpeg.decode_jpeg(blob)
            assert len(dec) == w * h
            assert max(abs(a - b) for a, b in zip(px, dec)) <= 3
    assert found, "no pattern produced a stuffed 0xFF — scan coverage gap"


def test_decode_payload_jpeg_dispatch():
    px, w, h = _flat_image([5, 99, 180, 250])
    blob = jpeg.encode_jpeg(px, w, h)
    feats = decode_payload(blob)
    assert feats["format"] == "image/jpeg"
    assert feats["n_frames"] == 1
    assert feats["byte_len"] == len(blob)


def test_edge_padding_cropped():
    """Non-multiple-of-8 dimensions: encoder edge-replicates, decoder
    crops back — output size must equal the original."""
    px = bytes(((x * 3 + y * 5) % 256) for y in range(9) for x in range(13))
    w, h, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, 13, 9, quant=_ONES))
    assert (w, h) == (13, 9)
    assert len(dec) == 13 * 9


def test_missing_tables_are_valueerror():
    """A stream reaching SOS without its DQT/DHT tables must raise the
    documented ValueError, not KeyError (ADVICE r7)."""
    blob = jpeg.encode_jpeg(bytes(range(64)), 8, 8)
    for strip_marker, msg in ((0xC4, "huffman"), (0xDB, "quantization")):
        out = bytearray(blob[:2])
        pos = 2
        while pos < len(blob):
            marker = blob[pos + 1]
            if marker == 0xDA:
                out += blob[pos:]
                break
            seglen = int.from_bytes(blob[pos + 2 : pos + 4], "big")
            if marker != strip_marker:
                out += blob[pos : pos + 2 + seglen]
            pos += 2 + seglen
        with pytest.raises(ValueError, match=msg):
            jpeg.decode_jpeg(bytes(out))


def test_bit_io_accumulator_stays_bounded():
    """The entropy-stream bit accumulators must truncate to their
    residual bits (ADVICE r7: unbounded bigint growth turns bit I/O
    quadratic on corpus-scale images)."""
    w = jpeg._BitWriter()
    for i in range(10_000):
        w.write(i & 0x3FF, 10)
    assert w._acc.bit_length() <= 8
    data = bytes(w.out) + b"\xff\xd9"
    r = jpeg._BitReader(bytes(w.out))
    for i in range(10_000):
        assert r.read(10) == (i & 0x3FF)
        assert r._acc.bit_length() <= 8
