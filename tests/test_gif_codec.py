"""GIF87a/LZW codec (llm/gif.py): exact roundtrips across dictionary
growth/reset and the KwKwK case, malformed-input rejection, and the
multimodal dispatch."""

from __future__ import annotations

import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_etl_spark.llm import gif
from market_etl_spark.llm.multimodal import decode_payload

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    dims=st.sampled_from([(1, 1), (8, 8), (16, 16), (13, 9), (40, 25)]),
    data=st.data(),
)
def test_roundtrip_exact(dims, data):
    w, h = dims
    px = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    ww, hh, dec = gif.decode_gif(gif.encode_gif(px, w, h))
    assert (ww, hh, dec) == (w, h, px)


def test_dictionary_reset_roundtrip():
    """A 100×100 noise image drives the LZW dictionary past 4096
    entries, forcing a mid-stream CLEAR + table reset on both sides."""
    import random

    rng = random.Random(3)
    px = bytes(rng.randrange(256) for _ in range(100 * 100))
    w, h, dec = gif.decode_gif(gif.encode_gif(px, 100, 100))
    assert dec == px


def test_kwkwk_case_roundtrip():
    """aaaa... runs hit the code == next_code (KwKwK) decoder branch."""
    px = bytes([7]) * 400
    _, _, dec = gif.decode_gif(gif.encode_gif(px, 20, 20))
    assert dec == px


def test_malformed_rejected():
    with pytest.raises(ValueError):
        gif.decode_gif(b"\x89PNG not a gif")
    blob = bytearray(gif.encode_gif(bytes(64), 8, 8))
    # flip the interlace flag in the image descriptor (0x2C also occurs
    # as a color value inside the GCT, so use the fixed 13+768 offset)
    idx = 13 + 768
    assert blob[idx] == 0x2C
    blob[idx + 9] |= 0x40
    with pytest.raises(ValueError):
        gif.decode_gif(bytes(blob))
    # truncated inside the color table
    with pytest.raises(ValueError):
        gif.decode_gif(gif.encode_gif(bytes(64), 8, 8)[:100])


def test_structure_is_spec_shaped():
    """Header, LSD, 256-entry grayscale GCT, image descriptor, LZW min
    code size, trailer — byte-level layout per the 87a spec."""
    blob = gif.encode_gif(bytes(range(256)), 16, 16)
    assert blob[:6] == b"GIF87a"
    w, h, packed, _, _ = struct.unpack("<HHBBB", blob[6:13])
    assert (w, h) == (16, 16)
    assert packed & 0x80 and (packed & 0x07) == 7  # GCT, 256 entries
    gct = blob[13 : 13 + 768]
    assert all(gct[3 * i] == gct[3 * i + 1] == gct[3 * i + 2] == i for i in range(256))
    assert blob[13 + 768] == 0x2C
    assert blob[13 + 768 + 10] == 8  # LZW min code size
    assert blob[-1] == 0x3B


def test_decode_payload_gif_dispatch():
    px = bytes((i * 11) % 256 for i in range(64))
    blob = gif.encode_gif(px, 8, 8)
    feats = decode_payload(blob)
    assert feats["format"] == "image/gif"
    assert feats["byte_len"] == len(blob)


def test_multiframe_roundtrip_and_offsets():
    """encode_gif_frames -> decode_gif_frames is identity per frame;
    byte offsets point at each frame's image descriptor (0x2C)."""
    frames = [bytes((f * 31 + i * 7) % 256 for i in range(256)) for f in range(4)]
    blob = gif.encode_gif_frames(frames, 16, 16)
    sw, sh, dec = gif.decode_gif_frames(blob)
    assert (sw, sh) == (16, 16)
    assert len(dec) == 4
    for f, (left, top, w, h, off, px) in enumerate(dec):
        assert (left, top, w, h) == (0, 0, 16, 16)
        assert px == frames[f]
        assert blob[off] == 0x2C
    # first-frame back-compat through the single-image API
    assert gif.decode_gif(blob) == (16, 16, frames[0])


def test_palette_index_out_of_range_is_valueerror():
    """A stream with a small GCT whose LZW indices exceed the table
    must raise the documented ValueError, not IndexError (ADVICE r7)."""
    bad = bytearray(b"GIF87a") + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
    bad += bytes((0, 0, 0, 255, 255, 255))  # 2-entry GCT
    bad += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    bad.append(2)  # LZW min code size
    bad += gif._lzw_encode(bytes([3, 1]), 2)  # index 3 > table size 2
    bad += b"\x3b"
    with pytest.raises(ValueError, match="palette index"):
        gif.decode_gif(bytes(bad))


def test_sample_frames_uses_real_codec(spark):
    """The production frame sampler decodes GIF payloads with the real
    codec: per-frame bytes are the decoded rasters, offsets are image
    descriptor positions, and >max_frames sequences sample evenly."""
    from market_etl_spark.llm.multimodal import sample_frames

    frames = [bytes([f * 10] * 64) for f in range(16)]
    blob = gif.encode_gif_frames(frames, 8, 8)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    out = sample_frames(df, max_frames=8).orderBy("frame_idx").collect()
    assert len(out) == 8  # stride 2 over 16 frames
    for row in out:
        assert bytes(row.frame) == frames[row.frame_idx * 2]
        assert blob[row.frame_offset] == 0x2C
    feats = decode_payload(blob)
    assert feats["n_frames"] == 16


def test_first_frame_decode_is_lazy():
    """decode_gif must not pay for (or fail on) frames after the
    first: a valid first frame followed by truncated garbage still
    decodes, and max_frames stops the scan early."""
    two = gif.encode_gif_frames([bytes(range(16))] * 2, 4, 4)
    # chop mid-way through the SECOND image block (its descriptor
    # offset comes from the codec itself): full decode raises,
    # first-frame decode succeeds
    _sw0, _sh0, full = gif.decode_gif_frames(two)
    second_desc = full[1][4]
    truncated = two[: second_desc + 5]
    with pytest.raises(ValueError):
        gif.decode_gif_frames(truncated)
    w, h, px = gif.decode_gif(truncated)
    assert (w, h, px) == (4, 4, bytes(range(16)))
    _sw, _sh, frames = gif.decode_gif_frames(two, max_frames=1)
    assert len(frames) == 1


def test_sample_frames_degrades_on_gif_lookalike(spark):
    """A payload that merely STARTS with a GIF signature (e.g. text)
    must fall back to byte-stride sampling, not kill the stage."""
    from market_etl_spark.llm.multimodal import sample_frames

    fake = b"GIF87a this is just text that sniffs like a gif " * 40
    df = spark.createDataFrame([(1, bytearray(fake))], "doc_id long, payload binary")
    rows = sample_frames(df).collect()
    assert len(rows) == min(8, len(fake) // 1000 + 1)
    assert rows[0].frame_offset == 0  # stride path, not a decoded frame


def test_count_frames_matches_decode_without_lzw():
    """count_frames agrees with the full decode on every well-formed
    stream, costs no LZW work (it never touches the code tables), and
    carries the same framing-level ValueError contract (ADVICE r8)."""
    for n in (1, 2, 4, 16):
        frames = [bytes((f * 13 + i) % 256 for i in range(64)) for f in range(n)]
        blob = gif.encode_gif_frames(frames, 8, 8)
        assert gif.count_frames(blob) == n
        _sw, _sh, dec = gif.decode_gif_frames(blob)
        assert len(dec) == n
    with pytest.raises(ValueError, match="signature"):
        gif.count_frames(b"NOTAGIF")
    with pytest.raises(ValueError, match="no image descriptor"):
        gif.count_frames(b"GIF87a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b")
    # truncated descriptor is a framing error -> ValueError, like decode
    one = gif.encode_gif(bytes(range(16)), 4, 4)
    _sw, _sh, full = gif.decode_gif_frames(one)
    with pytest.raises(ValueError):
        gif.count_frames(one[: full[0][4] + 5])


def test_decode_payload_counts_frames_without_decoding_them():
    """The metadata path reports n_frames over a CORRUPT-later-frame
    animation (framing intact, pixels broken): count_frames walks the
    sub-block lengths so the corruption is invisible to it, while the
    feature hash still comes from the real frame-0 decode."""
    frames = [bytes([f * 10] * 64) for f in range(6)]
    blob = bytearray(gif.encode_gif_frames(frames, 8, 8))
    # corrupt one LZW byte INSIDE frame 4's data sub-blocks (framing
    # lengths untouched): full decode now raises, counting does not
    _sw, _sh, full = gif.decode_gif_frames(blob)
    off4 = full[4][4]
    blob[off4 + 12] ^= 0xFF
    blob = bytes(blob)
    assert gif.count_frames(blob) == 6
    feats = decode_payload(blob)
    assert feats["n_frames"] == 6
    ref = decode_payload(gif.encode_gif_frames(frames, 8, 8))
    assert feats["feature_crc"] == ref["feature_crc"]  # frame 0 decode


def test_count_frames_rejects_torn_sub_blocks():
    """A sub-block length byte promising absent bytes (or a missing
    terminator) is a FRAMING error: count_frames must raise exactly
    like the decoder, never count a torn frame (review r9)."""
    blob = gif.encode_gif_frames([bytes(range(64))] * 3, 8, 8)
    with pytest.raises(ValueError, match="truncated sub-block"):
        gif.count_frames(blob[:-10])
    with pytest.raises(ValueError, match="truncated sub-block"):
        gif.decode_gif_frames(blob[:-10])

def test_count_frames_rejects_truncated_extension():
    """A stream cut INSIDE an extension's sub-blocks must be a framing
    error, not a positive count (ADVICE r9: the skip loop used to fall
    off EOF and return the frames counted so far)."""
    blob = gif.encode_gif_frames([bytes(range(64))] * 2, 8, 8)
    _sw, _sh, full = gif.decode_gif_frames(blob)
    # cut before frame 1's descriptor, splice an application extension
    # promising an 11-byte sub-block with only 5 bytes present
    torn = blob[: full[1][4]] + b"\x21\xff\x0bNETSC"
    with pytest.raises(ValueError, match="truncated extension"):
        gif.count_frames(torn)
