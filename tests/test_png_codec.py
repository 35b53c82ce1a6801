"""Pure-stdlib PNG codec (llm/png.py): spec conformance via
independent-implementation roundtrips, corruption detection, and the
multimodal dispatch that uses it."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_etl_spark.llm import png
from market_etl_spark.llm.multimodal import decode_payload

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(
    width=st.integers(1, 12),
    height=st.integers(1, 12),
    color_type=st.sampled_from([0, 2, 6]),
    data=st.data(),
)
def test_roundtrip_all_filters_and_color_types(width, height, color_type, data):
    """decode(encode(x)) == x for arbitrary images. The encoder cycles
    row filters (row % 5), so any image ≥ 5 rows exercises every
    unfilter path; encoder and decoder share no filter code."""
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=width * height * ch,
                max_size=width * height * ch,
            )
        )
    )
    blob = png.encode_png(pixels, width, height, color_type)
    w, h, c, out = png.decode_png(blob)
    assert (w, h, c) == (width, height, ch)
    assert out == pixels


def test_all_five_filters_present_in_stream():
    """A 10-row image must carry filter bytes 0..4 (cycled) — proving
    the roundtrip test above really exercises Sub/Up/Average/Paeth."""
    pixels = bytes(range(10 * 3)) * 10  # 10x10 RGB... 10*10*3 = 300
    pixels = bytes((i * 7) % 256 for i in range(10 * 10 * 3))
    blob = png.encode_png(pixels, 10, 10, 2)
    # extract the raw (decompressed) filter bytes
    pos, idat = 8, bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = 10 * 3
    filters = {raw[y * (stride + 1)] for y in range(10)}
    assert filters == {0, 1, 2, 3, 4}


def test_crc_corruption_detected():
    blob = bytearray(png.encode_png(bytes(64), 8, 8, 0))
    # flip a byte inside the IDAT body (after sig+IHDR chunk)
    blob[60] ^= 0xFF
    with pytest.raises(ValueError):
        png.decode_png(bytes(blob))


def test_truncated_inside_crc_raises_valueerror():
    """A stream cut INSIDE a chunk's 4 CRC bytes must raise the
    documented ValueError, not struct.error (ADVICE r6)."""
    blob = png.encode_png(bytes(64), 8, 8, 0)
    # cut 2 bytes into the IHDR CRC: sig(8) + len(4) + tag(4) + body(13) + 2
    with pytest.raises(ValueError):
        png.decode_png(blob[: 8 + 4 + 4 + 13 + 2])


def test_wav_truncated_fmt_raises_valueerror():
    """fmt chunk shorter than 16 bytes → ValueError, not struct.error."""
    from market_etl_spark.llm import wav_audio

    short_fmt = struct.pack("<HH", 1, 1)  # only 4 of 16 bytes
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(short_fmt))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(short_fmt))
        + short_fmt
    )
    with pytest.raises(ValueError):
        wav_audio.decode_wav(blob)


def test_bad_signature_and_unsupported_rejected():
    with pytest.raises(ValueError):
        png.decode_png(b"JFIF not a png at all")
    # 16-bit depth unsupported: hand-build an IHDR claiming depth=16
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        png.decode_png(blob)


def test_resize_nearest_semantics():
    """2×2 checkerboard upsampled 2× keeps the quadrant structure."""
    src = bytes([0, 255, 255, 0])  # gray 2x2
    out = png.resize_nearest(src, 2, 2, 1, 4, 4)
    assert len(out) == 16
    assert out[0] == 0 and out[3] == 255  # top-left / top-right quadrants
    assert out[12] == 255 and out[15] == 0  # bottom-left / bottom-right


def test_decode_payload_dispatches_on_signature():
    """PNG payloads take the real codec path (format + pixel-hash);
    other bytes keep the fake/raw stub."""
    pixels = bytes((i * 3) % 256 for i in range(16 * 16))
    blob = png.encode_png(pixels, 16, 16, 0)
    feats = decode_payload(blob)
    assert feats["format"] == "image/png"
    assert feats["n_frames"] == 1
    assert feats["byte_len"] == len(blob)
    # hash is over DECODED pixels, not the compressed stream
    from market_etl_spark.llm.multimodal import _rolling_hash

    assert feats["feature_crc"] == _rolling_hash(pixels)

    raw = decode_payload(b"not an image")
    assert raw["format"] == "fake/raw"


def test_resize_images_png_path(spark):
    """The Spark resize stage decodes real PNGs and nearest-neighbor
    resamples them (not the tile/truncate fake)."""
    from market_etl_spark.llm.multimodal import resize_images

    pixels = bytes((i * 5) % 256 for i in range(8 * 8))
    blob = png.encode_png(pixels, 8, 8, 0)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    out = resize_images(df, width=4, height=4).collect()[0]
    expected = png.resize_nearest(pixels, 8, 8, 1, 4, 4)
    assert bytes(out.resized) == expected
    assert (out.width, out.height, out.channels) == (4, 4, 1)
    assert len(out.resized) == 4 * 4 * out.channels


def test_resize_images_rgb_channels_contract(spark):
    """Multi-channel PNGs report channels=3/4 and size w*h*channels —
    the explicit-channels contract from ADVICE r6."""
    from market_etl_spark.llm.multimodal import resize_images

    rgb = bytes((i * 7) % 256 for i in range(4 * 4 * 3))
    blob = png.encode_png(rgb, 4, 4, 2)  # color type 2 = RGB
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    out = resize_images(df, width=2, height=2).collect()[0]
    assert out.channels == 3
    assert len(out.resized) == 2 * 2 * 3
    assert bytes(out.resized) == png.resize_nearest(rgb, 4, 4, 3, 2, 2)


# ---------------------------------------------------------------------------
# WAV codec (stdlib wave encoder vs independent RIFF decoder)
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=300),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, rate):
    from market_etl_spark.llm import wav_audio

    blob = wav_audio.encode_wav(samples, sample_rate=rate, channels=1)
    got_rate, channels, got = wav_audio.decode_wav(blob)
    assert got_rate == rate and channels == 1
    assert got == samples


def test_wav_rejects_malformed():
    from market_etl_spark.llm import wav_audio

    with pytest.raises(ValueError):
        wav_audio.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        wav_audio.decode_wav(b"not riff at all, clearly")
    # 8-bit PCM rejected: hand-build fmt with bits=8
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        wav_audio.decode_wav(blob)


def test_decode_payload_wav_dispatch():
    from market_etl_spark.llm import wav_audio

    blob = wav_audio.encode_wav([0, 1000, -1000, 32767], sample_rate=8000)
    feats = decode_payload(blob)
    assert feats["format"] == "audio/wav"
    assert feats["n_frames"] == 4
