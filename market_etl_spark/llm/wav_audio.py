"""Pure-stdlib WAV (RIFF/PCM) audio codec for the multimodal pipeline.

The ENCODER delegates to Python's built-in :mod:`wave` module (16-bit
PCM writer); the DECODER is an independent struct-level RIFF parser
written directly against the RIFF/WAVE container layout (chunk walk,
``fmt `` validation, little-endian 16-bit sample unpack).  Because the
two sides share no code — one is CPython's stdlib, one is ours —
roundtrip equality in tests evidences container-format conformance,
the same independence argument as the PNG codec (:mod:`.png`).

Supported: PCM (audio format 1), 16-bit, any channel count / sample
rate; other encodings raise ``ValueError``.
"""

from __future__ import annotations

import io
import struct
import wave


def encode_wav(
    samples: list[int], sample_rate: int = 44100, channels: int = 1
) -> bytes:
    """Encode 16-bit PCM samples (interleaved if multi-channel) via
    the stdlib ``wave`` writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE PCM-16 payload WITHOUT the ``wave`` module:
    returns ``(sample_rate, channels, samples)`` with samples
    interleaved.  Raises ``ValueError`` on non-PCM / non-16-bit /
    malformed containers."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data) + 1:  # +1: some writers pad oddly
        raise ValueError("truncated RIFF payload")
    pos = 12
    sample_rate = channels = None
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt, channels, sample_rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt != 1:
                raise ValueError(f"non-PCM WAV (format {fmt}) not supported")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, got {bits}")
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if len(pcm) % 2:
        raise ValueError("odd PCM byte count")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return sample_rate, channels, samples
