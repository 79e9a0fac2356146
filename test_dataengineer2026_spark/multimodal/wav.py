"""Minimal pure-stdlib WAV (RIFF PCM) codec.

A canonical WAV file is a RIFF container: ``RIFF<size>WAVE`` then chunks,
of which ``fmt `` (PCM format descriptor) and ``data`` (raw little-endian
samples) matter. PCM needs no compression library at all — ``struct`` is
the whole decoder. Supports 16-bit signed PCM, any channel count/rate;
anything else (float PCM, extensible format, compressed codecs) raises
ValueError — explicit unsupported, never a silent fake.

Together with png.py this makes both image and audio decode REAL in the
multimodal surface: bytes in, actual samples out, checksummable against
a SQL oracle. The query layer wraps both in ``mapInPandas`` so decode
runs Arrow-batch-parallel on executors.
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int, n_channels: int = 1) -> bytes:
    """16-bit PCM samples (interleaved if multi-channel) -> WAV bytes."""
    if len(samples) % n_channels:
        raise ValueError("sample count not divisible by channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """WAV bytes -> (sample_rate, n_channels, bit_depth, samples).

    Real decode: RIFF walk, fmt parse, PCM16 sample unpack. Raises
    ValueError for non-RIFF input, non-PCM encodings, or depths != 16.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF container")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bit_depth = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format != 1:
        raise ValueError(f"unsupported WAV encoding {audio_format} (PCM only)")
    if bit_depth != 16:
        raise ValueError(f"unsupported bit depth {bit_depth} (16-bit only)")
    if n_channels < 1:
        raise ValueError("WAV fmt declares zero channels")
    if len(data) % (2 * n_channels):
        raise ValueError(
            f"malformed PCM16 data chunk: {len(data)} bytes is not a "
            f"whole number of {n_channels}-channel frames"
        )
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data))
    return sample_rate, n_channels, bit_depth, samples
