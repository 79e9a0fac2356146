"""PNG codec unit tests (multimodal real-decode surface, MM4)."""

from __future__ import annotations

import struct
import zlib

import pytest

from test_dataengineer2026_spark.multimodal.binary_ops import decode_image
from test_dataengineer2026_spark.multimodal.png import decode_png, encode_png


def _gray(w: int, h: int, seed: int = 0) -> bytes:
    return bytes((seed + 31 * y + 7 * x) % 256 for y in range(h) for x in range(w))


def test_roundtrip_gray_all_filters():
    # 7 rows -> filter types 0,1,2,3,4,0,1 all exercised
    w, h = 6, 7
    px = _gray(w, h, seed=5)
    out = decode_png(encode_png(w, h, px))
    assert out == (w, h, 8, 0, px)


def test_roundtrip_rgb():
    w, h = 5, 6
    px = bytes((x * 3 + y * 5 + c) % 256 for y in range(h) for x in range(w) for c in range(3))
    out = decode_png(encode_png(w, h, px, color_type=2))
    assert out == (w, h, 8, 2, px)


def test_roundtrip_1x1():
    assert decode_png(encode_png(1, 1, b"\x42"))[4] == b"\x42"


def test_signature_and_ihdr_layout():
    p = encode_png(3, 2, _gray(3, 2))
    assert p[:8] == b"\x89PNG\r\n\x1a\n"
    # first chunk is IHDR with length 13
    assert struct.unpack(">I", p[8:12])[0] == 13
    assert p[12:16] == b"IHDR"
    w, h, depth, ctype = struct.unpack(">IIBB", p[16:26])
    assert (w, h, depth, ctype) == (3, 2, 8, 0)


def test_idat_is_valid_zlib_with_per_row_filter_bytes():
    w, h = 4, 3
    p = encode_png(w, h, _gray(w, h))
    # locate IDAT
    pos = 8
    while True:
        (length,) = struct.unpack_from(">I", p, pos)
        tag = p[pos + 4 : pos + 8]
        if tag == b"IDAT":
            raw = zlib.decompress(p[pos + 8 : pos + 8 + length])
            break
        pos += 12 + length
    assert len(raw) == (w + 1) * h
    assert [raw[i * (w + 1)] for i in range(h)] == [0, 1, 2]


def test_decode_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + b"\x00" * 20)


def test_decode_rejects_unsupported_depth():
    # hand-build a 16-bit IHDR
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr)
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_decode_rejects_truncated_idat():
    p = bytearray(encode_png(4, 4, _gray(4, 4)))
    # corrupt the IDAT length field of the zlib stream by dropping bytes
    with pytest.raises((ValueError, zlib.error)):
        decode_png(bytes(p[:-20]))


def test_decode_image_dispatches_png():
    w, h = 4, 5
    px = _gray(w, h, seed=9)
    width, height, depth, channels, pixels = decode_image(encode_png(w, h, px))
    assert (width, height, depth, channels, pixels) == (w, h, 8, 1, px)


def test_decode_image_unsupported_format_raises_value_error():
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"\xff\xd8\xff\xe0JFIF-ish")


# WAV codec (MM5) — same real-decode contract as PNG


def test_wav_roundtrip_and_errors():
    from test_dataengineer2026_spark.multimodal.wav import decode_wav, encode_wav

    s = [((7 * 31 + i * 17) % 65536) - 32768 for i in range(25)]
    sr, nch, depth, out = decode_wav(encode_wav(s, 8000))
    assert (sr, nch, depth, out) == (8000, 1, 16, s)
    assert decode_wav(encode_wav(s[:24], 16000, n_channels=2))[1] == 2
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError):
        decode_wav(encode_wav(s, 8000)[:-10])


def test_wav_layout_is_canonical_riff():
    import struct

    from test_dataengineer2026_spark.multimodal.wav import encode_wav

    p = encode_wav([0, 1, -1], 44100)
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    assert p[12:16] == b"fmt " and struct.unpack_from("<I", p, 16)[0] == 16
    fmt_code, nch, rate = struct.unpack_from("<HHI", p, 20)
    assert (fmt_code, nch, rate) == (1, 1, 44100)
