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


def test_roundtrip_palette():
    """Colour type 3: indices encode through PLTE and decode back as
    the expanded RGB pixels, through all five scanline filters."""
    w, h = 4, 6
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)]
    idx = bytes((x + y) % len(palette) for y in range(h) for x in range(w))
    out = decode_png(encode_png(w, h, idx, color_type=3, palette=palette))
    expected = bytes(b for i in idx for b in palette[i])
    assert out == (w, h, 8, 3, expected)


def test_roundtrip_16bit_gray_and_rgb():
    """16-bit samples (big-endian) round-trip bit-exactly through the
    byte-level filters; bpp doubles so the left-neighbor distance in
    Sub/Average/Paeth is 2 bytes per channel."""
    w, h = 5, 7
    gray16 = bytes(((31 * y + 7 * x + c) * 97) % 256
                   for y in range(h) for x in range(w) for c in range(2))
    assert decode_png(encode_png(w, h, gray16, bit_depth=16)) == (w, h, 16, 0, gray16)
    rgb16 = bytes(((13 * y + 5 * x + c) * 53) % 256
                  for y in range(h) for x in range(w) for c in range(6))
    assert decode_png(
        encode_png(w, h, rgb16, color_type=2, bit_depth=16)
    ) == (w, h, 16, 2, rgb16)


def test_roundtrip_adam7_interlaced():
    """Adam7: seven sub-image passes, each independently filtered, must
    scatter back to the exact original pixels — across grey, RGB,
    palette and 16-bit, and at dims both below and above the 8x8 tile
    (small dims leave some passes empty)."""
    for w, h in ((1, 1), (3, 2), (8, 8), (13, 11)):
        px = _gray(w, h, seed=w * 17 + h)
        assert decode_png(encode_png(w, h, px, interlace=True)) == (w, h, 8, 0, px)
    w, h = 10, 9
    rgb = bytes((x * 3 + y * 5 + c) % 256
                for y in range(h) for x in range(w) for c in range(3))
    assert decode_png(
        encode_png(w, h, rgb, color_type=2, interlace=True)
    ) == (w, h, 8, 2, rgb)
    palette = [(9, 8, 7), (1, 2, 3), (200, 100, 50)]
    idx = bytes((x + 2 * y) % 3 for y in range(h) for x in range(w))
    expected = bytes(b for i in idx for b in palette[i])
    assert decode_png(
        encode_png(w, h, idx, color_type=3, palette=palette, interlace=True)
    ) == (w, h, 8, 3, expected)
    g16 = bytes(((31 * y + 7 * x + c) * 89) % 256
                for y in range(h) for x in range(w) for c in range(2))
    assert decode_png(
        encode_png(w, h, g16, bit_depth=16, interlace=True)
    ) == (w, h, 16, 0, g16)


def test_roundtrip_alpha_types():
    """Colour types 4 (grey+alpha) and 6 (RGBA) at 8 and 16 bits: the
    alpha sample rides in the scanline like any other channel, so the
    filter left-neighbor distance (bpp) grows to 2/4 (8-bit) and 4/8
    (16-bit) bytes — round-trip bit-exactly, plain and interlaced."""
    w, h = 7, 6
    for ctype, n_ch in ((4, 2), (6, 4)):
        for depth in (8, 16):
            n = n_ch * (depth // 8)
            px = bytes(((11 * y + 5 * x + 3 * c) * 59) % 256
                       for y in range(h) for x in range(w) for c in range(n))
            assert decode_png(
                encode_png(w, h, px, color_type=ctype, bit_depth=depth)
            ) == (w, h, depth, ctype, px)
            assert decode_png(
                encode_png(w, h, px, color_type=ctype, bit_depth=depth,
                           interlace=True)
            ) == (w, h, depth, ctype, px)


def test_alpha_sub_byte_depth_rejected():
    with pytest.raises(ValueError, match="unsupported bit_depth"):
        encode_png(1, 1, b"\x00\x00", color_type=4, bit_depth=4)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 6, 0, 0, 0)
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr)
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_decode_image_tuple_describes_returned_buffer():
    """decode_image's (depth, channels) must describe the buffer it
    returns: palette comes back PLTE-expanded 8-bit RGB (depth 8, 3
    channels, whatever the file's index depth), RGBA reports 4
    channels — stride = w*channels*(depth//8) always holds."""
    palette = [(10, 20, 30), (40, 50, 60)]
    idx = bytes([0, 1, 1, 0])
    w, h, depth, channels, px = decode_image(
        encode_png(2, 2, idx, color_type=3, palette=palette, bit_depth=2)
    )
    assert (depth, channels) == (8, 3)
    assert len(px) == w * h * channels * (depth // 8)
    rgba = bytes(range(2 * 1 * 4))
    w, h, depth, channels, px = decode_image(
        encode_png(2, 1, rgba, color_type=6)
    )
    assert (depth, channels, px) == (8, 4, rgba)


def test_adam7_truncated_pass_raises():
    p = bytearray(encode_png(13, 11, _gray(13, 11), interlace=True))
    with pytest.raises((ValueError, zlib.error)):
        decode_png(bytes(p[:-25]))


def _hostile_interlaced_png() -> bytes:
    """~100-byte interlaced PNG declaring 2^60 pixels — the cheapest
    possible allocation bomb: valid signature, valid CRCs, tiny IDAT."""
    w, h = 1 << 30, 1 << 30
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)  # interlace=1
    idat = zlib.compress(b"\x00" * 16)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_adam7_huge_declared_dims_raise_value_error_without_allocating():
    """A ~100-byte interlaced PNG declaring huge dimensions must raise
    ValueError (quarantinable data error) BEFORE allocating the
    width*height output buffer — previously this hit OverflowError/
    MemoryError from bytearray(width*height*out_bpp) and killed the
    job instead of quarantining one row."""
    payload = _hostile_interlaced_png()
    assert len(payload) < 200
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(payload)


def test_decode_png_status_quarantines_hostile_header(spark):
    """End-to-end MM9 contract: one hostile payload quarantines ONE ROW
    ('corrupt') while the good rows still decode — the Spark job never
    dies from a malformed 100-byte file."""
    from test_dataengineer2026_spark.multimodal.binary_ops import (
        decode_png_status,
    )

    good = encode_png(2, 2, _gray(2, 2))
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(b"NOTPNG__plus_some_padding")),
            (3, bytearray(_hostile_interlaced_png())),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_png_status(df).collect()}
    assert rows[1]["status"] == "ok"
    assert (rows[1]["width"], rows[1]["height"]) == (2, 2)
    assert rows[2]["status"] == "bad_signature"
    assert rows[3]["status"] == "corrupt"


def test_fuzz_decoders_raise_only_quarantinable_errors():
    """MM9 catch-list completeness: every exception a hostile payload
    can push out of decode_png/decode_wav must be in the quarantine
    set (ValueError, struct.error, zlib.error, IndexError, KeyError,
    OverflowError) — anything else would escape the per-row 'corrupt'
    classification and kill the job. Seeded, so failures reproduce."""
    import random

    from test_dataengineer2026_spark.multimodal.wav import decode_wav, encode_wav

    data_errors = (ValueError, struct.error, zlib.error, IndexError, KeyError, OverflowError)
    rng = random.Random(7)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    payloads = []
    # random tails behind the PNG magic
    for _ in range(200):
        payloads.append(
            ("png", b"\x89PNG\r\n\x1a\n"
             + bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200))))
        )
    # valid chunk framing, adversarial IHDR fields
    for _ in range(200):
        ihdr = struct.pack(
            ">IIBBBBB", rng.randrange(0, 1 << 32), rng.randrange(0, 1 << 32),
            rng.choice([0, 1, 2, 4, 8, 16, 32]), rng.choice([0, 2, 3, 4, 6, 7]),
            0, 0, rng.choice([0, 1, 2]),
        )
        idat = zlib.compress(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64))))
        payloads.append(
            ("png", b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
        )
    # bit-flipped valid files (decoder reached with plausible structure)
    good_png = bytearray(encode_png(32, 32, _gray(32, 32)))
    good_wav = bytearray(encode_wav([0, 1, -1, 32767, -32768] * 8, 8000, 1))
    for _ in range(200):
        p = bytearray(good_png)
        for _ in range(rng.randrange(1, 6)):
            p[rng.randrange(len(p))] = rng.randrange(256)
        payloads.append(("png", bytes(p)))
    for _ in range(200):
        p = bytearray(good_wav)
        for _ in range(rng.randrange(1, 6)):
            p[rng.randrange(len(p))] = rng.randrange(256)
        payloads.append(("wav", bytes(p)))
    for _ in range(200):
        payloads.append(
            ("wav", b"RIFF" + bytes(rng.randrange(256) for _ in range(rng.randrange(8, 150))))
        )

    for kind, payload in payloads:
        try:
            (decode_png if kind == "png" else decode_wav)(payload)
        except data_errors:
            pass  # quarantinable: classified 'corrupt', job survives


def test_roundtrip_sub_byte_depths():
    """1/2/4-bit grey and palette: samples travel one-per-byte unscaled,
    pack MSB-first into scanlines (with pad bits at row ends), and
    round-trip bit-exactly — plain and Adam7-interlaced."""
    for depth in (1, 2, 4):
        w, h = 11, 7  # 11 samples/row => every depth leaves pad bits
        mx = 1 << depth
        px = bytes((x + 3 * y) % mx for y in range(h) for x in range(w))
        assert decode_png(encode_png(w, h, px, bit_depth=depth)) == (
            w, h, depth, 0, px
        )
        assert decode_png(
            encode_png(w, h, px, bit_depth=depth, interlace=True)
        ) == (w, h, depth, 0, px)
        palette = [(i * 5, i * 7 % 256, i * 11 % 256) for i in range(mx)]
        expected = bytes(b for i in px for b in palette[i])
        assert decode_png(
            encode_png(w, h, px, color_type=3, palette=palette, bit_depth=depth)
        ) == (w, h, depth, 3, expected)


def test_sub_byte_sample_range_enforced():
    with pytest.raises(ValueError, match="exceeds 2-bit range"):
        encode_png(2, 1, bytes([1, 4]), bit_depth=2)


def test_16bit_palette_rejected():
    with pytest.raises(ValueError, match="unsupported bit_depth"):
        encode_png(1, 1, b"\x00", color_type=3,
                   palette=[(0, 0, 0)], bit_depth=16)


def test_palette_missing_plte_raises():
    p = bytearray(encode_png(2, 2, bytes([0, 1, 1, 0]), color_type=3,
                             palette=[(1, 2, 3), (4, 5, 6)]))
    plte_at = p.index(b"PLTE") - 4
    del p[plte_at : plte_at + 12 + 6]  # strip the whole PLTE chunk
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(bytes(p))


def test_palette_index_out_of_range_raises():
    with pytest.raises(ValueError, match="outside palette"):
        encode_png(2, 1, bytes([0, 9]), color_type=3, palette=[(0, 0, 0)])
    # hand-build a decode-side violation: valid 2-entry PLTE, index 5
    good = encode_png(1, 1, bytes([0]), color_type=3,
                      palette=[(0, 0, 0), (1, 1, 1)])
    bad_idat = zlib.compress(bytes([0, 5]))  # filter 0, index 5
    rebuilt = bytearray()
    pos = 8
    rebuilt += good[:8]
    while pos + 8 <= len(good):
        (length,) = struct.unpack_from(">I", good, pos)
        tag = good[pos + 4 : pos + 8]
        if tag == b"IDAT":
            crc = zlib.crc32(b"IDAT" + bad_idat) & 0xFFFFFFFF
            rebuilt += struct.pack(">I", len(bad_idat)) + b"IDAT" + bad_idat
            rebuilt += struct.pack(">I", crc)
        else:
            rebuilt += good[pos : pos + 12 + length]
        pos += 12 + length
    with pytest.raises(ValueError, match="outside PLTE"):
        decode_png(bytes(rebuilt))


def test_decode_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + b"\x00" * 20)


def test_decode_rejects_unsupported_depth():
    # hand-build a 4-bit RGB IHDR — a combination the PNG spec forbids
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)
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


def test_wav_rejects_odd_data_chunk():
    """A PCM16 data chunk whose byte length is not a whole number of
    frames is malformed — the decoder must raise, not silently truncate."""
    import struct

    from test_dataengineer2026_spark.multimodal.wav import decode_wav, encode_wav

    p = bytearray(encode_wav([0, 1, -1], 8000))
    # grow the data chunk by one trailing byte and patch both size fields
    data_size_pos = p.index(b"data") + 4
    (data_size,) = struct.unpack_from("<I", p, data_size_pos)
    struct.pack_into("<I", p, data_size_pos, data_size + 1)
    struct.pack_into("<I", p, 4, struct.unpack_from("<I", p, 4)[0] + 1)
    p += b"\x00"
    with pytest.raises(ValueError, match="whole number of .*frames"):
        decode_wav(bytes(p))


def test_ahash_is_64_bit_bounded_and_correct(spark):
    """aHash must downsample to 8x8 before thresholding: large images
    (here 64x64 = 4096 px, which overflowed int64 pre-fix) still yield a
    64-bit hash, and a half-bright 16x16 image hashes to exactly the
    top-four-grid-rows bit pattern."""
    from test_dataengineer2026_spark.multimodal.binary_ops import decode_png_ahash

    big = encode_png(64, 64, _gray(64, 64, seed=3))
    half = encode_png(16, 16, b"\xff" * (16 * 8) + b"\x00" * (16 * 8))
    flat = encode_png(9, 9, b"\x40" * 81)
    df = spark.createDataFrame(
        [(1, bytearray(big)), (2, bytearray(half)), (3, bytearray(flat))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_png_ahash(df).collect()}
    int64_min, int64_max = -(1 << 63), (1 << 63) - 1
    assert all(int64_min <= r["ahash"] <= int64_max for r in rows.values())
    assert rows[2]["ahash"] == (1 << 32) - 1  # grid rows 0-3 set -> bits 0..31
    assert rows[3]["ahash"] == 0  # constant image: nothing exceeds the mean
    assert (rows[1]["width"], rows[1]["height"]) == (64, 64)


def test_ahash_rgb_matches_grey_expansion(spark):
    """Channel-aware sampling: an RGB image with r=g=b must hash
    identically to its greyscale original (channel sum is scale-free
    under the 64*v > total threshold), and a 16-bit deepening of the
    same image (v*257 per sample) must too."""
    from test_dataengineer2026_spark.multimodal.binary_ops import decode_png_ahash

    w, h = 12, 10
    g = _gray(w, h, seed=7)
    rgb = bytes(b for v in g for b in (v, v, v))
    g16 = bytes(b for v in g for b in (v, v))  # v*257 big-endian == (v, v)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_png(w, h, g))),
            (2, bytearray(encode_png(w, h, rgb, color_type=2))),
            (3, bytearray(encode_png(w, h, g16, bit_depth=16))),
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["ahash"] for r in decode_png_ahash(df).collect()}
    assert got[1] == got[2] == got[3]


def test_wav_layout_is_canonical_riff():
    import struct

    from test_dataengineer2026_spark.multimodal.wav import encode_wav

    p = encode_wav([0, 1, -1], 44100)
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    assert p[12:16] == b"fmt " and struct.unpack_from("<I", p, 16)[0] == 16
    fmt_code, nch, rate = struct.unpack_from("<HHI", p, 20)
    assert (fmt_code, nch, rate) == (1, 1, 44100)
