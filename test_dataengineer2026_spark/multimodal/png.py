"""Minimal pure-stdlib PNG codec (encoder + decoder).

This container has no imaging libraries, but PNG itself needs only
``zlib`` + ``struct``: a PNG is an 8-byte signature followed by chunks
(length, type, payload, crc32); pixels live in IDAT chunks as a single
zlib stream of filtered scanlines (one leading filter byte per row,
filter types 0-4: None/Sub/Up/Average/Paeth, RFC 2083 §6). Decoding =
parse IHDR, inflate the concatenated IDATs, reverse the per-row filter.

The decoder handles every spec-legal depth/type combination (RFC 2083
§4.1.1): greyscale (colour type 0) at 1/2/4/8/16 bits, RGB (colour
type 2) at 8/16, palette (colour type 3, PLTE lookup expanded to RGB —
palette PNGs are common in real corpora) at 1/2/4/8, grey+alpha
(colour type 4) at 8/16, RGBA (colour type 6) at 8/16, and Adam7
interlacing (seven sub-image passes, each filtered independently,
RFC 2083 §2.6) for all of those. 16-bit pixels come back as raw
big-endian 2-byte samples with bit_depth=16, and sub-byte greyscale
samples come back one-per-byte UNSCALED (0..2^depth-1) with the true
bit_depth reported — no precision is invented or dropped in either
direction. That is a *real* decode: the bytes that come out are the
image's actual pixels, checksummable against an oracle.

The encoder exists so queries/tests can synthesize deterministic PNGs
without any external fixture, and deliberately rotates through all five
filter types row-by-row so round-trips exercise every reversal path.

Scale posture: both directions are plain ``bytes -> bytes`` functions
with no Spark dependency; the query layer calls them inside
``mapInPandas`` so 100 TB of blobs decode Arrow-batch-at-a-time on
executors, never on the driver.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by PNG colour type (palette scanlines carry one
#: index sample per pixel; alpha types carry their alpha sample)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: spec-legal bit depths per colour type (RFC 2083 §4.1.1); we support
#: all of them (16-bit palette and sub-byte alpha do not exist in the
#: spec — alpha-bearing types are 8/16-bit only)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _pack_bits(samples: bytes, width: int, depth: int) -> bytes:
    """Pack one-sample-per-byte values (< 2^depth) into a scanline of
    MSB-first ``depth``-bit fields, zero-padded to a byte boundary."""
    out = bytearray((width * depth + 7) // 8)
    for i in range(width):
        v = samples[i]
        bit = i * depth
        out[bit // 8] |= v << (8 - depth - bit % 8)
    return bytes(out)


def _unpack_bits(packed: bytes, width: int, depth: int) -> bytes:
    """Inverse of :func:`_pack_bits`: scanline bytes -> one sample per
    byte, trailing pad bits ignored."""
    mask = (1 << depth) - 1
    out = bytearray(width)
    for i in range(width):
        bit = i * depth
        out[i] = (packed[bit // 8] >> (8 - depth - bit % 8)) & mask
    return bytes(out)


#: Adam7 pass geometry: (x_start, y_start, x_step, y_step), RFC 2083 §2.6
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _pass_dims(width: int, height: int, p: tuple[int, int, int, int]) -> tuple[int, int]:
    """(sub_width, sub_height) of one Adam7 pass — 0 if the pass is empty."""
    x0, y0, dx, dy = p
    return max(0, (width - x0 + dx - 1) // dx), max(0, (height - y0 + dy - 1) // dy)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def _filter_row(ftype: int, row: bytes, prior: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (RFC 2083 §6.3-6.6)."""
    n = len(row)
    out = bytearray(n)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0          # left
        b = prior[i] if prior else 0                  # up
        c = prior[i - bpp] if (prior and i >= bpp) else 0  # up-left
        x = row[i]
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
    return bytes(out)


def _filter_rows(rows: list[bytes], bpp: int) -> bytearray:
    """Filter a (sub-)image given as packed scanlines: one filter byte
    + filtered row each, filter type rotating ``y % 5``."""
    raw = bytearray()
    prior = b""
    for y, row in enumerate(rows):
        ftype = y % 5
        raw.append(ftype)
        raw += _filter_row(ftype, row, prior, bpp)
        prior = row
    return raw


def _pack_rows(
    samples: bytes, width: int, height: int, depth: int, channels: int
) -> tuple[list[bytes], int]:
    """(packed scanlines, filter bpp) for a (sub-)image held as the
    one-sample-per-byte (sub-byte depths) / raw-bytes (8/16-bit)
    buffer convention."""
    if depth >= 8:
        bpx = channels * (depth // 8)
        stride = width * bpx
        return [samples[y * stride : (y + 1) * stride] for y in range(height)], bpx
    return [
        _pack_bits(samples[y * width : (y + 1) * width], width, depth)
        for y in range(height)
    ], 1


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    palette: list[tuple[int, int, int]] | None = None,
    bit_depth: int = 8,
    interlace: bool = False,
) -> bytes:
    """Encode raw pixels into a spec-conformant PNG.

    ``pixels`` is row-major: ``width*height*channels*(bit_depth//8)``
    bytes for 8/16-bit (16-bit samples big-endian), or one sample per
    byte (< 2^depth) for sub-byte depths — the encoder packs them
    MSB-first per spec. For colour type 3 samples are palette *indices*
    and ``palette`` (a list of (r, g, b) triples) is required. Rows are
    filtered with type ``row_index % 5`` so every decoder filter path
    is exercised by any image of >=5 rows. With ``interlace`` the
    pixels split into the seven Adam7 passes, each filtered as its own
    sub-image.
    """
    if bit_depth not in _LEGAL_DEPTHS.get(color_type, ()):
        raise ValueError(f"unsupported bit_depth {bit_depth} for type {color_type}")
    n_ch = _CHANNELS[color_type]
    out_bpp = n_ch * (bit_depth // 8) if bit_depth >= 8 else 1
    if len(pixels) != width * height * out_bpp:
        raise ValueError("pixel buffer does not match dimensions")
    if bit_depth < 8 and max(pixels, default=0) >= (1 << bit_depth):
        raise ValueError(f"sample exceeds {bit_depth}-bit range")
    if color_type == 3:
        if not palette or len(palette) > 256:
            raise ValueError("palette PNG needs 1-256 PLTE entries")
        if max(pixels) >= len(palette):
            raise ValueError("pixel index outside palette")
    elif palette is not None:
        raise ValueError("palette only valid for colour type 3")
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, int(interlace)
    )
    if interlace:
        raw = bytearray()
        for p in _ADAM7:
            x0, y0, dx, dy = p
            wp, hp = _pass_dims(width, height, p)
            if wp == 0 or hp == 0:
                continue  # empty pass contributes no scanlines at all
            sub = bytearray()
            for j in range(hp):
                y = y0 + j * dy
                for i in range(wp):
                    x = x0 + i * dx
                    off = (y * width + x) * out_bpp
                    sub += pixels[off : off + out_bpp]
            rows, bpp = _pack_rows(bytes(sub), wp, hp, bit_depth, n_ch)
            raw += _filter_rows(rows, bpp)
    else:
        rows, bpp = _pack_rows(pixels, width, height, bit_depth, n_ch)
        raw = _filter_rows(rows, bpp)
    chunks = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        chunks += _chunk(b"PLTE", b"".join(bytes(rgb) for rgb in palette))
    return (
        chunks
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse per-row filters over one (sub-)image's scanlines.

    ``raw`` is exactly ``height * (stride + 1)`` bytes: a filter byte
    then ``stride`` filtered bytes per row.
    """
    out = bytearray()
    prior = b"\x00" * stride
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:
            for i in range(stride):
                row[i] = (row[i] + (row[i - bpp] if i >= bpp else 0)) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                row[i] = (row[i] + prior[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (a + prior[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                c = prior[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(a, prior[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad scanline filter {ftype}")
        out += row
        prior = bytes(row)
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a PNG payload -> (width, height, bit_depth, color_type,
    raw row-major pixel bytes).

    Real decode: IHDR parse, zlib inflate of all IDAT chunks, per-row
    filter reversal (per Adam7 pass when interlaced, with pixels
    scattered back to their image positions); sub-byte depths unpack
    MSB-first to one UNSCALED sample per byte; palette (colour type 3)
    indices are expanded to RGB via the PLTE lookup, so the returned
    bytes are always actual pixel values (16-bit samples stay
    big-endian 2-byte pairs). Every spec-legal depth/type combination
    decodes; anything else raises ValueError — unsupported inputs fail
    loudly, never a silent wrong answer.
    """
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = None
    interlace = 0
    idat = bytearray()
    plte: bytes | None = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
        elif tag == b"PLTE":
            if length % 3 or not 3 <= length <= 768:
                raise ValueError("malformed PLTE chunk")
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + payload + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth not in _LEGAL_DEPTHS.get(color_type, ()):
        raise ValueError(
            f"unsupported PNG: bit_depth={bit_depth} color_type={color_type}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    n_ch = _CHANNELS[color_type]
    bpp = max(1, n_ch * (bit_depth // 8))  # filter left-neighbor distance
    out_bpp = n_ch * (bit_depth // 8) if bit_depth >= 8 else 1

    def scan_stride(w: int) -> int:
        return (w * n_ch * bit_depth + 7) // 8

    def to_samples(img: bytearray, h: int, w: int) -> bytearray:
        """Packed unfiltered scanlines -> one sample per byte for
        sub-byte depths; raw bytes otherwise."""
        if bit_depth >= 8:
            return img
        s = scan_stride(w)
        out_ = bytearray()
        for y in range(h):
            out_ += _unpack_bits(img[y * s : (y + 1) * s], w, bit_depth)
        return out_

    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        # Validate declared dimensions against the decompressed size
        # BEFORE allocating width*height*out_bpp: a ~100-byte payload
        # declaring huge dimensions must raise ValueError (quarantined
        # upstream), not OverflowError/MemoryError from the allocation.
        # This is exact (the loop below consumes precisely these pass
        # sizes), so truncated AND oversized payloads both land here.
        expected = sum(
            (scan_stride(wp) + 1) * hp
            for wp, hp in (_pass_dims(width, height, p) for p in _ADAM7)
            if wp and hp
        )
        if expected != len(raw):
            raise ValueError("IDAT payload does not match Adam7 pass dimensions")
        out = bytearray(width * height * out_bpp)
        pos_r = 0
        for p in _ADAM7:
            x0, y0, dx, dy = p
            wp, hp = _pass_dims(width, height, p)
            if wp == 0 or hp == 0:
                continue
            size = (scan_stride(wp) + 1) * hp
            sub = to_samples(
                _unfilter(raw[pos_r : pos_r + size], hp, scan_stride(wp), bpp),
                hp,
                wp,
            )
            pos_r += size
            for j in range(hp):
                y = y0 + j * dy
                for i in range(wp):
                    x = x0 + i * dx
                    out[(y * width + x) * out_bpp : (y * width + x + 1) * out_bpp] = (
                        sub[(j * wp + i) * out_bpp : (j * wp + i + 1) * out_bpp]
                    )
    else:
        if len(raw) != (scan_stride(width) + 1) * height:
            raise ValueError("IDAT payload does not match dimensions")
        out = to_samples(
            _unfilter(raw, height, scan_stride(width), bpp), height, width
        )
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        n_entries = len(plte) // 3
        if max(out, default=0) >= n_entries:
            raise ValueError("palette index outside PLTE")
        out = bytearray(
            b for idx in out for b in plte[idx * 3 : idx * 3 + 3]
        )
    return width, height, bit_depth, color_type, bytes(out)
