"""Binary-column operators (SURVEY north-star "multimodal columns").

Model: media are opaque BINARY columns + typed metadata, exactly how a
100 TB training-data lake stores them (parquet binary pages; payloads
never parsed by the engine until a decode operator runs). All decode /
feature-extract operators run as ``mapInPandas`` — Arrow batches cross
the JVM->Python boundary once per batch, not per row — and each batch
yields a plain pandas DataFrame, so the Spark-side plumbing (schema,
partitioning, batch shape) is real regardless of which decoder backs it.

Image decode is REAL for PNG: ``multimodal/png.py`` is a pure-stdlib
decoder (IHDR parse + zlib IDAT inflate + filter reversal), used by
``decode_image`` and the MM4 query. Other formats (JPEG etc.) route
through PIL when importable and otherwise raise ValueError — an explicit
unsupported-format error, not a stub. ``extract_features`` (V5) keeps
its clearly-marked deterministic fake dims because its payloads are
UTF-8 text, not images; MM4 is the real decode surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, content_md5 string, first_byte int, "
    "width int, height int"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, frame_len long"

PNG_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, bit_depth int, color_type int, "
    "n_pixels long, pixel_sum long, pixel_min int, pixel_max int"
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    text stand in for an encoded media blob)."""
    return df.withColumn("content", F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode an image payload -> (width, height, bit_depth, channels,
    raw pixel bytes).

    PNG decodes natively (pure-stdlib ``multimodal.png``); other formats
    go through PIL when present, else raise ValueError — unsupported
    input is an explicit error, never a silent fake.

    The returned (depth, channels) always describe the RETURNED buffer:
    palette PNGs come back PLTE-expanded to 8-bit RGB, so they report
    depth 8 / 3 channels regardless of the file's declared index depth
    — stride and sample range derived from the tuple are always right.
    """
    from test_dataengineer2026_spark.multimodal import png  # noqa: PLC0415

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, depth, color_type, pixels = png.decode_png(payload)
        if color_type == 3:  # PLTE-expanded: buffer is 8-bit RGB
            return w, h, 8, 3, pixels
        return w, h, depth, {0: 1, 2: 3, 4: 2, 6: 4}[color_type], pixels
    try:
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415
    except ImportError:
        raise ValueError(
            "unsupported image format (only PNG decodes without PIL; "
            f"leading bytes {payload[:4]!r})"
        ) from None
    img = Image.open(io.BytesIO(payload))  # pragma: no cover - env has no PIL
    # bits per band from the mode, not a hardcoded 8 (I;16/I/F modes exist)
    depth = {"1": 1, "I;16": 16, "I": 32, "F": 32}.get(img.mode, 8)
    return img.width, img.height, depth, len(img.getbands()), img.tobytes()


def _fake_dims(n: int) -> tuple[int, int]:
    """Deterministic fake of a decoder's (width, height) output."""
    return n % 640, (n * 7) % 480


def extract_features(df_with_binary: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Python worker call per Arrow batch; output schema is declared,
    deterministic, and verified against a SQL oracle computing the same
    features from the source text.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            byte_len = content.map(len)
            dims = byte_len.map(_fake_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": byte_len,
                    "content_md5": content.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "first_byte": content.map(lambda b: b[0] if b else None),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                }
            )

    return df_with_binary.select("doc_id", "content").mapInPandas(
        op, schema=FEATURE_SCHEMA
    )


def _synth_pixels(doc_id: int) -> tuple[int, int, bytes]:
    """Deterministic test image for ``doc_id``: dims and greyscale pixel
    values derive from the id by closed-form arithmetic, so a SQL oracle
    can recompute every expected pixel via generate_series without ever
    touching PNG bytes."""
    width = 3 + doc_id % 6
    height = 2 + doc_id % 5
    pixels = bytes(
        (doc_id + 31 * y + 7 * x) % 256
        for y in range(height)
        for x in range(width)
    )
    return width, height, pixels


def synthesize_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real (spec-conformant, zlib-compressed, filter-rotated)
    PNG payload per row, derived deterministically from the id."""
    from test_dataengineer2026_spark.multimodal.png import encode_png  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                w, h, px = _synth_pixels(int(doc_id))
                payloads.append(encode_png(w, h, px))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(op, schema="doc_id long, payload binary")


def decode_png_features(df_with_payload: DataFrame) -> DataFrame:
    """REAL image decode over binary PNG payloads via mapInPandas:
    IHDR parse + zlib IDAT inflate + scanline filter reversal, then
    SQL-checkable pixel statistics. Per-pixel value = integer channel
    sum (16-bit samples at full big-endian precision) — identical to
    the raw byte for 8-bit greyscale, well-defined for RGB/palette/
    16-bit instead of mislabeled byte stats; n_pixels is the true
    pixel count, not the buffer length. Arrow batches cross to Python
    once per batch; at 100 TB this runs decoder-parallel on executors
    with nothing on the driver."""
    from test_dataengineer2026_spark.multimodal.png import decode_png  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, depth, ctype, pixels = decode_png(bytes(payload))
                # decoded-buffer channels: palette is PLTE-expanded RGB;
                # alpha types (4/6) include their alpha sample in the
                # per-pixel channel sum
                n_ch = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}[ctype]
                bpp = n_ch * max(1, depth // 8)
                if depth == 16:
                    vals = [
                        sum(
                            (pixels[o + c] << 8) | pixels[o + c + 1]
                            for c in range(0, bpp, 2)
                        )
                        for o in range(0, len(pixels), bpp)
                    ]
                elif bpp == 1:
                    vals = pixels  # grey-8: bytes ARE the pixel values
                else:
                    vals = [
                        sum(pixels[o : o + bpp])
                        for o in range(0, len(pixels), bpp)
                    ]
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        depth,
                        ctype,
                        w * h,
                        sum(vals),
                        min(vals),
                        max(vals),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "bit_depth",
                    "color_type",
                    "n_pixels",
                    "pixel_sum",
                    "pixel_min",
                    "pixel_max",
                ],
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        op, schema=PNG_FEATURE_SCHEMA
    )


AHASH_SCHEMA = "doc_id long, width int, height int, ahash long"


def decode_png_ahash(df_with_payload: DataFrame) -> DataFrame:
    """MM6: average-hash (aHash) perceptual fingerprint over REALLY
    decoded PNG pixels. Classic aHash shape: downsample to a fixed 8x8
    grid first (nearest-neighbour sample at (gx*w//8, gy*h//8) — exact
    integer arithmetic a SQL oracle reproduces, unlike area-averaging),
    then set bit gy*8+gx iff the sampled pixel exceeds the grid mean.
    The hash is therefore always exactly 64 bits regardless of image
    size — no int64 overflow for large images. Multi-channel images
    (RGB, PLTE-expanded palette) use the per-pixel channel SUM as the
    luminance proxy — integer-exact, and scale-free under the
    threshold, so a grey image and its r=g=b RGB expansion hash
    identically; 16-bit samples are taken at full precision. The
    threshold uses the integer form 64*v > sum(grid) (equivalent to
    v > mean) so no float crosses an engine boundary; the unsigned
    64-bit value is mapped to signed two's-complement to fit the
    declared ``long`` column.
    Images with similar luminance structure collide, so downstream
    dedup is an equi-join on the hash (or banded Hamming buckets),
    never pairwise pixel comparison."""
    from test_dataengineer2026_spark.multimodal.png import decode_png  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, depth, ctype, pixels = decode_png(bytes(payload))
                # bytes per pixel in the decoded buffer: palette (type 3)
                # comes back PLTE-expanded to RGB, so it is 3-channel
                # here; alpha types (4/6) contribute their alpha sample
                # to the luminance-proxy sum; sub-byte grey unpacks to
                # one byte per sample
                n_ch = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}[ctype]
                bpp = n_ch * max(1, depth // 8)
                grid = []
                for gy in range(8):
                    for gx in range(8):
                        off = ((gy * h // 8) * w + (gx * w // 8)) * bpp
                        px = pixels[off : off + bpp]
                        if depth == 16:  # big-endian sample pairs
                            v = sum(
                                (px[c] << 8) | px[c + 1]
                                for c in range(0, bpp, 2)
                            )
                        else:  # channel SUM, not mean: integer-exact and
                            v = sum(px)  # scale-free under the 64*v > total test
                        grid.append(v)
                total = sum(grid)
                ahash = 0
                for idx, v in enumerate(grid):
                    if 64 * v > total:
                        ahash |= 1 << idx
                if ahash >= 1 << 63:  # two's-complement into int64
                    ahash -= 1 << 64
                rows.append((doc_id, w, h, ahash))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "ahash"])

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        op, schema=AHASH_SCHEMA
    )


WAV_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, bit_depth int, "
    "n_samples long, sample_sum long, sample_min int, sample_max int"
)


def _synth_samples(doc_id: int) -> tuple[int, list[int]]:
    """Deterministic PCM16 test signal: rate and samples derive from the
    id in closed form so a SQL oracle recomputes them via
    generate_series without touching WAV bytes."""
    rate = 8000 + (doc_id % 4) * 4000
    n = 20 + doc_id % 30
    samples = [((doc_id * 31 + i * 17) % 65536) - 32768 for i in range(n)]
    return rate, samples


def synthesize_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real RIFF/PCM16 WAV payload per row, derived
    deterministically from the id."""
    from test_dataengineer2026_spark.multimodal.wav import encode_wav  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                rate, samples = _synth_samples(int(doc_id))
                payloads.append(encode_wav(samples, rate))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(op, schema="doc_id long, payload binary")


def decode_wav_features(df_with_payload: DataFrame) -> DataFrame:
    """REAL audio decode over binary WAV payloads via mapInPandas: RIFF
    chunk walk, fmt parse, PCM16 sample unpack, then SQL-checkable
    sample statistics. Same executor-parallel batch shape as the PNG
    path."""
    from test_dataengineer2026_spark.multimodal.wav import decode_wav  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, nch, depth, samples = decode_wav(bytes(payload))
                rows.append(
                    (
                        doc_id,
                        rate,
                        nch,
                        depth,
                        len(samples),
                        sum(samples),
                        min(samples),
                        max(samples),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_channels",
                    "bit_depth",
                    "n_samples",
                    "sample_sum",
                    "sample_min",
                    "sample_max",
                ],
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        op, schema=WAV_FEATURE_SCHEMA
    )


def sample_frames(
    df_with_binary: DataFrame, frame_size: int = 100, max_frames: int = 3
) -> DataFrame:
    """Frame sampling over "video" payloads: fixed-size byte windows at
    deterministic offsets (the mapInPandas analogue of keyframe
    extraction; a real codec would slot into the same batch loop)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n_frames = min(max_frames, max(len(content) // frame_size, 0))
                for i in range(n_frames):
                    frame = content[i * frame_size : (i + 1) * frame_size]
                    rows.append(
                        (doc_id, i, hashlib.md5(frame).hexdigest(), len(frame))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5", "frame_len"]
            )

    return df_with_binary.select("doc_id", "content").mapInPandas(
        op, schema=FRAME_SCHEMA
    )


WAV_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, n_samples int, energy long, "
    "n_zero_crossings int"
)

#: MM7 frame width in samples.
WAV_FRAME = 16


def decode_wav_frame_features(df_with_payload: DataFrame) -> DataFrame:
    """MM7: windowed audio features over REALLY decoded PCM16 samples —
    per fixed-width frame, the signal energy (sum of squared samples,
    exact int64: |s| < 2^15 so a frame sum stays < 2^36) and the
    zero-crossing count (adjacent within-frame pairs with strictly
    negative product — the classic cheap voicing/noisiness signal).
    Vectorized numpy inside the same Arrow batch pass as the decode;
    the last frame is partial and reports its true sample count."""
    import numpy as np

    from test_dataengineer2026_spark.multimodal.wav import decode_wav  # noqa: PLC0415

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, _nch, _depth, samples = decode_wav(bytes(payload))
                a = np.asarray(samples, dtype=np.int64)
                for f0 in range(0, len(a), WAV_FRAME):
                    seg = a[f0 : f0 + WAV_FRAME]
                    rows.append(
                        (
                            doc_id,
                            f0 // WAV_FRAME,
                            len(seg),
                            int((seg * seg).sum()),
                            int(((seg[:-1] * seg[1:]) < 0).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "n_samples",
                    "energy",
                    "n_zero_crossings",
                ],
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        op, schema=WAV_FRAME_SCHEMA
    )


def decode_png_status(df_with_payload: DataFrame) -> DataFrame:
    """MM9: total (never-throwing) decode — classify every payload
    instead of failing the task. Real pipelines meet corrupt bytes at
    a steady rate; one bad file must quarantine ONE ROW, not kill a
    100 TB job. Classification: 'bad_signature' (not PNG magic),
    'corrupt' (signature ok but the decoder raised — truncation, CRC,
    inflate, malformed chunks), 'ok' (+ true dimensions). The catch
    enumerates the decoder's actual data-failure surface (ValueError,
    struct.error, zlib.error, IndexError, KeyError, OverflowError —
    the last for headers whose declared dimensions exceed index
    limits) rather than Exception-wide: a MemoryError from a hostile
    deflate bomb or a KeyboardInterrupt is an executor resource
    problem, not a data fact, and must propagate instead of being
    mislabelled 'corrupt'. The decoder itself validates declared
    dimensions against the decompressed payload BEFORE allocating
    output buffers (png.py), so a tiny malformed header cannot
    trigger a huge allocation in the first place."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    from test_dataengineer2026_spark.multimodal.png import decode_png  # noqa: PLC0415

    _MAGIC = b"\x89PNG\r\n\x1a\n"
    _DATA_ERRORS = (
        ValueError,
        struct.error,
        zlib.error,
        IndexError,
        KeyError,
        OverflowError,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:8] != _MAGIC:
                    rows.append((doc_id, "bad_signature", None, None))
                    continue
                try:
                    w, h, _depth, _ctype, _px = decode_png(raw)
                    rows.append((doc_id, "ok", w, h))
                except _DATA_ERRORS:
                    rows.append((doc_id, "corrupt", None, None))
            yield pd.DataFrame(
                rows, columns=["doc_id", "status", "width", "height"]
            )

    return df_with_payload.mapInPandas(
        op, schema="doc_id long, status string, width int, height int"
    )
