"""Binary-column operators (SURVEY north-star "multimodal columns").

Model: media are opaque BINARY columns + typed metadata, exactly how a
100 TB training-data lake stores them (parquet binary pages; payloads
never parsed by the engine until a decode operator runs). All decode /
feature-extract operators run as ``mapInPandas`` — Arrow batches cross
the JVM->Python boundary once per batch, not per row — and each batch
yields a plain pandas DataFrame, so the Spark-side plumbing (schema,
partitioning, batch shape) is real regardless of which decoder backs it.

The actual image decode is STUBBED: this container has no image/audio
libraries, so ``decode_image`` raises NotImplementedError unless PIL is
importable, and the feature extractor uses a clearly-marked
deterministic fake (dimensions derived from byte length) that keeps the
pipeline testable end-to-end.
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


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    text stand in for an encoded media blob)."""
    return df.withColumn("content", F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes):
    """Decode an image payload. STUB: no imaging library in this
    environment; the real path is gated behind an import-try."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "image decode requires PIL/pillow; not available in this build"
        ) from e


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
