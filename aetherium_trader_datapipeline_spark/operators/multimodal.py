"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed in Arrow-batched Pandas UDFs.

The Spark-side design is real and tested — schema, partitioning, UDF
signatures, batch shapes. The codec step itself is STUBBED: the container
has no image/audio libraries, so ``decode_image`` raises
NotImplementedError unless PIL is importable, and the deterministic fake
(``fake_decode_meta``) stands in for tests. At scale the pattern is the
point: mapInPandas streams Arrow batches of binary blobs through the
Python worker with bounded memory (maxRecordsPerBatch), metadata stays
columnar, and downstream filters on metadata prune before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width INT, height INT, format STRING, n_bytes BIGINT"

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def fake_decode_meta(blob: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a real decoder: derives metadata purely
    from blob content so tests are reproducible."""
    if not blob:
        return 0, 0, "empty"
    w = 1 + blob[0] % 64
    h = 1 + blob[-1] % 64
    fmt = ["png", "jpeg", "webp"][len(blob) % 3]
    return w, h, fmt


def decode_image(blob: bytes):
    """Real decode path — requires an image library."""
    if not _HAS_PIL:
        raise NotImplementedError("image decoding requires PIL; not in this container")
    import io

    from PIL import Image

    return Image.open(io.BytesIO(blob))


def extract_image_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """blob → (original columns..., width, height, format, n_bytes) via
    mapInPandas (Arrow batches; nothing row-at-a-time in Python)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + IMAGE_META_SCHEMA

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[blob_col].apply(lambda b: fake_decode_meta(bytes(b or b"")))
            pdf = pdf.copy()
            pdf["width"] = metas.apply(lambda m: m[0]).astype("int32")
            pdf["height"] = metas.apply(lambda m: m[1]).astype("int32")
            pdf["format"] = metas.apply(lambda m: m[2])
            pdf["n_bytes"] = pdf[blob_col].apply(lambda b: len(b or b"")).astype("int64")
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    duration_col: str = "duration_s",
    fps: float = 1.0,
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (video, frame_idx) at
    ``fps`` — pure `sequence`/`explode`, no Python; the decode of each
    planned frame is the stubbed step."""
    n_frames = F.greatest((F.col(duration_col) * fps).cast("int"), F.lit(1))
    return df.withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1))
    ).withColumn("frame_ts_s", F.col("frame_idx") / fps)


def embed_blobs(df: DataFrame, blob_col: str = "blob", dim: int = 8) -> DataFrame:
    """Deterministic fake feature-extractor: blob → float vector via a
    content hash, shaped exactly like a real encoder output
    (array<float>, fixed dim) so downstream similarity ops are testable."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", embedding ARRAY<FLOAT>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        def emb(b: bytes) -> list[float]:
            out = []
            for i in range(dim):
                h = hashlib.sha256(bytes([i]) + (b or b"")).digest()[:8]
                (u,) = struct.unpack(">q", h)
                out.append(float(u) / 2**63)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf["embedding"] = pdf[blob_col].apply(lambda b: emb(bytes(b or b"")))
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)
