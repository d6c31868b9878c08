"""Multimodal (image/audio/video) column plumbing.

SURVEY.md §2.M: media are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extraction runs as Arrow-batched pandas functions
over ``mapInPandas`` so bytes never round-trip through Python row-by-row.

The decode step itself is STUBBED (``DECODERS_AVAILABLE = False``) because
image/audio codecs aren't in this container — ``decode_stub`` produces a
deterministic fake (shape/duration derived from a stable hash of the bytes)
so the Spark-side plumbing (schema, batching, partition behavior) is real
and testable; swapping in PIL/ffmpeg is a one-function change.

Scale notes: binary payloads make wide rows — the functions here always
project metadata *out* of the binary early (so downstream shuffles move
only metadata), and `mapInPandas` keeps memory bounded by Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODERS_AVAILABLE = False  # PIL / ffmpeg / torchaudio not in this container

#: Canonical media-row schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),  # images/video (fake-decoded)
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),  # audio/video (fake-decoded)
    ]
)


def _fake_decode(payload: bytes, kind: str) -> tuple[int | None, int | None, int | None]:
    """Deterministic stand-in for a real decoder: derive plausible
    dimensions from a stable digest of the bytes. Replace with
    PIL.Image.open / av / soundfile when codecs are available."""
    if payload is None:
        return None, None, None
    h = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    if kind == "image":
        return 64 + h % 1024, 64 + (h >> 10) % 1024, None
    if kind == "audio":
        return None, None, 1000 + h % 600_000
    if kind == "video":
        return 64 + h % 1920, 64 + (h >> 10) % 1080, 1000 + (h >> 20) % 600_000
    return None, None, None


def decode_media_meta(df: DataFrame) -> DataFrame:
    """Extract typed metadata from binary payloads via ``mapInPandas``.

    Output drops the payload column: downstream operators (joins, dedup by
    sha256, filtering by dimensions) run on narrow metadata rows.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"]
                w, h_, d = _fake_decode(payload, r["kind"])
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(payload) if payload is not None else 0,
                        "sha256": hashlib.sha256(payload).hexdigest() if payload is not None else None,
                        "width": w,
                        "height": h_,
                        "duration_ms": d,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_META_SCHEMA.fields])

    return df.mapInPandas(_decode, DECODED_META_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image-resize plumbing: real signature/schema, stubbed codec."""
    if not DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image codecs not available in this container; "
            "resize_images is plumbing-complete but decode-stubbed"
        )
    raise NotImplementedError


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: real signature/schema, stubbed codec."""
    if not DECODERS_AVAILABLE:
        raise NotImplementedError(
            "video codecs not available in this container; "
            "frame_sample is plumbing-complete but decode-stubbed"
        )
    raise NotImplementedError


def media_from_text(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Test helper: synthesize a media table by encoding a text column to
    bytes — exercises the binary-column path end-to-end without codecs."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
