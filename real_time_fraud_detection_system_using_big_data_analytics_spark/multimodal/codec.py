"""Multimodal column plumbing (north-star surface): image/audio/video as
opaque ``binary`` columns with typed metadata, processed batch-wise via
``mapInPandas`` (Arrow-batched — never row-at-a-time Python).

The container has no image/audio libraries, so the actual decode is STUBBED
(documented below); everything around it — schema, batch iteration,
partition behavior, metadata extraction — is real and tested. Swapping the
stub for Pillow/torchaudio is a one-function change.

Scale posture: binary payloads dominate row size, so these operators
(a) select only the columns they need (no payload dragging through later
stages), (b) process per Arrow batch (bounded memory = batch_size ×
payload), and (c) emit fixed-width features so downstream shuffles never
move the raw bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REAL_DECODERS_AVAILABLE = False  # no PIL/cv2/torchaudio in this image

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("feat0", T.DoubleType()),
        T.StructField("feat1", T.DoubleType()),
        T.StructField("feat2", T.DoubleType()),
        T.StructField("feat3", T.DoubleType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Turn the documents table into a multimodal-shaped table: the text
    becomes an opaque binary payload plus typed metadata — the layout an
    image/audio table would have (payload, mime, size)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[float, float, float, float]:
    """Deterministic stand-in for an image/audio feature extractor: derive
    4 floats from the sha256 of the payload. Replace with a real decoder
    when the codec libraries are present."""
    h = hashlib.sha256(payload).digest()
    return tuple(
        int.from_bytes(h[i * 4 : (i + 1) * 4], "big") / 2**32 for i in range(4)
    )


def decode_image_features(multimodal: DataFrame, real: bool = False) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    ``real=True`` is the seam for an actual decoder (Pillow decode ->
    resize -> embed); it raises in this image so nothing silently pretends
    to decode pixels.
    """
    if real and not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image/audio codec libraries are not installed in this environment; "
            "run with real=False for the deterministic stub features"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "format": pdf["mime"],
                    "feat0": [f[0] for f in feats],
                    "feat1": [f[1] for f in feats],
                    "feat2": [f[2] for f in feats],
                    "feat3": [f[3] for f in feats],
                }
            )

    return multimodal.select("doc_id", "payload", "mime").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


def sample_frames(multimodal: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling for video-like payloads: split each payload into
    n_frames byte slices (the stub for keyframe extraction), one output row
    per frame — the explode-shaped mapInPandas pattern."""

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                step = max(len(payload) // n_frames, 1)
                for k in range(n_frames):
                    rows.append((doc_id, k, payload[k * step : (k + 1) * step]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return multimodal.select("doc_id", "payload").mapInPandas(sampler, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("out_bytes", T.LongType()),
        T.StructField("out_md5", T.StringType()),
    ]
)


def resize_payload(multimodal: DataFrame, target_bytes: int = 256, real: bool = False) -> DataFrame:
    """Resize/downsample plumbing: cap each payload at ``target_bytes``
    (the stub for an image resize / audio resample), emitting the resized
    size and content hash. ``real=True`` is the seam for an actual
    Pillow/librosa resample and raises here — the batching, schema, and
    hash verification are the real, tested part."""
    if real and not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "codec libraries absent; run with real=False for the byte-cap stub"
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p)[:target_bytes] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "out_bytes": [len(r) for r in resized],
                    "out_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(resize, schema=RESIZE_SCHEMA)
