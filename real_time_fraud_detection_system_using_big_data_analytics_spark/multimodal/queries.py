"""Registry entries for the multimodal surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables
from .codec import attach_binary_payload, decode_image_features, sample_frames


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'text/plain' AS mime,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary payload column (size, mime, content
    hash) — pure built-ins, fully oracle-checked. UTF-8 encode is
    byte-identical in both engines, so the md5 matches."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    mm = attach_binary_payload(d)
    return mm.select(
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "mime",
        F.md5("payload").alias("payload_md5"),
    )


@register("multimodal_decode_features")  # mapInPandas stub decoder: rows-only
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (stub decoder —
    see multimodal/codec.py). Deterministic output; rows-only check because
    sha256-derived floats aren't SQL-reproducible in DuckDB."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    feats = decode_image_features(attach_binary_payload(d))
    return feats.select(
        "doc_id", "n_bytes", "format", F.round("feat0", 6).alias("feat0")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(f.k AS INTEGER) AS frame_idx,
           COUNT(*) OVER () AS total_frames
    FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS k) f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 3 frames per payload via mapInPandas. The
    oracle checks the row-multiplication shape (doc × frame_idx and the
    global frame count); frame bytes themselves are stub slices."""
    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    frames = sample_frames(attach_binary_payload(d), n_frames=3)
    from pyspark.sql import Window

    return frames.select(
        "doc_id",
        "frame_idx",
        F.count("*").over(Window.partitionBy()).alias("total_frames"),
    )


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS orig_bytes,
           LEAST(octet_length(encode(text)), 256) AS out_bytes,
           md5(substr(text, 1, 256)) AS out_md5
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing, fully oracle-checked: the Arrow-batched byte-cap
    runs in mapInPandas (python hashlib md5 over the resized bytes); the
    oracle recomputes the same hash from the text prefix — valid because
    the synthetic corpus is pure ASCII, so byte slice == char slice. A
    real image resize swaps one function (codec.resize_payload)."""
    from .codec import resize_payload

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return resize_payload(attach_binary_payload(d), target_bytes=256)
