"""Multimodal plumbing tests: binary payload column, Arrow-batched stub
decode, frame sampling, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal import (
    attach_binary_payload,
    decode_image_features,
    sample_frames,
)
from real_time_fraud_detection_system_using_big_data_analytics_spark.sources.tables import (
    load_tables,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_tables(spark, SF, names=("documents",))["documents"]


def test_binary_payload_roundtrip(spark):
    d = _docs(spark)
    mm = attach_binary_payload(d)
    row = mm.join(d, "doc_id").select("payload", "text", "n_bytes").first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]
    assert row["n_bytes"] == len(row["text"].encode())


def test_decode_features_deterministic(spark):
    d = _docs(spark)
    feats = decode_image_features(attach_binary_payload(d))
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert len(rows) == d.count()
    # spot-check against the stub definition
    sample = d.filter(F.col("doc_id") == 0).first()
    h = hashlib.sha256(sample["text"].encode()).digest()
    expect0 = int.from_bytes(h[0:4], "big") / 2**32
    assert abs(rows[0]["feat0"] - expect0) < 1e-12
    assert all(0.0 <= r["feat0"] <= 1.0 for r in rows.values())


def test_real_decode_is_gated(spark):
    d = _docs(spark)
    with pytest.raises(NotImplementedError):
        decode_image_features(attach_binary_payload(d), real=True)


def test_frame_sampling_shape(spark):
    d = _docs(spark)
    frames = sample_frames(attach_binary_payload(d), n_frames=3)
    n_docs = d.count()
    assert frames.count() == 3 * n_docs
    per_doc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [3]
    # frames concatenate back into a prefix of the payload
    doc0 = frames.filter(F.col("doc_id") == 0).orderBy("frame_idx").collect()
    text0 = _docs(spark).filter(F.col("doc_id") == 0).first()["text"].encode()
    joined = b"".join(bytes(r["frame_bytes"]) for r in doc0)
    assert text0.startswith(joined[: len(joined)])


def test_wav_payload_is_real_riff_and_decodes(spark):
    """The WAV path must produce bytes any RIFF/WAVE reader accepts, and
    the decoded stats must equal the synthesis formula computed by hand —
    the same contract the DuckDB oracle checks, pinned here byte-level."""
    import io
    import wave as wave_mod

    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.codec import (
        WAV_FRAME_RATE,
        attach_wav_payload,
        decode_wav_features,
    )

    d = _docs(spark).filter(F.col("doc_id") < 5)
    mm = attach_wav_payload(d)
    rows = {r["doc_id"]: r for r in mm.collect()}
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    for doc_id, r in rows.items():
        payload = bytes(r["payload"])
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        with wave_mod.open(io.BytesIO(payload), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == WAV_FRAME_RATE
            n = w.getnframes()
        assert n == 40 + (len(texts[doc_id]) % 50)

    feats = {r["doc_id"]: r for r in decode_wav_features(mm).collect()}
    for doc_id, f in feats.items():
        n = 40 + (len(texts[doc_id]) % 50)
        expect = [((doc_id * 31 + i * 7) % 2001) - 1000 for i in range(n)]
        assert f["n_frames"] == n
        assert f["duration_us"] == n * 1_000_000 // WAV_FRAME_RATE
        assert f["sum_amp"] == sum(expect)
        assert f["max_amp"] == max(expect)


def test_ppm_payload_is_real_p6_and_decodes(spark):
    """The PPM path must produce bytes any netpbm reader accepts, and the
    decoded stats must equal the synthesis formula computed by hand."""
    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.codec import (
        attach_ppm_payload,
        decode_ppm_features,
    )

    d = _docs(spark).filter(F.col("doc_id") < 5)
    mm = attach_ppm_payload(d)
    rows = {r["doc_id"]: r for r in mm.collect()}
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    for doc_id, r in rows.items():
        payload = bytes(r["payload"])
        assert payload.startswith(b"P6\n")
        magic, dims, maxval, pix = payload.split(b"\n", 3)
        w, h = (int(x) for x in dims.split())
        assert w == 4 + doc_id % 5
        assert h == 3 + len(texts[doc_id]) % 6
        assert int(maxval) == 255
        assert len(pix) == w * h * 3

    feats = {r["doc_id"]: r for r in decode_ppm_features(mm).collect()}
    for doc_id, f in feats.items():
        w, h = 4 + doc_id % 5, 3 + len(texts[doc_id]) % 6
        n = w * h * 3
        expect = [(doc_id * 7 + k * 13) % 256 for k in range(n)]
        assert f["width"] == w and f["height"] == h
        assert f["n_subpixels"] == n
        assert f["sum_pix"] == sum(expect)
        assert f["max_pix"] == max(expect)


def test_png_codec_roundtrip_all_filters():
    """Pure-codec check: encode->decode is identity for dims that exercise
    every scanline filter (h >= 5 covers None/Sub/Up/Average/Paeth), and a
    corrupted chunk CRC is rejected."""
    import itertools

    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.codec import (
        _png_pixels,
        png_decode_rgb8,
        png_encode_rgb8,
    )

    for w, h in itertools.product([1, 3, 8], [1, 2, 5, 8]):
        rgb = _png_pixels(12345, w * h * 3)
        got = png_decode_rgb8(png_encode_rgb8(w, h, rgb))
        assert got[:4] == (w, h, 8, 2)
        assert got[4] == rgb

    corrupted = bytearray(png_encode_rgb8(4, 5, _png_pixels(1, 60)))
    corrupted[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode_rgb8(bytes(corrupted))


def test_png_payload_is_real_png_and_decodes(spark):
    """The PNG path must produce spec-complete PNG bytes (signature, IHDR,
    zlib IDAT) and the decoded stats must equal the synthesis formula."""
    import struct
    import zlib

    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.codec import (
        attach_png_payload,
        decode_png_features,
    )

    d = _docs(spark).filter(F.col("doc_id") < 5)
    mm = attach_png_payload(d)
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    for r in mm.collect():
        payload = bytes(r["payload"])
        assert payload.startswith(b"\x89PNG\r\n\x1a\n")
        w, h, depth, ctype = struct.unpack(">IIBB", payload[16:26])
        assert w == 3 + r["doc_id"] % 6
        assert h == 2 + len(texts[r["doc_id"]]) % 7
        assert (depth, ctype) == (8, 2)
        # IDAT inflates to h scanlines of 1 filter byte + w*3 pixels
        idat_len = struct.unpack(">I", payload[33:37])[0]
        assert payload[37:41] == b"IDAT"
        plane = zlib.decompress(payload[41 : 41 + idat_len])
        assert len(plane) == h * (1 + w * 3)

    feats = {r["doc_id"]: r for r in decode_png_features(mm).collect()}
    for doc_id, f in feats.items():
        w, h = 3 + doc_id % 6, 2 + len(texts[doc_id]) % 7
        n = w * h * 3
        expect = [(doc_id * 11 + k * 17) % 256 for k in range(n)]
        assert f["width"] == w and f["height"] == h
        assert (f["bit_depth"], f["color_type"]) == (8, 2)
        assert f["n_subpixels"] == n
        assert f["sum_pix"] == sum(expect)
        assert f["max_pix"] == max(expect)


def test_jpeg_codec_roundtrip_bounds():
    """Baseline-JPEG codec (multimodal/jpeg.py): encode->decode must
    reproduce the smooth synthetic plane within the audit bounds the
    registry oracle pins (max |err| <= 10, MSE <= 8), across dims that
    exercise 8x8 block padding on both axes."""
    import numpy as np

    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.codec import (
        _jpeg_dims,
        _jpeg_pixels,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.jpeg import (
        jpeg_decode_gray8,
        jpeg_encode_gray8,
    )

    for doc_id, n_chars in [(0, 0), (1, 15), (7, 13), (11, 8), (95, 44), (96, 3)]:
        w, h = _jpeg_dims(doc_id, n_chars)
        src = np.frombuffer(_jpeg_pixels(doc_id, w, h), dtype=np.uint8)
        raw = jpeg_encode_gray8(w, h, src.tobytes())
        assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
        w2, h2, gray = jpeg_decode_gray8(raw)
        assert (w2, h2) == (w, h)
        dec = np.frombuffer(gray, dtype=np.uint8).astype(np.int64)
        err = np.abs(dec - src.astype(np.int64))
        assert err.max() <= 10, (doc_id, err.max())
        assert (err * err).mean() <= 8, (doc_id, (err * err).mean())


def test_jpeg_decoder_rejects_corruption():
    """The decoder must raise on structural damage, never return pixels it
    can't prove it parsed: bad SOI, truncated scan, invalid Huffman
    prefix, and a flipped dims byte that breaks scanline accounting."""
    import pytest as _pytest

    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.jpeg import (
        jpeg_decode_gray8,
        jpeg_encode_gray8,
    )

    raw = jpeg_encode_gray8(9, 8, bytes(range(72)))
    with _pytest.raises(ValueError):
        jpeg_decode_gray8(b"\x00\x00" + raw[2:])
    with _pytest.raises((ValueError, IndexError)):
        jpeg_decode_gray8(raw[:-20])  # truncated mid-scan


def test_jpeg_all_huffman_categories_survive():
    """A noisy plane drives large AC coefficients, ZRL runs and high DC
    categories through the entropy coder; the decode must still be the
    exact inverse of the entropy layer (losses come only from
    quantization, so re-encoding the decoded plane is near-stable)."""
    import numpy as np

    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.jpeg import (
        jpeg_decode_gray8,
        jpeg_encode_gray8,
    )

    k = np.arange(24 * 17, dtype=np.int64)
    noisy = ((k * 197 + (k * k) % 251) % 256).astype(np.uint8)
    raw = jpeg_encode_gray8(24, 17, noisy.tobytes())
    w, h, gray = jpeg_decode_gray8(raw)
    assert (w, h) == (24, 17)
    first = np.frombuffer(gray, dtype=np.uint8)
    raw2 = jpeg_encode_gray8(w, h, first.tobytes())
    _, _, gray2 = jpeg_decode_gray8(raw2)
    second = np.frombuffer(gray2, dtype=np.uint8).astype(np.int64)
    drift = np.abs(second - first.astype(np.int64))
    # requantization is not a strict fixpoint (uint8 clipping + rounding
    # nudges coefficients), but an entropy-layer bug (wrong Huffman code,
    # bad stuffing, mis-scaled DCT) produces block-sized garbage, not a
    # few grey levels of drift
    assert drift.max() <= 16, drift.max()
    assert drift.mean() <= 2.0, drift.mean()


def test_jpeg_color_codec_roundtrip_bounds():
    """Color 4:2:0 codec: encode->decode within the audit bounds across
    MCU-padding dims; grayscale-only decoder must REJECT color files
    and vice versa (no silent cross-decoding)."""
    import numpy as np
    import pytest as _pytest

    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.codec import (
        _jpeg_color_dims,
        _jpeg_color_pixels,
    )
    from real_time_fraud_detection_system_using_big_data_analytics_spark.multimodal.jpeg import (
        jpeg_decode_color420,
        jpeg_decode_gray8,
        jpeg_encode_color420,
        jpeg_encode_gray8,
    )

    for doc_id, n_chars in [(0, 0), (3, 9), (13, 7), (88, 15), (89, 5)]:
        w, h = _jpeg_color_dims(doc_id, n_chars)
        src = np.frombuffer(_jpeg_color_pixels(doc_id, w, h), dtype=np.uint8)
        raw = jpeg_encode_color420(w, h, src.tobytes())
        assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
        w2, h2, rgb = jpeg_decode_color420(raw)
        assert (w2, h2) == (w, h)
        dec = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
        err = np.abs(dec - src.astype(np.int64))
        assert err.max() <= 24, (doc_id, int(err.max()))
        assert (err * err).mean() <= 20, (doc_id, float((err * err).mean()))

    color = jpeg_encode_color420(16, 16, bytes(range(256)) * 3)
    with _pytest.raises(NotImplementedError):
        jpeg_decode_gray8(color)
    gray = jpeg_encode_gray8(8, 8, bytes(range(64)))
    with _pytest.raises(NotImplementedError):
        jpeg_decode_color420(gray)
