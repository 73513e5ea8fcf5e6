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


@register(
    "multimodal_decode_features",
    oracle="""
    WITH params AS (
      SELECT doc_id, 40 + (length(text) % 50) AS n_samples FROM documents
    ), samples AS (
      SELECT p.doc_id, p.n_samples,
             ((p.doc_id * 31 + i.i * 7) % 2001) - 1000 AS amp
      FROM params p CROSS JOIN (SELECT unnest(generate_series(0, 88)) AS i) i
      WHERE i.i < p.n_samples
    )
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(2 AS BIGINT) AS sample_width_bytes,
           CAST(8000 AS BIGINT) AS frame_rate,
           CAST(MAX(n_samples) AS BIGINT) AS n_frames,
           CAST(MAX(n_samples) * 125 AS BIGINT) AS duration_us,
           CAST(SUM(amp) AS BIGINT) AS sum_amp,
           CAST(MAX(amp) AS BIGINT) AS max_amp
    FROM samples GROUP BY doc_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode, fully oracle-checked: each document gets a
    genuine RIFF/WAVE payload (stdlib ``wave`` encoder, mono 16-bit PCM,
    8 kHz) whose PCM samples follow a deterministic integer formula; the
    query then parses those bytes back with the stdlib ``wave`` reader and
    emits header metadata + exact amplitude statistics. The oracle
    recomputes the same statistics from the synthesis formula in pure SQL
    — so a header-layout bug, a byte-order bug, or a truncated frame read
    on the Spark side all surface as value mismatches. (Image decode is
    real too: PPM, PNG and baseline JPEG below; only formats outside
    those baselines route through the codec.decode_image_features
    adapter seam.)"""
    from .codec import attach_wav_payload, decode_wav_features

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return decode_wav_features(attach_wav_payload(d))


@register(
    "multimodal_image_decode",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             4 + doc_id % 5 AS width,
             3 + length(text) % 6 AS height
      FROM documents
    ), sub AS (
      SELECT p.doc_id, p.width, p.height,
             (p.doc_id * 7 + k.k * 13) % 256 AS pix
      FROM params p CROSS JOIN (SELECT unnest(generate_series(0, 191)) AS k) k
      WHERE k.k < p.width * p.height * 3
    )
    SELECT doc_id,
           CAST(MAX(width) AS BIGINT) AS width,
           CAST(MAX(height) AS BIGINT) AS height,
           CAST(255 AS BIGINT) AS maxval,
           CAST(MAX(width * height * 3) AS BIGINT) AS n_subpixels,
           CAST(SUM(pix) AS BIGINT) AS sum_pix,
           CAST(MAX(pix) AS BIGINT) AS max_pix
    FROM sub GROUP BY doc_id
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, fully oracle-checked: each document gets a
    genuine binary PPM (P6) payload — an actual image format any netpbm
    tool opens — with deterministic dimensions and RGB bytes; the query
    parses the header and pixel plane back from the raw bytes and emits
    dimensions + exact integer pixel statistics, which the oracle
    recomputes from the synthesis formula in SQL. Together with the WAV
    path above, both audio AND image modalities now have real codecs in
    a container without PIL/cv2; compressed formats are covered by the
    stdlib PNG codec and the numpy baseline-JPEG codec below — no stub
    seams remain on the image path."""
    from .codec import attach_ppm_payload, decode_ppm_features

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return decode_ppm_features(attach_ppm_payload(d))


@register(
    "multimodal_image_decode_png",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             3 + doc_id % 6 AS width,
             2 + length(text) % 7 AS height
      FROM documents
    ), sub AS (
      SELECT p.doc_id, p.width, p.height,
             (p.doc_id * 11 + k.k * 17) % 256 AS pix
      FROM params p CROSS JOIN (SELECT unnest(generate_series(0, 191)) AS k) k
      WHERE k.k < p.width * p.height * 3
    )
    SELECT doc_id,
           CAST(MAX(width) AS BIGINT) AS width,
           CAST(MAX(height) AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(2 AS BIGINT) AS color_type,
           CAST(MAX(width * height * 3) AS BIGINT) AS n_subpixels,
           CAST(SUM(pix) AS BIGINT) AS sum_pix,
           CAST(MAX(pix) AS BIGINT) AS max_pix
    FROM sub GROUP BY doc_id
    """,
)
def multimodal_image_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED image decode, fully oracle-checked: each document
    gets a genuine PNG payload built with stdlib zlib/struct (signature,
    CRC32-verified chunks, deflate IDAT; the encoder cycles all five PNG
    scanline filters so the decoder's filter reconstruction is exercised
    on every image). The query parses the actual PNG bytes back —
    signature, chunk walk, CRC verification, inflate, per-scanline
    unfilter — and emits header fields + exact integer pixel statistics,
    which the oracle recomputes from the synthesis formula in SQL. A bug
    anywhere in the compression loop (chunk layout, CRC, filter math,
    scanline stride) surfaces as a value mismatch. This closes the
    LOSSLESS compressed-format seam; the lossy one (baseline JPEG) is
    closed by multimodal_image_decode_jpeg below."""
    from .codec import attach_png_payload, decode_png_features

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return decode_png_features(attach_png_payload(d))


@register(
    "multimodal_image_decode_jpeg",
    oracle="""
    SELECT doc_id,
           CAST(9 + doc_id % 12 AS BIGINT) AS width,
           CAST(8 + length(text) % 9 AS BIGINT) AS height,
           CAST((9 + doc_id % 12) * (8 + length(text) % 9) AS BIGINT)
             AS n_pixels,
           TRUE AS max_abs_err_le_10,
           TRUE AS mse_le_8
    FROM documents
    """,
)
def multimodal_image_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LOSSY image decode (r7 verdict task 8 — this retires the last
    sha-stub seam): each document gets a genuine baseline-JPEG payload
    (forward DCT, Annex-K quantization + Huffman tables, spec-complete
    marker stream; the bytes open in any viewer) and the query decodes
    the actual JPEG back — marker walk, Huffman decode with byte
    unstuffing, dequantize, inverse zigzag, IDCT. JPEG is lossy, so
    unlike the PNG/PPM twins the pixel plane has no SQL twin; the audit
    ships the MEASUREMENT instead (the sketch-audit conversion): header
    width/height/n_pixels the oracle recomputes from the synthesis
    formula, plus reconstruction-error bounds (max |err| <= 10 grey
    levels, MSE <= 8; measured 5 / <4 on this data) as flags the oracle
    pins to TRUE. A bug anywhere in the DCT/quantizer/entropy loop
    either blows a bound or raises in the parser — a value MISMATCH,
    not an invisible rows-only record. See multimodal/jpeg.py."""
    from .codec import attach_jpeg_payload, decode_jpeg_features

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return decode_jpeg_features(attach_jpeg_payload(d))


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


@register(
    "multimodal_audio_frame_features",
    oracle="""
    WITH docs AS (
      SELECT doc_id, 40 + (length(text) % 50) AS n_samples
      FROM documents WHERE doc_id % 500 = 0
    ), samples AS (
      SELECT d.doc_id, g.i,
             ((d.doc_id * 31 + g.i * 7) % 2001 - 1000) AS amp
      FROM docs d
      JOIN (SELECT unnest(generate_series(0, 99)) AS i) g
        ON g.i < d.n_samples
    )
    SELECT doc_id,
           CAST(i // 16 AS BIGINT) AS frame_idx,
           COUNT(*) AS n_samples,
           CAST(SUM(ABS(amp)) AS BIGINT) AS sum_abs,
           CAST(MAX(ABS(amp)) AS BIGINT) AS max_abs
    FROM samples GROUP BY doc_id, frame_idx
    """,
)
def multimodal_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio features through the REAL binary codec: each
    document's RIFF/WAVE payload (stdlib-wave synthesized, see
    codec.attach_wav_payload) is parsed back from its actual bytes, PCM
    samples are split into 16-sample frames, and per-frame integer
    energy stats (sum|amp|, max|amp|) come out exactly — the windowed
    feature-extraction shape every audio pipeline needs (VAD, energy
    gating, silence trimming), value-checked because the synthesized
    samples are integer-deterministic and the oracle regenerates them
    arithmetically. The engine side decodes the BYTES, so the check
    covers the full binary round trip, not just the formula.

    Scale: mapInPandas over the payload column — frames never become
    rows inside Python (numpy reshape + reduce per batch); the exploded
    (doc, frame) rows leave the UDF already aggregated, so the shuffle
    is |docs|×frames_per_doc feature rows, not samples."""
    import numpy as np

    from .codec import attach_wav_payload

    FRAME = 16
    d = (
        load_tables(spark, sf_dir, names=("documents",))["documents"]
        .filter(F.col("doc_id") % 500 == 0)
    )
    wav = attach_wav_payload(d)

    schema = (
        "doc_id bigint, frame_idx bigint, n_samples bigint, "
        "sum_abs bigint, max_abs bigint"
    )

    def frame_features(batches):
        import io
        import wave as wave_mod

        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "n_samples", "sum_abs", "max_abs")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave_mod.open(io.BytesIO(payload), "rb") as w:
                    raw = w.readframes(w.getnframes())
                amps = np.abs(np.frombuffer(raw, dtype="<i2").astype(np.int64))
                for f in range(0, len(amps), FRAME):
                    chunk = amps[f : f + FRAME]
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(f // FRAME)
                    rows["n_samples"].append(len(chunk))
                    rows["sum_abs"].append(int(chunk.sum()))
                    rows["max_abs"].append(int(chunk.max()))
            yield pd.DataFrame(rows)

    return wav.select("doc_id", "payload").mapInPandas(frame_features, schema=schema)


@register(
    "multimodal_image_phash",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             4 + doc_id % 5 AS width,
             3 + length(text) % 6 AS height
      FROM documents
    ), grays AS (
      SELECT p.doc_id, j.j,
             ((p.doc_id * 7 + (3 * j.j) * 13) % 256
              + (p.doc_id * 7 + (3 * j.j + 1) * 13) % 256
              + (p.doc_id * 7 + (3 * j.j + 2) * 13) % 256) // 3 AS gray
      FROM params p
      CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS j) j
      WHERE j.j < LEAST(p.width * p.height, 48)
    ), stats AS (
      SELECT doc_id, COUNT(*) AS n_bits,
             SUM(gray) // COUNT(*) AS mean_floor
      FROM grays GROUP BY doc_id
    ), hashes AS (
      SELECT g.doc_id,
             CAST(MAX(s.n_bits) AS BIGINT) AS n_bits,
             CAST(SUM(CASE WHEN g.gray >= s.mean_floor
                           THEN CAST(1 AS BIGINT) << CAST(g.j AS INT)
                           ELSE 0 END) AS BIGINT) AS phash,
             CAST(SUM(CASE WHEN g.gray >= s.mean_floor THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_set_bits
      FROM grays g JOIN stats s ON s.doc_id = g.doc_id
      GROUP BY g.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.phash AS phash_a, b.phash AS phash_b,
           CAST(BIT_COUNT(XOR(a.phash, b.phash)) AS BIGINT) AS hamming,
           a.n_set_bits AS set_bits_a, b.n_set_bits AS set_bits_b
    FROM hashes a
    JOIN hashes b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id % 2 = 0
    ORDER BY doc_a
    """,
)
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash over the REAL decoded PPM bytes: grayscale
    each pixel (integer mean of its RGB triplet), threshold against the
    image's floor-mean gray, pack the first ≤48 bits into a BIGINT, and
    report Hamming distances between a deterministic pair set — the
    near-duplicate-image primitive (aHash), running on bytes an actual
    netpbm tool could open, value-checked because the oracle recomputes
    the same hash from the pixel synthesis formula in pure SQL.

    48 bits (not 64) so the bit pack stays clear of BIGINT bit 63, which
    DuckDB range-checks; every arithmetic step is integer (floor gray,
    floor mean), so both engines build the identical hash. The Spark side
    decodes the genuine P6 payload per partition in one mapInPandas pass
    (numpy reshape + vectorized mean/threshold); the pairing join is an
    equi-join on doc_id+1 and Hamming is JVM-side bit_count(xor). At
    corpus scale the pair set generalizes to an LSH bucket join on hash
    prefixes — the dedup_minhash_lsh_pairs layout with phash bands.
    """
    import numpy as np
    import pandas as pd

    from .codec import attach_ppm_payload

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    mm = attach_ppm_payload(d)

    def phash(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                magic, dims, maxval_s, pix = raw.split(b"\n", 3)
                if magic != b"P6":
                    raise ValueError(f"not a P6 PPM payload (doc_id={doc_id})")
                w, h = (int(x) for x in dims.split())
                n = min(w * h, 48)
                plane = np.frombuffer(pix, dtype=np.uint8, count=n * 3).astype(
                    np.int64
                )
                gray = plane.reshape(n, 3).sum(axis=1) // 3
                mean_floor = int(gray.sum()) // n
                bits = gray >= mean_floor
                hashval = int((bits.astype(np.int64) << np.arange(n)).sum())
                rows.append((doc_id, n, hashval, int(bits.sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bits", "phash", "n_set_bits"]
            )

    # persisted: the a/b pair sides below consume `hashes` twice — uncached,
    # the whole PPM encode + phash pipeline runs once per side (guide §5)
    hashes = mm.select("doc_id", "payload").mapInPandas(
        phash, "doc_id bigint, n_bits bigint, phash bigint, n_set_bits bigint"
    ).persist()
    a = hashes.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("phash_a"),
        F.col("n_set_bits").alias("set_bits_a"),
    )
    b = hashes.select(
        (F.col("doc_id") - 1).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("phash_b"),
        F.col("n_set_bits").alias("set_bits_b"),
    )
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "phash_a",
            "phash_b",
            F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b")))
            .cast("bigint")
            .alias("hamming"),
            "set_bits_a",
            "set_bits_b",
        )
        .orderBy("doc_a")
    )


@register(
    "multimodal_audio_vad_segments",
    oracle="""
    WITH docs AS (
      SELECT doc_id, 40 + (length(text) % 50) AS n_samples
      FROM documents WHERE doc_id % 50 = 0
    ), samples AS (
      SELECT d.doc_id, g.i,
             ((d.doc_id * 31 + g.i * 7) % 2001 - 1000) AS amp
      FROM docs d
      JOIN (SELECT unnest(generate_series(0, 99)) AS i) g
        ON g.i < d.n_samples
    ), frames AS (
      SELECT doc_id, i // 16 AS frame_idx,
             CAST(SUM(ABS(amp)) AS BIGINT) AS energy
      FROM samples GROUP BY doc_id, i // 16
    ), thresholds AS (
      SELECT doc_id, SUM(energy) // COUNT(*) AS thr, COUNT(*) AS n_frames
      FROM frames GROUP BY doc_id
    ), voiced AS (
      SELECT f.doc_id, f.frame_idx, t.n_frames,
             CASE WHEN f.energy > t.thr THEN 1 ELSE 0 END AS is_voiced,
             CASE WHEN f.energy > t.thr
                   AND COALESCE(LAG(CASE WHEN f.energy > t.thr THEN 1 ELSE 0 END)
                       OVER (PARTITION BY f.doc_id ORDER BY f.frame_idx), 0) = 0
                  THEN 1 ELSE 0 END AS is_onset
      FROM frames f JOIN thresholds t ON t.doc_id = f.doc_id
    ), runs AS (
      SELECT doc_id, frame_idx, is_voiced, n_frames,
             SUM(is_onset) OVER (PARTITION BY doc_id ORDER BY frame_idx
                                 ROWS UNBOUNDED PRECEDING) AS seg_id
      FROM voiced
    ), segs AS (
      SELECT doc_id, seg_id, COUNT(*) AS seg_len
      FROM runs WHERE is_voiced = 1
      GROUP BY doc_id, seg_id
    )
    SELECT r.doc_id,
           CAST(MAX(r.n_frames) AS BIGINT) AS n_frames,
           CAST(SUM(r.is_voiced) AS BIGINT) AS voiced_frames,
           CAST(COALESCE((SELECT COUNT(*) FROM segs s
                          WHERE s.doc_id = r.doc_id), 0) AS BIGINT)
             AS n_segments,
           CAST(COALESCE((SELECT MAX(seg_len) FROM segs s
                          WHERE s.doc_id = r.doc_id), 0) AS BIGINT)
             AS longest_segment
    FROM runs r
    GROUP BY r.doc_id
    ORDER BY r.doc_id
    """,
)
def multimodal_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation over the REAL WAV bytes: 16-sample
    frame energies from the decoded PCM, per-clip adaptive threshold
    (floor-mean frame energy), and gaps-and-islands over the voiced flags
    → segment count, voiced-frame total, longest run — the silence-trim /
    utterance-split primitive of every audio pipeline, value-checked
    end-to-end because the synthesized samples are integer-deterministic.

    The codec boundary stays minimal: mapInPandas emits per-FRAME energy
    rows (numpy reshape+reduce; samples never become rows), and the
    threshold + island logic is plain windows/aggregates downstream —
    the same gaps-and-islands shape as interval_coverage_merge, so the
    segmentation is Catalyst-optimizable, not buried in Python.
    """
    import numpy as np
    import pandas as pd

    from .codec import attach_wav_payload

    FRAME = 16
    d = (
        load_tables(spark, sf_dir, names=("documents",))["documents"]
        .filter(F.col("doc_id") % 50 == 0)
    )
    wav = attach_wav_payload(d)

    def frame_energy(batches):
        import wave as wavmod
        import io

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wavmod.open(io.BytesIO(bytes(payload))) as wf:
                    pcm = np.frombuffer(
                        wf.readframes(wf.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                for fi in range(0, len(pcm), FRAME):
                    chunk = np.abs(pcm[fi : fi + FRAME])
                    rows.append((doc_id, fi // FRAME, int(chunk.sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "energy"])

    # persisted: `frames` feeds both the threshold aggregate and the
    # voiced join — uncached, the WAV encode + frame-energy python
    # pipeline runs once per consumer (guide §5)
    frames = wav.select("doc_id", "payload").mapInPandas(
        frame_energy, "doc_id bigint, frame_idx bigint, energy bigint"
    ).persist()
    from pyspark.sql import Window as W

    thr = frames.groupBy("doc_id").agg(
        F.floor(F.sum("energy") / F.count("*")).alias("thr"),
        F.count("*").alias("n_frames"),
    )
    w_lag = W.partitionBy("doc_id").orderBy("frame_idx")
    voiced_flag = (F.col("energy") > F.col("thr")).cast("int")
    voiced = (
        frames.join(thr, "doc_id")
        .withColumn("is_voiced", voiced_flag)
        .withColumn(
            "is_onset",
            (
                (F.col("is_voiced") == 1)
                & (F.coalesce(F.lag("is_voiced").over(w_lag), F.lit(0)) == 0)
            ).cast("int"),
        )
    )
    w_run = (
        W.partitionBy("doc_id").orderBy("frame_idx").rowsBetween(
            W.unboundedPreceding, 0
        )
    )
    # persisted: `runs` feeds both the segment rollup and the per-doc
    # totals — uncached, the join + two window passes run twice
    runs = voiced.withColumn("seg_id", F.sum("is_onset").over(w_run)).persist()
    segs = (
        runs.where(F.col("is_voiced") == 1)
        .groupBy("doc_id", "seg_id")
        .agg(F.count("*").alias("seg_len"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.max("seg_len").alias("longest_segment"),
        )
    )
    per_doc = runs.groupBy("doc_id").agg(
        F.max("n_frames").cast("bigint").alias("n_frames"),
        F.sum("is_voiced").cast("bigint").alias("voiced_frames"),
    )
    return (
        per_doc.join(segs, "doc_id", "left")
        .select(
            "doc_id",
            "n_frames",
            "voiced_frames",
            F.coalesce(F.col("n_segments"), F.lit(0)).cast("bigint").alias("n_segments"),
            F.coalesce(F.col("longest_segment"), F.lit(0))
            .cast("bigint")
            .alias("longest_segment"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_image_channel_stats",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             4 + doc_id % 5 AS width,
             3 + length(text) % 6 AS height
      FROM documents
    ), sub AS (
      SELECT p.doc_id,
             k.k % 3 AS channel,
             (p.doc_id * 7 + k.k * 13) % 256 AS pix
      FROM params p CROSS JOIN (SELECT unnest(generate_series(0, 191)) AS k) k
      WHERE k.k < p.width * p.height * 3
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN channel = 0 THEN pix ELSE 0 END) AS BIGINT) AS r_sum,
           CAST(MAX(CASE WHEN channel = 0 THEN pix END) AS BIGINT) AS r_max,
           CAST(SUM(CASE WHEN channel = 1 THEN pix ELSE 0 END) AS BIGINT) AS g_sum,
           CAST(MAX(CASE WHEN channel = 1 THEN pix END) AS BIGINT) AS g_max,
           CAST(SUM(CASE WHEN channel = 2 THEN pix ELSE 0 END) AS BIGINT) AS b_sum,
           CAST(MAX(CASE WHEN channel = 2 THEN pix END) AS BIGINT) AS b_max
    FROM sub GROUP BY doc_id
    """,
)
def multimodal_image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-CHANNEL pixel statistics decoded from the real binary PPM
    payload: the interleaved RGB plane is deinterleaved (stride-3 numpy
    views, no Python loop over pixels) and each channel reports its exact
    integer sum and max — the color-histogram primitive behind white-
    balance checks, duplicate-frame screening, and day/night
    classification in image pipelines. The oracle recomputes every
    channel from the synthesis formula (k % 3 is the channel of subpixel
    k), so an interleave/stride bug in the decoder — the classic way an
    image reader silently swaps channels — is a value mismatch, not a
    plausible-looking wrong answer. Same Arrow-batched mapInPandas shape
    as decode_ppm_features; one scan, no shuffle (per-doc statistics)."""
    import numpy as np
    import pandas as pd
    from .codec import attach_ppm_payload

    schema = (
        "doc_id bigint, r_sum bigint, r_max bigint, g_sum bigint,"
        " g_max bigint, b_sum bigint, b_max bigint"
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                magic, dims, maxval_s, pix = raw.split(b"\n", 3)
                if magic != b"P6":
                    raise ValueError(f"not a P6 PPM payload (doc_id={doc_id})")
                w, h = (int(x) for x in dims.split())
                plane = np.frombuffer(pix, dtype=np.uint8, count=w * h * 3)
                chans = [plane[c::3] for c in range(3)]
                rows.append(
                    (
                        doc_id,
                        int(chans[0].sum(dtype=np.int64)),
                        int(chans[0].max()),
                        int(chans[1].sum(dtype=np.int64)),
                        int(chans[1].max()),
                        int(chans[2].sum(dtype=np.int64)),
                        int(chans[2].max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "r_sum", "r_max", "g_sum", "g_max", "b_sum", "b_max"],
            )

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return (
        attach_ppm_payload(d)
        .select("doc_id", "payload")
        .mapInPandas(extract, schema=schema)
    )


@register(
    "multimodal_audio_spectral_parseval",
    oracle="""
    WITH params AS (
      SELECT doc_id, 40 + (length(text) % 50) AS n_samples FROM documents
    ), samples AS (
      SELECT p.doc_id, p.n_samples,
             ((p.doc_id * 31 + i.i * 7) % 2001) - 1000 AS amp
      FROM params p CROSS JOIN (SELECT unnest(generate_series(0, 88)) AS i) i
      WHERE i.i < p.n_samples
    )
    SELECT doc_id,
           CAST(MAX(n_samples) AS BIGINT) AS n_samples,
           CAST(SUM(amp) AS BIGINT) AS dc_amp,
           CAST(SUM(amp * amp) AS BIGINT) AS time_energy,
           TRUE AS parseval_ok
    FROM samples GROUP BY doc_id
    """,
)
def multimodal_audio_spectral_parseval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frequency-domain feature extraction, oracle-pinned through
    Parseval's theorem: each document's genuine WAV payload is decoded
    back to PCM and run through an actual FFT (numpy rfft inside
    mapInPandas — the spectral front end of every audio featurizer:
    spectrograms, MFCC precursors, bandwidth filters). Three checks ride
    one row per doc:
      - dc_amp: the FFT's DC bin, rounded — must EQUAL the exact integer
        sample sum the oracle recomputes from the synthesis formula (a
        wrong window, dropped frame, or byte-order bug shifts it);
      - time_energy: Σ amp² computed from the DECODED bytes — must equal
        the oracle's arithmetic recomputation (binary round-trip check);
      - parseval_ok: the spectrum's energy (1/N)(|X0|² + 2Σ|Xk|² [+
        |X_{N/2}|² for even N]) must match the time-domain energy to
        within 0.5 — Parseval holds exactly in exact arithmetic, so the
        only slack needed is double-precision FFT noise (~1e-9 relative).
        A scaling or symmetry bug in how the spectrum is consumed breaks
        the identity immediately.
    So the FFT path is value-checked WITHOUT the oracle needing an FFT —
    the ship-the-measurement conversion applied to signal processing.

    Scale: mapInPandas, one row out per doc, spectra never leave the
    worker; the shuffle carries 4 integers + a boolean per document."""
    import numpy as np

    from .codec import attach_wav_payload

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    wav = attach_wav_payload(d)
    schema = (
        "doc_id bigint, n_samples bigint, dc_amp bigint, "
        "time_energy bigint, parseval_ok boolean"
    )

    def spectral(batches):
        import io
        import wave as wave_mod

        import pandas as pd

        for pdf in batches:
            rows = {
                k: []
                for k in ("doc_id", "n_samples", "dc_amp", "time_energy", "parseval_ok")
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave_mod.open(io.BytesIO(payload), "rb") as w:
                    raw = w.readframes(w.getnframes())
                x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                n = len(x)
                spec = np.fft.rfft(x)
                mag2 = np.abs(spec) ** 2
                spec_energy = mag2[0] + 2.0 * mag2[1:-1].sum() + (
                    mag2[-1] if n % 2 == 0 else 2.0 * mag2[-1]
                )
                spec_energy /= n
                time_energy = int((x.astype(np.int64) ** 2).sum())
                rows["doc_id"].append(int(doc_id))
                rows["n_samples"].append(n)
                rows["dc_amp"].append(int(np.floor(spec[0].real + 0.5)))
                rows["time_energy"].append(time_energy)
                rows["parseval_ok"].append(bool(abs(spec_energy - time_energy) < 0.5))
            yield pd.DataFrame(rows)

    return wav.select("doc_id", "payload").mapInPandas(spectral, schema=schema)


@register(
    "multimodal_image_decode_jpeg_color",
    oracle="""
    SELECT doc_id,
           CAST(10 + doc_id % 14 AS BIGINT) AS width,
           CAST(8 + length(text) % 10 AS BIGINT) AS height,
           CAST((10 + doc_id % 14) * (8 + length(text) % 10) * 3 AS BIGINT)
             AS n_subpixels,
           TRUE AS max_abs_err_le_24,
           TRUE AS mse_le_20
    FROM documents
    """,
)
def multimodal_image_decode_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COLOR JPEG decode (r8): the common real-world form — YCbCr
    4:2:0 with interleaved 16x16 MCUs (4 luma + 2 chroma blocks each),
    separate Annex-K luma/chroma quantization and Huffman table pairs,
    per-component DC predictors. Each document gets a genuine color
    .jpg; the query decodes the actual bytes back through the full
    interleaved entropy loop, upsamples chroma, converts YCbCr->RGB,
    and audits reconstruction against the SQL-expressible synthesis
    gradients (max |err| <= 24 subpixel levels, MSE <= 20; measured
    13 / <=11 — chroma subsampling dominates the error, as it should).
    Together with the grayscale twin this closes the JPEG surface:
    both baseline forms decode for real, no stubs. See
    multimodal/jpeg.py (color section)."""
    from .codec import attach_jpeg_color_payload, decode_jpeg_color_features

    d = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return decode_jpeg_color_features(attach_jpeg_color_payload(d))
