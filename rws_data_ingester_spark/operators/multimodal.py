"""Multimodal column plumbing (SURVEY.md §2.10 [EXT]).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. Two codec tiers:

- REAL decoders for header+raw formats that need only numpy —
  ``decode_ppm`` (P6 image: container parse → (h, w, 3) pixels, block
  resize) and ``decode_wav`` (RIFF PCM16: header parse → samples,
  RMS/zero-crossing features) — exercised end-to-end by
  ``multimodal_image_decode`` / ``multimodal_audio_features`` and pinned
  to closed forms in tests.
- REAL compressed codecs (round 3, pure numpy — ``operators/codecs.py``):
  baseline JPEG (ITU-T T.81: DQT/SOF0/DHT/DRI parse, Huffman + byte
  unstuffing + RSTn, dequant, IDCT, 4:2:0 upsample, YCbCr→RGB) and IMA
  ADPCM audio (4 bits/sample step-adaptive DPCM). ``decode_image``
  dispatches JPEG/PPM by magic bytes; ``decode_audio`` dispatches
  RIFF-PCM/ADPCM. Exercised end-to-end by ``multimodal_jpeg_decode`` /
  ``multimodal_adpcm_roundtrip``; the decoder is pinned against a
  hand-assembled byte-level JPEG in tests (so encoder/decoder bugs
  cannot cancel).
- MP3: FORMALLY DESCOPED (SURVEY §2.10, round 4) — ``decode_audio``
  raises NotImplementedError for it; ``decode_stub_features`` (byte
  histogram) keeps that plumbing tested. Rationale: the ISO 11172-3
  Layer III Huffman code tables (34 of them) and the 512-coefficient
  synthesis window are large tabulated constants that cannot be
  re-derived from first principles, and this environment carries no
  normative tables or reference decoder to pin an implementation
  against — a from-memory decoder could be silently wrong with no way
  to detect it, which is strictly worse than a declared stub. (JPEG
  was implementable because T.81 Annex K prints its tables and the
  decoder is pinned to hand-assembled byte streams; the compressed-
  AUDIO codec row is covered by the real IMA ADPCM pair.)

The fixture corpus has no binary table, so payloads are manufactured from
``documents.text`` (utf-8 bytes) — the plumbing is identical for real
media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query

N_HISTOGRAM_BUCKETS = 8


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL image decode, dispatched on magic bytes: baseline JPEG
    (pure-numpy T.81 decoder, ``operators/codecs.py``), PNG (stdlib-zlib
    inflate + all five scanline filters), or P6 PPM.
    Returns (h, w, 3/4) or (h, w) uint8."""
    if payload[:2] == b"\xff\xd8":
        from rws_data_ingester_spark.operators.codecs import decode_jpeg

        return decode_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from rws_data_ingester_spark.operators.codecs import decode_png

        return decode_png(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError("unsupported image format (JPEG, PNG, PPM are implemented)")


def decode_audio(payload: bytes) -> tuple[int, "np.ndarray"]:
    """REAL audio decode, dispatched on magic bytes: RIFF/WAVE PCM16 or
    IMA ADPCM (``b'IMA1'`` + rate tag, ``operators/codecs.py``). Returns
    (sample_rate, int16 samples). MP3 stays NotImplementedError — see the
    module docstring."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:4] == b"IMA1":
        import struct

        from rws_data_ingester_spark.operators.codecs import adpcm_decode

        rate = struct.unpack_from("<I", payload, 4)[0]
        return rate, adpcm_decode(payload[8:])
    raise NotImplementedError("unsupported audio format (WAV PCM16 and IMA ADPCM are implemented)")


def decode_stub_features(payload: bytes) -> list[float]:
    """Deterministic fake 'decode': normalized byte histogram over
    N_HISTOGRAM_BUCKETS buckets — a stand-in feature extractor with the
    same shape contract a real decoder would have."""
    if not payload:
        return [0.0] * N_HISTOGRAM_BUCKETS
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=N_HISTOGRAM_BUCKETS, range=(0, 256))
    return (hist / len(arr)).tolist()


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a binary payload column + typed metadata struct."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("byte_len"),
            F.lit(1).alias("n_frames"),
        ),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — Arrow
    ships the bytes in batches; one Python worker per partition. At scale
    this is exactly how a real image-resize / frame-sample stage runs."""
    schema = f"{id_col} long, features array<double>, byte_len long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [decode_stub_features(p) for p in pdf["payload"]],
                    "byte_len": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS byte_len,
           'text/plain' AS mime
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    with_payload = attach_payload(d)
    return with_payload.select(
        "doc_id",
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.mime").alias("mime"),
    )


FRAME_BYTES = 256
SAMPLE_EVERY = 4


def frame_sample(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Video-shaped frame sampling over binary payloads: chunk the payload
    into fixed FRAME_BYTES 'frames', keep every SAMPLE_EVERY-th frame.
    Runs as mapInPandas — the same Arrow-batched shape a real ffmpeg
    frame-sampler would use; only the chunking rule is a stand-in."""
    schema = f"{id_col} long, n_frames long, n_sampled long, sampled_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    # NULL payload -> NULL frame stats (SQL NULL
                    # propagation; a missing video is not a 0-frame one)
                    rows.append((doc_id, None, None, None))
                    continue
                p = bytes(payload)
                frames = [p[i : i + FRAME_BYTES] for i in range(0, len(p), FRAME_BYTES)]
                sampled = frames[::SAMPLE_EVERY]
                rows.append(
                    (doc_id, len(frames), len(sampled), sum(len(f) for f in sampled))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_frames", "n_sampled", "sampled_bytes"]
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len FROM documents
    )
    SELECT doc_id,
           ((byte_len + {FRAME_BYTES - 1}) // {FRAME_BYTES})::BIGINT AS n_frames,
           (((byte_len + {FRAME_BYTES - 1}) // {FRAME_BYTES})
             + {SAMPLE_EVERY - 1}) // {SAMPLE_EVERY} AS n_sampled
    FROM b
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampling runs for real (mapInPandas over the byte payload); the
    oracle checks the frame arithmetic the chunking must satisfy —
    ceil(bytes/frame) frames, every 4th kept."""
    d = Catalog(spark, sf_dir).documents
    return frame_sample(attach_payload(d)).select("doc_id", "n_frames", "n_sampled")


@query("multimodal_features", oracle=None)  # stubbed decode → rows-only
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    feats = extract_features(attach_payload(d))
    # bind the aggregate once — pround's 4 operand references would
    # otherwise re-fold the features array per reference
    return feats.select(
        "doc_id",
        "byte_len",
        F.expr("aggregate(features, cast(0.0 as double), (a, x) -> a + x)").alias("_fsum"),
        F.size("features").cast("long").alias("n_features"),
    ).select(
        "doc_id",
        "byte_len",
        pround("_fsum", 6).alias("feature_sum"),
        "n_features",
    )


def resize_features(df: DataFrame, factor: int = 2, id_col: str = "doc_id") -> DataFrame:
    """'Resize' stage: downsample the decoded feature vector by summing
    adjacent bins (factor 2: 8 bins → 4). Stands in for image resize /
    audio resample — same mapInPandas shape, decoded-representation in,
    smaller decoded-representation out; mass (histogram sum) is preserved,
    which the unit test asserts."""
    schema = f"{id_col} long, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for feats in pdf["features"]:
                arr = np.asarray(feats, dtype=np.float64)
                out.append(arr.reshape(-1, factor).sum(axis=1).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": out})

    return df.select(id_col, "features").mapInPandas(run, schema=schema)


@query("multimodal_resize", oracle=None)  # stub decode upstream → rows-only
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → resize pipeline over binary payloads; emits pre/post bin
    counts and the (preserved) feature mass."""
    d = Catalog(spark, sf_dir).documents
    feats = extract_features(attach_payload(d)).select(
        "doc_id", F.col("features").alias("features")
    )
    resized = resize_features(feats, factor=2)
    return resized.select(
        "doc_id",
        F.size("features").cast("long").alias("n_bins"),
        pround(
            F.expr("aggregate(features, cast(0.0 as double), (a, x) -> a + x)"), 6
        ).alias("feature_mass"),
    )


# --------------------------------------------------------------------------
# REAL codecs (round 2): PPM image and WAV/PCM audio are header+raw-bytes
# formats decodable with numpy alone — no external media libs — so the
# decode step for these two is NOT a stub: real container parsing, real
# pixel/sample math, with synthesis as the payload source (the fixture
# corpus ships no media files). Compressed codecs (JPEG/MP3/H.264) still
# route through decode_image/decode_audio stubs above; they drop into the
# same mapInPandas slots.
# --------------------------------------------------------------------------
IMG_W, IMG_H = 16, 8
WAV_RATE, WAV_N = 8000, 1024


def make_ppm(doc_id: int, w: int = IMG_W, h: int = IMG_H) -> bytes:
    """Synthesize a binary P6 PPM: header + raw RGB. Pixel channels are a
    deterministic gradient of (x, y, doc_id) so every decoded statistic
    has a closed form the tests pin."""
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    px = ((x + y + doc_id * (c + 1)) % 256).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL P6 PPM decode: parse the 3-token header, reshape the raw RGB
    plane. Returns (h, w, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(t) for t in parts[1].split())
    maxval, raw = int(parts[2]), parts[3]
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    return np.frombuffer(raw, dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)


def make_wav(doc_id: int, n: int = WAV_N, rate: int = WAV_RATE) -> bytes:
    """Synthesize a 16-bit mono RIFF/WAVE payload: a sine at a
    doc-dependent frequency, amplitude 0.5 FSD."""
    import struct

    freq = 100.0 + (doc_id % 400)
    t = np.arange(n) / rate
    samples = (0.5 * 32767.0 * np.sin(2 * np.pi * freq * t)).astype("<i2")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL RIFF/WAVE decode (PCM16 mono): validate magic, read the
    sample rate from the fmt chunk, view the data chunk as int16."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = struct.unpack_from("<I", payload, 24)[0]
    data_len = struct.unpack_from("<I", payload, 40)[0]
    samples = np.frombuffer(payload, dtype="<i2", offset=44, count=data_len // 2)
    return rate, samples


@query("multimodal_image_decode", oracle=None)  # synthesized payload → rows-only
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a PPM per document (pure-JVM byte assembly would also
    work; synthesis rides in the same Arrow batch as decode), then REAL
    image decode + stats + 2x2 block-average resize in one mapInPandas
    pass. Per-channel means and resized dims are emitted; tests pin them
    to the gradient's closed form. At 100 TB the payload column arrives
    from binaryFile/parquet instead — everything after `decode_ppm` is
    unchanged."""
    d = Catalog(spark, sf_dir).documents.select("doc_id").filter(F.col("doc_id") < 200)
    schema = (
        "doc_id long, width long, height long, mean_r double, mean_g double,"
        " mean_b double, rs_width long, rs_height long, rs_mean double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                img = decode_ppm(make_ppm(int(doc_id)))
                h, w, _ = img.shape
                means = img.reshape(-1, 3).mean(axis=0)
                small = (
                    img.astype(np.float64)
                    .reshape(h // 2, 2, w // 2, 2, 3)
                    .mean(axis=(1, 3))
                )
                rows.append(
                    (int(doc_id), w, h, round(means[0], 6), round(means[1], 6),
                     round(means[2], 6), small.shape[1], small.shape[0],
                     round(float(small.mean()), 6))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_r", "mean_g",
                         "mean_b", "rs_width", "rs_height", "rs_mean"],
            )

    return d.mapInPandas(run, schema=schema)


@query("multimodal_audio_features", oracle=None)  # synthesized payload → rows-only
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode + audio feature extraction (RMS level, zero
    crossings, dominant-period estimate) in one Arrow-batched pass — the
    fingerprint/loudness stage of an audio curation pipeline. Tests pin
    RMS to the sine's closed form (amp/sqrt(2)) and the zero-crossing
    count to 2·freq·duration within one crossing."""
    d = Catalog(spark, sf_dir).documents.select("doc_id").filter(F.col("doc_id") < 200)
    schema = "doc_id long, sample_rate long, n_samples long, rms double, zero_crossings long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                rate, s = decode_wav(make_wav(int(doc_id)))
                x = s.astype(np.float64) / 32767.0
                rms = float(np.sqrt((x * x).mean()))
                # drop exact-zero samples first: a sine whose period divides
                # the sample rate lands exactly ON zero at each crossing,
                # and a plain sign-product test would count none of them
                nz = x[x != 0]
                zc = int(((nz[:-1] * nz[1:]) < 0).sum())
                rows.append((int(doc_id), rate, len(s), round(rms, 6), zc))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "rms", "zero_crossings"],
            )

    return d.mapInPandas(run, schema=schema)


def extract_image_metadata_quarantined(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode binary image payloads with PERMISSIVE-style quarantine: a
    per-row decode failure (truncated file, unknown format, corrupt CRC)
    lands in a ``decode_error`` column instead of killing the task — the
    `source_json_corrupt_records` pattern applied to media. At 100 TB a
    single bad file must never fail a 512 MB task's worth of good ones.
    Emits decoded dims for good rows, NULL dims + the error class/message
    for quarantined ones; downstream splits on ``decode_error IS NULL``."""
    schema = f"{id_col} long, width long, height long, channels long, decode_error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload) if payload is not None else b"")
                    ch = 1 if img.ndim == 2 else img.shape[2]
                    rows.append((int(doc_id), img.shape[1], img.shape[0], ch, None))
                except Exception as exc:  # quarantine, never crash the task
                    rows.append(
                        (int(doc_id), None, None, None, f"{type(exc).__name__}: {exc}")
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "decode_error"]
            )

    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# Round 3: compressed codecs for real — baseline JPEG + IMA ADPCM
# (pure numpy, operators/codecs.py). These close the JPEG/MP3 stub gap on
# the image side and replace the MP3 slot with a real compressed audio
# codec; only MP3 itself remains a declared stub.
# --------------------------------------------------------------------------
JPEG_W, JPEG_H = 32, 24


def make_rgb_gradient(doc_id: int, w: int = JPEG_W, h: int = JPEG_H) -> np.ndarray:
    """Deterministic smooth RGB test image, distinct per doc_id."""
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return (
        (96.0 + 80.0 * np.sin(x / 7.0 + c) + 60.0 * np.cos(y / 5.0 + doc_id % 17))
        .clip(0, 255)
        .astype(np.uint8)
    )


@query("multimodal_jpeg_decode", oracle=None)  # synthesized payload → rows-only
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image pipeline: synthesize an RGB image per doc,
    encode it as baseline JPEG (4:2:0, quality 85, restart markers), then
    decode through `decode_image`'s magic-byte dispatch and emit decoded
    dims, compression ratio, and PSNR vs the pre-encode pixels — the
    decode/validate stage of an image-curation pipeline. Tests pin the
    decoder against a hand-assembled byte-level JPEG and a closed-form
    constant image, so this query's numbers trace to the T.81 spec, not
    to the encoder. At 100 TB the payload column arrives from
    binaryFile/parquet; everything after `decode_image` is unchanged."""
    from rws_data_ingester_spark.operators.codecs import encode_jpeg

    d = Catalog(spark, sf_dir).documents.select("doc_id").filter(F.col("doc_id") < 100)
    schema = (
        "doc_id long, width long, height long, jpeg_bytes long, raw_bytes long,"
        " psnr_db double, mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                img = make_rgb_gradient(int(doc_id))
                payload = encode_jpeg(img, quality=85, subsample="4:2:0", restart_interval=2)
                dec = decode_image(payload)
                mse = float(((img.astype(np.float64) - dec.astype(np.float64)) ** 2).mean())
                psnr = 99.0 if mse == 0 else float(10 * np.log10(255.0**2 / mse))
                means = dec.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (int(doc_id), dec.shape[1], dec.shape[0], len(payload), img.size,
                     round(psnr, 3), round(means[0], 6), round(means[1], 6),
                     round(means[2], 6))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "jpeg_bytes", "raw_bytes",
                         "psnr_db", "mean_r", "mean_g", "mean_b"],
            )

    return d.mapInPandas(run, schema=schema)


@query("multimodal_adpcm_roundtrip", oracle=None)  # synthesized payload → rows-only
def multimodal_adpcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio pipeline: PCM16 sine per doc → IMA ADPCM
    encode (~4:1) → `decode_audio` magic-byte dispatch → SNR + level
    features. Tests pin the codec's SNR floor and ramp tracking."""
    import struct as _struct

    from rws_data_ingester_spark.operators.codecs import adpcm_encode

    d = Catalog(spark, sf_dir).documents.select("doc_id").filter(F.col("doc_id") < 100)
    schema = (
        "doc_id long, sample_rate long, n_samples long, adpcm_bytes long,"
        " pcm_bytes long, snr_db double, rms double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                rate, s = decode_wav(make_wav(int(doc_id)))
                payload = b"IMA1" + _struct.pack("<I", rate) + adpcm_encode(s)
                rate2, dec = decode_audio(payload)
                a = s.astype(np.float64)
                err = a - dec.astype(np.float64)
                snr = float(10 * np.log10((a * a).sum() / max((err * err).sum(), 1e-12)))
                rms = float(np.sqrt(((dec.astype(np.float64) / 32767.0) ** 2).mean()))
                rows.append(
                    (int(doc_id), rate2, len(dec), len(payload), 2 * len(s),
                     round(snr, 3), round(rms, 6))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "adpcm_bytes",
                         "pcm_bytes", "snr_db", "rms"],
            )

    return d.mapInPandas(run, schema=schema)
