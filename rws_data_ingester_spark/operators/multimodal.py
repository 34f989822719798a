"""Multimodal column plumbing (SURVEY.md §2.10 [EXT]).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The decode step is STUBBED (no media libs in this
runtime): ``decode_stub_features`` computes a deterministic fake feature
vector (byte histogram) so the Spark-side plumbing — schema, Arrow batch
shape, mapInPandas signature, partitioning — is real and tested, while
``decode_image``/``decode_audio`` raise NotImplementedError until real
codecs are wired in.

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
from rws_data_ingester_spark.plans.registry import query

N_HISTOGRAM_BUCKETS = 8


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — requires PIL/cv2, absent in this runtime."""
    raise NotImplementedError("image codecs not available in this runtime; use decode_stub_features")


def decode_audio(payload: bytes) -> "np.ndarray":
    raise NotImplementedError("audio codecs not available in this runtime; use decode_stub_features")


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
                p = payload or b""
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
    return feats.select(
        "doc_id",
        "byte_len",
        F.round(F.expr("aggregate(features, cast(0.0 as double), (a, x) -> a + x)"), 6).alias(
            "feature_sum"
        ),
        F.size("features").cast("long").alias("n_features"),
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
        F.round(
            F.expr("aggregate(features, cast(0.0 as double), (a, x) -> a + x)"), 6
        ).alias("feature_mass"),
    )
