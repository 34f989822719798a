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
