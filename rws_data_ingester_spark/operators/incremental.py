"""Incremental near-dedup against a persisted MinHash/LSH index
(SURVEY.md §2.10 [EXT] — the batch-over-time form of near-dedup).

At 100 TB you never re-dedup the whole corpus when new data arrives: the
corpus's LSH band buckets are persisted ONCE as a (id, band_id,
band_hash) index table — three longs per row, ~64 rows per document at
16 hashes / 4 bands — and each incoming batch is deduped by joining ITS
band rows against that index. Per-batch cost is linear in the batch
(signature compute is a shuffle-free per-row map, see
``dedup.minhash_signature``) plus one equi-join keyed on (band_id,
band_hash); the corpus text is never re-read and never shuffles.

Hot buckets (boilerplate/templated spam — guaranteed at web scale) blow
up the join output quadratically ONLY if left unaggregated; the
``groupBy(new_id).min(corpus_id)`` that follows has a map-side partial
min, so each join task reduces its bucket's hits to one row per new doc
before anything shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.operators.dedup import _banded, minhash_signature
from rws_data_ingester_spark.plans.registry import query


def minhash_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band_id, band_hash) — the persistable dedup index of a corpus.

    Write this once (partitioned/bucketed by band_hash on a real
    cluster); every future batch dedups against it without touching the
    corpus text again.
    """
    sigs = minhash_signature(docs.select(id_col, text_col), id_col, text_col, num_hashes)
    return _banded(sigs, id_col, num_hashes, bands)


def dedup_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Annotate each new doc with ``dup_of`` = the smallest indexed id
    sharing any LSH band bucket (NULL = novel). Self-hits are ignored, so
    deduping a batch whose novel docs were already folded into the index
    is safe (idempotent re-runs).

    An identical copy of an indexed document is ALWAYS caught: equal
    texts have equal signatures, hence equal band hashes in every band.
    """
    new_bands = minhash_index(new_docs, id_col, text_col, num_hashes, bands)
    corpus = index.select(
        F.col(id_col).alias("_corpus_id"), "band_id", "band_hash"
    )
    hits = (
        new_bands.join(corpus, ["band_id", "band_hash"])
        .filter(F.col("_corpus_id") != F.col(id_col))
        .groupBy(id_col)
        .agg(F.min("_corpus_id").alias("dup_of"))
    )
    return new_docs.join(hits, id_col, "left")


def fold_into_index(
    index: DataFrame, annotated_batch: DataFrame, batch_index: DataFrame, id_col: str
) -> DataFrame:
    """Updated index = old index + band rows of the batch's NOVEL docs
    only (dups point at an already-indexed canonical doc; indexing them
    too would only grow the buckets they'd always re-hit)."""
    novel_ids = annotated_batch.filter(F.col("dup_of").isNull()).select(id_col)
    return index.unionByName(batch_index.join(novel_ids, id_col, "left_semi"))


@query("dedup_incremental_index", oracle=None)  # engine-specific hashes → rows-only
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-dedup demo on the documents table: docs with
    doc_id % 5 != 0 are the indexed corpus, the remaining 20% arrive as
    the new batch. One row per batch doc with its dup verdict — row
    count is exactly the batch size, independent of hash choices.
    """
    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    index = minhash_index(corpus, "doc_id", "text")
    return dedup_against_index(batch, index, "doc_id", "text").select(
        "doc_id",
        F.col("dup_of").isNotNull().alias("is_dup"),
        "dup_of",
    )
