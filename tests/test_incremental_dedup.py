"""Incremental MinHash-index dedup: catch-guarantees, containment in the
full-corpus candidate set, and index-fold idempotency (oracle-
inexpressible — hash-dependent, SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rws_data_ingester_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
)
from rws_data_ingester_spark.operators.incremental import (
    dedup_against_index,
    fold_into_index,
    minhash_index,
)
from rws_data_ingester_spark.plans import REGISTRY

from tests.conftest import SF_DIR

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "completely different words about spark distributed data processing engines"),
    (3, "seven misty mountains rise beyond the valley where the cold wind sings"),
]
BATCH = [
    (10, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (11, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup of 1
    (12, "a genuinely novel document mentioning tensors gradients and optimizers only"),
]


def _frames(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    return corpus, batch


def test_exact_dup_always_caught_and_novel_passes(spark):
    corpus, batch = _frames(spark)
    index = minhash_index(corpus, "doc_id", "text")
    out = {r["doc_id"]: r["dup_of"] for r in
           dedup_against_index(batch, index, "doc_id", "text").collect()}
    assert out[10] == 1, "identical text shares every band hash — must be caught"
    assert out[12] is None, "unrelated doc must come back novel"


def test_flags_contained_in_full_corpus_candidates(spark):
    """Every (batch_id, dup_of) the incremental path emits must be a
    candidate pair of the one-shot LSH over corpus+batch — the
    incremental index changes WHEN docs meet, never WHO can meet."""
    corpus, batch = _frames(spark)
    index = minhash_index(corpus, "doc_id", "text")
    flagged = {
        (r["dup_of"], r["doc_id"])
        for r in dedup_against_index(batch, index, "doc_id", "text").collect()
        if r["dup_of"] is not None
    }
    full = corpus.unionByName(batch)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            minhash_signature(full, "doc_id", "text"), "doc_id"
        ).collect()
    }
    assert flagged <= pairs, f"incremental flags {flagged - pairs} not in one-shot candidates"


def test_fold_then_rededup_is_idempotent(spark):
    """After folding the batch's novel docs into the index, re-deduping
    the SAME batch must not flag those novel docs (self-hits ignored) and
    must flag new copies of them."""
    corpus, batch = _frames(spark)
    index = minhash_index(corpus, "doc_id", "text")
    batch_index = minhash_index(batch, "doc_id", "text")
    annotated = dedup_against_index(batch, index, "doc_id", "text")
    index2 = fold_into_index(index, annotated, batch_index, "doc_id")

    again = {r["doc_id"]: r["dup_of"] for r in
             dedup_against_index(batch, index2, "doc_id", "text").collect()}
    assert again[12] is None, "a doc must not be a dup of itself after folding"

    copies = spark.createDataFrame(
        [(20, BATCH[2][1])], "doc_id long, text string"
    )
    recheck = dedup_against_index(copies, index2, "doc_id", "text").collect()
    assert recheck[0]["dup_of"] == 12, "copy of a folded novel doc must now be caught"


def test_fold_excludes_dup_band_rows(spark):
    corpus, batch = _frames(spark)
    index = minhash_index(corpus, "doc_id", "text")
    batch_index = minhash_index(batch, "doc_id", "text")
    annotated = dedup_against_index(batch, index, "doc_id", "text")
    index2 = fold_into_index(index, annotated, batch_index, "doc_id")
    added_ids = {r["doc_id"] for r in
                 index2.select("doc_id").subtract(index.select("doc_id")).collect()}
    assert added_ids == {12}, "only novel docs' band rows join the index"


def test_registered_query_rowcount_is_batch_size(spark):
    out = REGISTRY["dedup_incremental_index"].fn(spark, SF_DIR)
    n_batch = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % 5 == 0)
        .count()
    )
    assert out.count() == n_batch
    assert out.columns == ["doc_id", "is_dup", "dup_of"]
