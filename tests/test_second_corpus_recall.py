"""Second-corpus recall proof for the fixed LSH/IVF defaults (VERDICT r4,
task 6): the registered probes hard-code (16 planes as 4 bands × 4 bits)
and (16 centroids, nprobe 4). The fixture embeddings are random gaussians
— the WORST case for banding (true neighbors at cosine ~0.4) — so the
recall numbers measured there cannot show fixture-overfit in the regime
the knobs are actually tuned for. This suite builds a SECOND corpus shape
at sf0.1 scale (2000 rows × 64-d, matching the sf0.1 embeddings table):
200 clusters × 10 members with intra-cluster cosine ≈0.97, i.e. the
near-dup regime (≥0.9) the 4×4 OR-construction's s-curve targets
(pair survival 1-(1-p⁴)⁴ ≈ 0.95 at cosine 0.9, ≈0.999 at 0.97).

The registered queries run UNCHANGED (same defaults, same seed) on the
second corpus via a corpus-dir swap — recall@5 vs the exact path must be
≥0.9 for BOTH approximate tiers. The measured sweep row lives in
SCALE.md's knob table.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from rws_data_ingester_spark.plans import REGISTRY

N_CLUSTERS, MEMBERS, DIM = 200, 10, 64


def make_clustered_corpus() -> list[tuple[int, list[float]]]:
    """200 seeded cluster bases × 10 members each; member noise σ=0.03
    per component → E[cosine(member, base)] ≈ 1/sqrt(1+DIM·σ²) ≈ 0.972.
    vec_id = member·N_CLUSTERS + cluster, so the query set (vec_id < 10)
    is member 0 of ten DIFFERENT clusters — ten independent recall
    trials, not one cluster measured ten times."""
    rng = np.random.default_rng(20260815)
    bases = rng.normal(size=(N_CLUSTERS, DIM))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows = []
    for m in range(MEMBERS):
        noise = rng.normal(scale=0.03, size=(N_CLUSTERS, DIM))
        vecs = (bases + noise).astype("float32")
        for c in range(N_CLUSTERS):
            rows.append((m * N_CLUSTERS + c, [float(x) for x in vecs[c]]))
    return rows


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("clustered_corpus")
    spark.createDataFrame(
        make_clustered_corpus(), "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


def _topk_pairs(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def exact_pairs(spark, corpus_dir) -> set[tuple[int, int]]:
    pairs = _topk_pairs(REGISTRY["simsearch_topk_exact"].fn(spark, corpus_dir))
    assert len(pairs) == 50  # 10 queries × top-5
    return pairs


def test_corpus_is_in_the_near_dup_regime(spark, corpus_dir, exact_pairs):
    """Sanity: the true top-5 of every query sits at cosine ≥0.9 — the
    regime the defaults claim. Without this the recall assertions below
    would silently degrade back to the random-gaussian worst case."""
    sims = [
        r["cosine_sim"]
        for r in REGISTRY["simsearch_topk_exact"].fn(spark, corpus_dir).collect()
    ]
    assert min(sims) >= 0.9, f"second corpus not in the ≥0.9 regime: {min(sims)}"


def test_lsh_defaults_recall_on_clustered_corpus(spark, corpus_dir, exact_pairs):
    """SAME registered defaults (4 bands × 4 bits, seed 42): recall@5 of
    the true top-5 must be ≥0.9 on the near-dup corpus. Measured 0.98
    (49/50) at build time — asserted at 0.9 to absorb fixture/seed
    regeneration."""
    approx = _topk_pairs(REGISTRY["simsearch_topk_lsh"].fn(spark, corpus_dir))
    recall = len(exact_pairs & approx) / len(exact_pairs)
    assert recall >= 0.9, f"LSH defaults overfit to the gaussian fixture: {recall}"


def test_ivf_defaults_recall_on_clustered_corpus(spark, corpus_dir, exact_pairs):
    """SAME registered defaults (16 centroids, nprobe 4): near-identical
    vectors must co-locate in the probed cells. Measured 1.00 at build
    time; ≥0.9 asserted."""
    approx = _topk_pairs(REGISTRY["simsearch_topk_ivf"].fn(spark, corpus_dir))
    recall = len(exact_pairs & approx) / len(exact_pairs)
    assert recall >= 0.9, f"IVF defaults overfit to the gaussian fixture: {recall}"


def test_lsh_candidate_fraction_stays_sublinear_on_clusters(spark, corpus_dir):
    """Recall must not come from degenerate bucketing (everything in one
    bucket scans the whole corpus). On the clustered corpus the 4×4 bands
    must keep the mean candidate fraction per query well under the
    all-pairs 1.0 — measured ≈0.05 at build time, asserted <0.3."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.operators.similarity import (
        banded_hyperplane_signature,
        scorable,
    )

    e = scorable(Catalog(spark, corpus_dir).embeddings)
    n = e.count()
    bands = banded_hyperplane_signature(e.select("vec_id", "embedding"))
    qb = bands.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "band_id", "band_val"
    )
    cands = (
        qb.join(bands.withColumnRenamed("vec_id", "nid"), ["band_id", "band_val"])
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
        .count()
    )
    frac = cands / (10 * (n - 1))
    assert frac < 0.3, f"banding degenerated to a corpus scan: {frac}"


def test_pq_defaults_recall_on_clustered_corpus(spark, corpus_dir, exact_pairs):
    """SAME registered PQ defaults (subquantizer layout, ADC scoring):
    product-quantization error is small relative to the inter-cluster
    separation, so the true near-dup top-5 must survive ADC ranking.
    Measured 1.00 at build time; ≥0.9 asserted (the fixture-corpus pin
    in test_vectors_tokenizer.py stays at 0.8 — random gaussians are the
    harder regime for ADC, same story as the LSH bands)."""
    approx = _topk_pairs(REGISTRY["simsearch_topk_pq"].fn(spark, corpus_dir))
    recall = len(exact_pairs & approx) / len(exact_pairs)
    assert recall >= 0.9, f"PQ defaults overfit to the gaussian fixture: {recall}"
