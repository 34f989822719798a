"""Repetition-quality and semantic-dedup tests (operators/quality.py).

Oracle parity for text_repetition / pipeline_quality_filter runs in
test_oracle_parity.py automatically; here we pin the oracle-inexpressible
parts: the k-means-blocked semantic dedup's recall vs the exact global
duplicate set, the gate's partition property, and the bigram-window edge
cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_semantic_dedup_recall_vs_exact(spark):
    """Cell-blocked keep-first dup ids must recover ≥0.9 of the exact
    global (all-pairs) dup set — near-identical vectors should land in
    the same k-means cell essentially always. The fixture embeddings have
    no cosine≥0.9 pairs (max ≈0.51), so plant them: 40 seeded base
    vectors + 10 tiny-perturbation copies (cosine >0.99 to their base)."""
    import numpy as np

    from rws_data_ingester_spark.operators.similarity import (
        _as_double,
        embedding_dup_ids,
        ivf_index,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype("float32")
    dups = base[:10] + rng.normal(scale=1e-3, size=(10, 16)).astype("float32")
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([base, dups]))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    v_plain = e.select("vec_id", _as_double("embedding").alias("e"))
    exact = {r["vec_id"] for r in embedding_dup_ids(v_plain, [], threshold=0.9).collect()}
    assert len(exact) == 10, "every planted copy must be an exact-path dup"

    assignments, _ = ivf_index(e, n_centroids=8)
    v_blocked = v_plain.join(assignments, "vec_id")
    approx = {
        r["vec_id"]
        for r in embedding_dup_ids(v_blocked, ["centroid_id"], threshold=0.9).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"semantic-dedup recall {recall} vs exact dup set"
    # blocking can only shrink the pair space — no false dup ids
    assert approx <= exact


def test_semantic_dedup_counts_conserve_corpus(spark):
    from rws_data_ingester_spark.plans import REGISTRY
    from rws_data_ingester_spark.catalog import Catalog

    out = REGISTRY["pipeline_semantic_dedup"].fn(spark, SF_DIR)
    total = out.agg(F.sum(F.col("n_kept") + F.col("n_dropped"))).collect()[0][0]
    assert total == Catalog(spark, SF_DIR).embeddings.count()


def test_quality_filter_partitions_corpus(spark):
    """First-fail verdicts partition the corpus: counts sum to corpus
    size and every verdict is a known label."""
    from rws_data_ingester_spark.plans import REGISTRY
    from rws_data_ingester_spark.catalog import Catalog

    rows = REGISTRY["pipeline_quality_filter"].fn(spark, SF_DIR).collect()
    labels = {r["verdict"] for r in rows}
    assert labels <= {"pass", "length", "dup_tokens", "top_bigram", "token_len"}
    assert sum(r["n_docs"] for r in rows) == Catalog(spark, SF_DIR).documents.count()
    assert "pass" in labels, "gate should not drop the whole fixture corpus"


def test_bigram_window_edge_cases(spark):
    """The sequence() guard: 0- and 1-token docs yield an empty bigram
    array (sequence(1, 0) would otherwise count DOWN), 2 tokens yield 1."""
    from rws_data_ingester_spark.operators.quality import _BIGRAMS_SPARK

    df = spark.createDataFrame(
        [(["a"],), (["a", "b"],), (["a", "b", "a", "b"],)], "toks array<string>"
    ).select(F.expr(_BIGRAMS_SPARK).alias("bg"))
    sizes = [r["bg"] for r in df.collect()]
    assert sizes[0] == []
    assert sizes[1] == ["a b"]
    assert sizes[2] == ["a b", "b a", "a b"]


def test_repetition_signal_ranges(spark):
    from rws_data_ingester_spark.plans import REGISTRY

    rows = REGISTRY["text_repetition"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_token_frac"] <= 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0
        if r["n_tokens"] >= 2:
            assert r["top_bigram_n"] >= 1


def test_quality_classifier_learns_weak_labels(spark):
    """The LR classifier must reproduce its weak supervision signal on
    the training set (sanity: features carry the signal, plumbing is
    wired right) and the per-lang counts must partition the corpus."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.plans import REGISTRY

    d = Catalog(spark, SF_DIR).documents
    rows = REGISTRY["pipeline_quality_classifier"].fn(spark, SF_DIR).collect()
    assert sum(r["n_pass"] + r["n_fail"] for r in rows) == d.count()

    toks = F.split("text", " ")
    sw = F.array(*[F.lit(w) for w in ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")])
    base = d.select(
        toks.alias("toks"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
            / F.size(toks)
            >= 0.05
        )
        .cast("double")
        .alias("label"),
    )
    feats = HashingTF(inputCol="toks", outputCol="features", numFeatures=256).transform(base)
    model = LogisticRegression(
        maxIter=10, regParam=0.01, featuresCol="features", labelCol="label"
    ).fit(feats)
    # score via coefficient literals, NOT model.transform: the transform
    # UDF serializes the model (and its summary's SparkSession) into the
    # task closure — non-serializable once any Observation exists in the
    # session. Same closure-free route as pipeline_quality_classifier.
    from pyspark.ml.functions import vector_to_array

    wlit = F.array(*[F.lit(float(x)) for x in model.coefficients.toArray()])
    margin = F.lit(float(model.intercept)) + F.expr(
        "aggregate(zip_with(fx, wx, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"
    )
    scored = feats.withColumn("fx", vector_to_array("features")).withColumn(
        "wx", wlit
    ).withColumn("prediction", (margin > 0.0).cast("double"))
    acc = scored.filter(F.col("prediction") == F.col("label")).count() / scored.count()
    assert acc >= 0.7, f"classifier should learn its own weak labels, acc={acc}"


def test_fingerprint_keeps_short_docs_distinct(spark, tmp_path):
    """Docs shorter than the 5-char gram width hash their truncated
    actual text (concat_ws skips the NULL zip padding) — 'a', 'ab', 'ha'
    and '' must all get DISTINCT fingerprints, not collapse to the
    constant xxhash64(NULL) seed gram."""
    from rws_data_ingester_spark.plans import REGISTRY

    d = tmp_path / "short_docs"
    spark.createDataFrame(
        [(0, "a", "en", "s", 1), (1, "ab", "en", "s", 2),
         (2, "ha", "en", "s", 2), (3, "", "en", "s", 0),
         (4, "abcde", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r["fingerprint"]
           for r in REGISTRY["text_fingerprint"].fn(spark, str(d)).collect()}
    non_empty = [out[i] for i in (0, 1, 2, 4)]
    assert len(set(non_empty)) == 4, out
    # 'a' vs 'ab': the truncated gram is the actual text, so they differ
    assert out[0] != out[1]


def test_repetition_signals_are_shuffle_free(spark):
    """The sorted run-length top-bigram scan keeps text_repetition at ZERO
    exchanges, and pipeline_quality_filter at exactly one (the final
    (lang, verdict) rollup) — the per-bigram corpus shuffle must not
    reappear."""
    from rws_data_ingester_spark.plans import REGISTRY

    p1 = (
        REGISTRY["text_repetition"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p1.count("Exchange") == 0
    p2 = (
        REGISTRY["pipeline_quality_filter"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p2.count("Exchange") == 1
