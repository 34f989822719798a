"""Property tests for the approximate operators the SQL oracle can't
check: MinHash/LSH candidate generation, SimHash, hyperplane-LSH recall
vs the exact cosine top-k (SURVEY.md §5.2 'oracle-inexpressible ops').
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rws_data_ingester_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
    simhash64,
)
from rws_data_ingester_spark.operators.similarity import cosine_topk
from rws_data_ingester_spark.plans import REGISTRY

from tests.conftest import SF_DIR


def _docs(spark):
    return [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup of 1
        (4, "completely different words about spark distributed data processing engines"),
    ]


def test_minhash_identical_docs_same_signature(spark):
    df = spark.createDataFrame(_docs(spark), "doc_id long, text string")
    sigs = {r["doc_id"]: tuple(r[c] for c in r.asDict() if c != "doc_id")
            for r in minhash_signature(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2], "identical docs must hash identically"
    overlap_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    overlap_14 = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert overlap_13 > overlap_14, "near-dup must agree on more minhashes than unrelated"


def test_lsh_candidates_contain_exact_dups(spark):
    df = spark.createDataFrame(_docs(spark), "doc_id long, text string")
    sigs = minhash_signature(df, "doc_id", "text")
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    assert (1, 2) in pairs, "exact duplicates must be candidates"
    assert (1, 4) not in pairs and (2, 4) not in pairs, "unrelated docs must not bucket together"


def test_simhash_hamming_orders_similarity(spark):
    df = spark.createDataFrame(_docs(spark), "doc_id long, text string")
    sigs = {r["doc_id"]: r["h"] for r in df.select("doc_id", simhash64("text").alias("h")).collect()}
    assert sigs[1] == sigs[2]
    ham_13 = bin((sigs[1] ^ sigs[3]) & (2**64 - 1)).count("1")
    ham_14 = bin((sigs[1] ^ sigs[4]) & (2**64 - 1)).count("1")
    assert ham_13 < ham_14, "near-dup must be closer in Hamming space"


def test_lsh_topk_recall_vs_exact(spark):
    """Banded ANN must recover a solid fraction of the true top-5
    (random 64-d embeddings are a worst case for LSH — true neighbors sit
    at cosine ~0.4, far from the ≥0.9 regime the bands are tuned for).
    The 4×4-bit OR-construction measures 0.40 here (deterministic: seeded
    planes, fixed fixtures) vs ~0.05 for the old single 16-bucket probe;
    assert ≥0.3 to leave margin for fixture regeneration."""
    exact = REGISTRY["simsearch_topk_exact"].fn(spark, SF_DIR)
    approx = REGISTRY["simsearch_topk_lsh"].fn(spark, SF_DIR)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert approx_pairs, "LSH path returned nothing"
    # every approx neighbor must at least be a real corpus member ranked by
    # true cosine (cosine values are exact within the bucket)
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.3, f"banded probe recall regressed: {recall}"


def test_lsh_candidate_fraction_shrinks_with_band_bits(spark):
    """The scale knob the probe's docstring promises: at fixed signature
    width, widening each band (more bits, fewer bands) must cut the
    candidate fraction geometrically — that's what makes the probe
    tunable per corpus size instead of a fixed 16-bucket table."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.operators.similarity import (
        banded_signature,
        hyperplane_signature,
    )

    e = Catalog(spark, SF_DIR).embeddings
    n = e.count()
    sigs = hyperplane_signature(e.select("vec_id", "embedding"))
    fracs = []
    for band_bits, n_bands in ((2, 8), (4, 4), (8, 2)):
        b = banded_signature(sigs, n_bands=n_bands, band_bits=band_bits)
        qb = b.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), "band_id", "band_val"
        )
        cands = (
            qb.join(b.withColumnRenamed("vec_id", "nid"), ["band_id", "band_val"])
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid")
            .distinct()
            .count()
        )
        fracs.append(cands / (10 * n))
    assert fracs[0] > fracs[1] > fracs[2], f"no shrink: {fracs}"
    assert fracs[2] < 0.05, f"widest bands still scan {fracs[2]:.1%} of corpus"


def test_cosine_topk_self_similarity_excluded(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = cosine_topk(e.filter(F.col("vec_id") == 0), e, k=3).collect()
    assert len(out) == 3
    assert all(r["neighbor_id"] != 0 for r in out)
    sims = [r["cosine_sim"] for r in sorted(out, key=lambda r: r["rank"])]
    assert sims == sorted(sims, reverse=True)


def test_multimodal_feature_shape(spark):
    from rws_data_ingester_spark.operators.multimodal import (
        attach_payload,
        decode_stub_features,
        extract_features,
    )
    import pytest as _pytest
    from rws_data_ingester_spark.operators.multimodal import decode_image

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    feats = extract_features(attach_payload(d)).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # normalized histogram
        assert r["byte_len"] > 0
    assert decode_stub_features(b"") == [0.0] * 8
    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_ivf_topk_recall_vs_exact(spark):
    """IVF (seeded k-means, nprobe=4/16) must recover a solid fraction of
    the exact top-5 (measured 0.64 on this fixture; the floor asserts
    'plumbing correct + recall not degenerate', not production recall)."""
    exact = REGISTRY["simsearch_topk_exact"].fn(spark, SF_DIR)
    approx = REGISTRY["simsearch_topk_ivf"].fn(spark, SF_DIR)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.3, f"degenerate IVF recall {recall}"


def test_numpy_topk_identical_to_catalyst_topk(spark):
    """The BLAS-matmul path must be row-identical to the Catalyst path
    (same float64 math, same rounding, same tie-break)."""
    a = REGISTRY["simsearch_topk_exact"].fn(spark, SF_DIR)
    b = REGISTRY["simsearch_topk_exact_np"].fn(spark, SF_DIR)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_resize_preserves_feature_mass(spark):
    """Rebinning 8→4 must keep each doc's histogram mass and halve bins."""
    from pyspark.sql import functions as F

    from rws_data_ingester_spark.operators.multimodal import (
        attach_payload,
        extract_features,
        resize_features,
    )
    from rws_data_ingester_spark.catalog import Catalog

    d = Catalog(spark, SF_DIR).documents.limit(50)
    feats = extract_features(attach_payload(d))
    mass = F.expr("aggregate(features, cast(0.0 as double), (a, x) -> a + x)")
    before = {r["doc_id"]: r["m"] for r in feats.select("doc_id", F.round(mass, 6).alias("m")).collect()}
    after_df = resize_features(feats, 2).select(
        "doc_id", F.round(mass, 6).alias("m"), F.size("features").alias("n")
    )
    for r in after_df.collect():
        assert r["n"] == 4
        assert abs(r["m"] - before[r["doc_id"]]) < 1e-6


def test_cosine_zero_vector_is_null_cross_engine(spark, tmp_path):
    """An all-zero embedding has no defined cosine: Spark's guarded
    divide and DuckDB's nullif must both yield NULL (not inf/NaN/0), on
    the Catalyst path and the numpy path alike — and the NULL must sort
    last so the zero vector never enters anyone's top-k."""
    import duckdb
    import numpy as np

    from rws_data_ingester_spark.operators.similarity import cosine_topk, cosine_topk_np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)], "a") for i in range(6)]
    rows.append((6, [0.0] * 8, "a"))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    emb = spark.read.parquet(f"{tmp_path}/embeddings.parquet")

    for fn in (cosine_topk, cosine_topk_np):
        out = fn(emb.filter(F.col("vec_id").isin(0, 6)), emb, k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        # zero vector never appears as a neighbor of a real query
        assert all(r["neighbor_id"] != 6 for r in by_q[0]), (fn.__name__, by_q[0])
        # the zero query's sims are all NULL (cosine undefined)
        assert all(r["cosine_sim"] is None for r in by_q[6]), (fn.__name__, by_q[6])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    drows = con.execute(
        """
        SELECT list_dot_product(a.embedding, b.embedding)
               / nullif(sqrt(list_dot_product(a.embedding, a.embedding))
                        * sqrt(list_dot_product(b.embedding, b.embedding)), 0) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id = 6 AND b.vec_id = 0
        """
    ).fetchall()
    assert drows[0][0] is None


def test_banded_hyperplane_signature_matches_packed_path(spark):
    """The band-first construction (no 62-plane cap) must produce exactly
    the (vec_id, band_id, band_val) rows the packed-long path does for the
    same seed and a ≤62-plane configuration — the two construction paths
    are interchangeable, so recall/cost numbers measured on one apply to
    the other."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.operators.similarity import (
        banded_hyperplane_signature,
        banded_signature,
        hyperplane_signature,
    )

    e = Catalog(spark, SF_DIR).embeddings.select("vec_id", "embedding").limit(200)
    packed = banded_signature(
        hyperplane_signature(e, n_planes=16), n_bands=4, band_bits=4
    )
    direct = banded_hyperplane_signature(e, n_bands=4, band_bits=4)
    a = {tuple(r) for r in packed.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b


def test_banded_hyperplane_signature_beyond_word_width(spark):
    """Signatures wider than one machine word (8 bands × 16 bits = 128
    planes) must construct cleanly — the packed-long path hard-caps at 62
    planes — and wider bands must be MORE selective: the per-band bucket
    collision fraction at 16 bits is strictly below the 4-bit fraction."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.operators.similarity import banded_hyperplane_signature

    e = Catalog(spark, SF_DIR).embeddings.select("vec_id", "embedding")
    n = e.count()

    def cand_frac(n_bands, band_bits):
        b = banded_hyperplane_signature(e, n_bands=n_bands, band_bits=band_bits)
        qb = b.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), "band_id", "band_val"
        )
        cands = (
            qb.join(b.withColumnRenamed("vec_id", "nid"), ["band_id", "band_val"])
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid")
            .distinct()
            .count()
        )
        return cands / (10 * n)

    wide = cand_frac(8, 16)   # 128 planes — impossible on the packed path
    narrow = cand_frac(4, 4)
    assert wide < narrow, (wide, narrow)


def test_minhash_sql_shingles_match_shingles(spark):
    """r10 ADVICE regression pin: minhash_signature's SQL-text gram
    assembly (_shingles_sql) must stay byte-identical to the exported,
    property-tested shingles() Column form on a torture corpus — short
    rows (< k tokens), double spaces, empty string, NULL text, exactly-k
    tokens, long rows. A future edit to either form that diverges fails
    here instead of silently changing MinHash signatures."""
    from rws_data_ingester_spark.operators.dedup import _shingles_sql, shingles

    rows = [
        (0, "one"),
        (1, "two words"),
        (2, "exactly three tokens"),
        (3, "now four whole tokens"),
        (4, "a b c d e f g h i j k"),
        (5, "double  space   runs tokenize as empty strings"),
        (6, ""),
        (7, None),
        (8, "repeat repeat repeat repeat repeat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    both = df.select(
        shingles(F.col("text"), 3).alias("col_form"),
        F.expr(_shingles_sql("text", 3)).alias("sql_form"),
    ).collect()
    for r in both:
        assert r["col_form"] == r["sql_form"], r


def test_sql_double_literal_roundtrips_exactly(spark):
    """r11 regression pin: the SQL-text literal renderer behind the
    one-parse plane/centroid matrices (_sql_double) must parse to the
    EXACT double F.lit would ship — repr() round-trips and Java's
    Double.parseDouble is correctly rounding, so any divergence here
    means signatures/cell ids silently drift from the Column-API form."""
    from rws_data_ingester_spark.operators.similarity import _sql_double

    torture = [
        0.0, -0.0, 1.0, -1.0, 1/3, -1/3, 1e-300, -1e-300, 1e300,
        5e-324, 1.7976931348623157e308, 0.1, 2.225073858507e-308,
        -123456.789e-12, 9007199254740993.0,
    ]
    exprs = []
    for i, x in enumerate(torture):
        # bitwise compare via double→long bits twin columns
        exprs.append(
            F.expr(_sql_double(x)).alias(f"sql_{i}")
        )
        exprs.append(F.lit(float(x)).alias(f"lit_{i}"))
    row = spark.range(1).select(*exprs).collect()[0]
    import struct

    for i, x in enumerate(torture):
        a, b = row[f"sql_{i}"], row[f"lit_{i}"]
        assert struct.pack("d", a) == struct.pack("d", b), (x, a, b)


def test_embedding_dup_ids_spreads_pair_scoring_below_gate(spark, monkeypatch):
    """r11 regression pin: in the broadcast-join regime (input below
    $SPARK_GRAFT_PAIR_SPREAD_MAX_BYTES) the pair-scoring self-join must
    spread its frame by the uniform synthetic key pmod(xxhash64(vec_id),
    64·N) — on few-file corpora the scan is one or few tasks and the
    O(Σ|block|²) scoring otherwise runs on one core (−52..57% noop A/B
    at sf0.1 AND the multi-file sf1 clone; partitioning by the block key
    itself measured WORSE than plain at sf1 on the 16-cell blocking —
    hot cells pile onto few tasks). Above the gate the plain plan must
    come back: the sort-merge join plans its own block-key exchanges
    there and AQE skew-splitting manages hot blocks."""
    from rws_data_ingester_spark.operators.similarity import (
        _as_double,
        embedding_dup_ids,
        scorable,
    )
    from rws_data_ingester_spark.catalog import Catalog

    e = Catalog(spark, SF_DIR).embeddings
    v = scorable(e).select(
        "vec_id", "label", _as_double("embedding").alias("e")
    )
    plan = embedding_dup_ids(v, ["label"])._jdf.queryExecution().toString()
    assert "xxhash64(vec_id" in plan and "REPARTITION_BY_NUM" in plan, plan[:2000]

    monkeypatch.setenv("SPARK_GRAFT_PAIR_SPREAD_MAX_BYTES", "1")
    plan_above = embedding_dup_ids(v, ["label"])._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" not in plan_above, plan_above[:2000]
