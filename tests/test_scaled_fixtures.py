"""The scaled-clone generator behind the scaling curves (VERDICT r6,
task 2) must preserve exactly the invariants its perf claims rest on:
foreign keys hit within a clone and never across, per-row text cost
drivers survive the per-clone letter rotation, and the per-clone
embedding shift is orthogonal (within-clone geometry bit-identical).
Exercised at sf0.001 / k=3 into a tmp dir — the real curves run on
sf0.1-derived clones in /tmp, never committed, never used for
correctness oracles."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    from scripts.make_scaled_fixtures import build_scaled_dir

    out = str(tmp_path_factory.mktemp("scaled") / "sf0.003")
    build_scaled_dir(spark, SF_DIR, out, k=3)
    return out


def test_clone_counts_and_fixed_dims(spark, scaled_dir):
    from rws_data_ingester_spark.catalog import TABLES, load_table

    for name in TABLES:
        src_n = load_table(spark, SF_DIR, name).count()
        out_n = load_table(spark, scaled_dir, name).count()
        expect = src_n if name in ("region", "nation") else 3 * src_n
        assert out_n == expect, (name, src_n, out_n)


def test_foreign_keys_hit_within_clone_never_across(spark, scaled_dir):
    from rws_data_ingester_spark.catalog import load_table

    li = load_table(spark, scaled_dir, "lineitem")
    o = load_table(spark, scaled_dir, "orders")
    c = load_table(spark, scaled_dir, "customer")
    # every scaled lineitem still finds its order (id offsets consistent)
    orphans = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count()
    assert orphans == 0
    # and every order its customer
    assert o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0
    # never across: the join multiplicity matches the per-clone join,
    # i.e. scaled join rows == 3 x source join rows (no key collisions
    # between clones inflating the match count)
    src_li = load_table(spark, SF_DIR, "lineitem")
    src_o = load_table(spark, SF_DIR, "orders")
    src_rows = src_li.join(src_o, src_li.l_orderkey == src_o.o_orderkey).count()
    out_rows = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert out_rows == 3 * src_rows


def test_text_rotation_preserves_cost_drivers_and_decorrelates_clones(
    spark, scaled_dir
):
    from pyspark.sql import functions as F

    from rws_data_ingester_spark.catalog import load_table

    d = load_table(spark, scaled_dir, "documents")
    # rot-i preserves length => the fixture's n_chars contract still holds
    assert d.filter(F.length("text") != F.col("n_chars")).count() == 0
    # token structure preserved: per-base-doc whitespace-token count is
    # identical across clones (the per-row cost driver for text ops)
    tok = d.select(
        (F.col("doc_id") % 1_000_000_000).alias("base"),
        F.size(F.split("text", r"\s+")).alias("n_tok"),
    )
    assert (
        tok.groupBy("base")
        .agg(F.countDistinct("n_tok").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    # clones decorrelate: a clone-1 text differs from its base unless the
    # base has no letters at all
    pairs = (
        d.filter(F.col("doc_id") < 1_000_000_000)
        .select(F.col("doc_id").alias("base"), F.col("text").alias("t0"))
        .join(
            d.filter(
                (F.col("doc_id") >= 1_000_000_000)
                & (F.col("doc_id") < 2_000_000_000)
            ).select(
                (F.col("doc_id") - 1_000_000_000).alias("base"),
                F.col("text").alias("t1"),
            ),
            "base",
        )
    )
    same_despite_letters = pairs.filter(
        (F.col("t0") == F.col("t1"))
        & (F.col("t0").rlike("[A-Za-z]"))
    ).count()
    assert same_despite_letters == 0


def test_embedding_shift_is_orthogonal(spark, scaled_dir):
    """Circular coordinate shift preserves ALL within-clone inner
    products — checked exactly on the driver for a sample of vector
    pairs (floats compare bit-identically: the shift only reorders
    coordinates, multiplication order within the dot product is fixed
    by position)."""
    from rws_data_ingester_spark.catalog import load_table

    # the sf0.001-derived embeddings table is tiny — collect it whole
    rows = load_table(spark, scaled_dir, "embeddings").collect()
    by_id = {r["vec_id"]: r["embedding"] for r in rows}
    base_ids = sorted(i for i in by_id if i < 1_000_000_000)[:5]
    clone = {
        i: by_id.get(i + 1_000_000_000)
        for i in base_ids
        if by_id.get(i + 1_000_000_000) is not None
    }
    checked = 0
    for a in base_ids:
        for b in base_ids:
            if a >= b or a not in clone or b not in clone:
                continue
            dot0 = sum(x * y for x, y in zip(by_id[a], by_id[b]))
            dot1 = sum(x * y for x, y in zip(clone[a], clone[b]))
            assert dot0 == pytest.approx(dot1, rel=1e-6), (a, b)
            checked += 1
    assert checked > 0


def test_embedding_element_type_matches_source_across_clones(spark, scaled_dir):
    """Round-8 ADVICE (medium): the ±1.0 sign literals in the embedding
    shift are Python doubles, so without the explicit cast back the
    clone i>=1 branches widened array<float> → array<double> and the
    k>=2 union coerced the whole column — scaled warehouses stored
    8-byte elements while the k=1 base stored 4-byte, a 2x per-row byte
    skew that biased the embedding-tier scaling exponents on the
    base→first leg. Pin: the scaled table's embedding type equals the
    source's exactly."""
    from rws_data_ingester_spark.catalog import load_table

    src_t = load_table(spark, SF_DIR, "embeddings").schema["embedding"].dataType
    out_t = load_table(spark, scaled_dir, "embeddings").schema["embedding"].dataType
    assert out_t == src_t, (src_t, out_t)


def test_clone_transforms_collision_free_to_k100():
    """Round-8 extension to k=100 (sf10 scale point): the per-clone text
    permutations must be pairwise-distinct derangements for every clone
    index the sweep can use (rotation, the round-7 transform, repeated at
    period 26 — clone 26 carried text identical to clone 0, so at k=100
    each doc had ~3 exact cross-clone twins and the dedup tier's curve
    measured data duplication, not the engine). Same for the signed
    embedding shift: the (shift, sign-pattern) pair must be unique per
    clone (the plain shift repeats at period 64). Pure driver-side, no
    Spark."""
    import random

    from scripts.make_scaled_fixtures import _clone_permutation

    perms = {}
    for i in range(1, 101):
        p = _clone_permutation(i)
        lo = p[:26]
        # derangement over a-z (uppercase half mirrors it by construction)
        assert all(c != o for c, o in zip(lo, "abcdefghijklmnopqrstuvwxyz")), i
        assert sorted(lo) == sorted("abcdefghijklmnopqrstuvwxyz"), i
        perms[i] = p
    assert len(set(perms.values())) == 100, "duplicate clone permutations"
    # deterministic across calls (fixtures must be reproducible)
    assert _clone_permutation(37) == perms[37]

    dim = 64
    sigs = set()
    for i in range(1, 101):
        s = (i * 7) % dim
        signs = tuple(
            random.Random((i << 20) + j).choice((1.0, -1.0)) for j in range(dim)
        )
        sigs.add((s, signs))
    assert len(sigs) == 100, "duplicate (shift, sign-pattern) clone transforms"
