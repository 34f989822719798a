"""Physical-plan shape tests: the scale claims in the operator docstrings
are asserted against .explain output, not taken on faith (the prompt's
rule: iterate until it's the plan you'd want, not the first that passed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rws_data_ingester_spark.operators.scale import bucketize, salted_join
from rws_data_ingester_spark.plans import REGISTRY

from tests.conftest import SF_DIR, rows_to_multiset


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushes_filter_into_scan(spark):
    plan = _formatted(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_prunes_columns(spark):
    """The scan must read only the 7 referenced columns, not all 11."""
    plan = _formatted(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema and "l_discount" in read_schema


def test_star_join_is_all_broadcast(spark):
    plan = _plan(REGISTRY["join_broadcast_star"].fn(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_global_topk_uses_take_ordered(spark):
    plan = _plan(REGISTRY["topk_lineitems"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_topk_per_group_has_window_group_limit(spark):
    plan = _plan(REGISTRY["window_topk_per_group"].fn(spark, SF_DIR))
    assert "WindowGroupLimit" in plan


def test_range_join_broadcasts_band_table(spark):
    plan = _plan(REGISTRY["join_range_bands"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_agg_has_partial_final_phases(spark):
    plan = _plan(REGISTRY["agg_basic"].fn(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_salted_join_matches_plain_join(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    salted = salted_join(orders, customer, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_custkey"
    )
    as_ms = lambda df: rows_to_multiset(df.columns, [tuple(r) for r in df.collect()])  # noqa: E731
    assert as_ms(plain) == as_ms(salted)


def test_bucketed_join_skips_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    bo = bucketize(orders, "orders_b", "o_orderkey", 4)
    bl = bucketize(lineitem, "lineitem_b", "l_orderkey", 4)
    # broadcast would bypass bucketing on tiny data — force SMJ to expose it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy("o_orderkey").count()
        plan = _plan(joined)
        pre_agg = plan.split("HashAggregate")[-1]  # below the join
        assert "Exchange" not in pre_agg.split("SortMergeJoin")[-1], (
            "bucketed join must not re-shuffle either side"
        )
        n = joined.count()
        assert n == orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)\
            .groupBy("o_orderkey").count().count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_sink_scan_prunes_partitions(spark):
    plan = _formatted(REGISTRY["sink_partitioned_pruning"].fn(spark, SF_DIR))
    part_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_orderpriority" in part_line, "filter must prune at partition level"
    # pruned at directory level → no rowgroup-level pushed filter needed on it
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_totalprice" in read_schema and "o_clerk" not in read_schema


def test_observed_metrics_collected_during_action(spark):
    """Observation metrics arrive with the action itself — no second scan."""
    from rws_data_ingester_spark.operators.scale import observed

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df, obs = observed(
        orders, "ingest", rows=F.count(F.lit(1)), max_price=F.max("o_totalprice")
    )
    out = df.filter(F.col("o_totalprice") > 0).count()
    assert obs.get["rows"] == orders.count()
    assert obs.get["max_price"] > 0
    assert out > 0


def test_aqe_coalesces_shuffle_partitions_at_runtime(spark):
    """AQE evidence: with 32 shuffle partitions configured but tiny data,
    the final adaptive plan must coalesce the exchange (AQEShuffleRead) —
    the mechanism that lets one config serve sf0.001 and 100 TB."""
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        df = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .groupBy("o_orderpriority")
            .count()
        )
        df.collect()  # materialize so AQE finalizes the plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead coalesced" in plan, plan[:500]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling actually fires: build a join where one key
    holds ~95% of the rows, tighten the skew thresholds so the toy data
    qualifies, execute, and assert the final adaptive plan marks the
    sort-merge join as skew-handled. This is the runtime complement to
    salted_join: moderate skew is the optimizer's job, salting is for
    the pathological tail."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pad"),
        )
        small = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = big.join(small.hint("merge"), "k")
        # collect() (not count()) so THIS DataFrame's adaptive plan runs
        # to isFinalPlan=true — count() executes a different plan.
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_minhash_candidates_reuses_banded_exchange(spark):
    """The LSH self-join must consume ONE shuffle of the banded
    signatures (ReusedExchange) — without it each join side recomputes
    the whole signature pipeline. Pins the round-2 rewrite."""
    from rws_data_ingester_spark.plans.registry import REGISTRY
    from tests.conftest import SF_DIR

    df = REGISTRY["dedup_minhash_candidates"].fn(spark, SF_DIR)
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final
    # and the signature stage itself must not shuffle per (doc, shingle):
    # the only non-reused exchanges are the band repartition and the
    # final distinct.
    assert final.count("+- Exchange ") <= 2, final[:1500]


def test_q9_broadcasts_all_dims(spark):
    """Q9 shape: part/supplier/nation broadcast — the only shuffle join is
    the fact-fact orders⋈lineitem."""
    plan = _plan(REGISTRY["q9_product_profit"].fn(spark, SF_DIR))
    # ≥3: the three dims always broadcast; at fixture scale AQE may also
    # broadcast the orders side of the fact-fact join (legal locally, the
    # hinted dims are the scale-relevant invariant).
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_q16_blocklist_is_broadcast_anti_join(spark):
    plan = _plan(REGISTRY["q16_supplier_part_count"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan


def test_q20_semi_join_chain_is_broadcast(spark):
    """Q20 shape: both IN subqueries decorrelate to broadcast left-semi
    joins — ids flow, no fact payload shuffles."""
    plan = _plan(REGISTRY["q20_excess_suppliers"].fn(spark, SF_DIR))
    assert plan.count("LeftSemi") == 2


def test_q11_threshold_is_broadcast_not_collected(spark):
    """Q11 shape: the scalar total attaches via broadcast nested-loop
    crossJoin of a one-row aggregate — no driver-side collect."""
    plan = _plan(REGISTRY["q11_important_stock"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan


def test_interval_join_is_equi_not_nested_loop(spark):
    """The bucketed interval join must compile to an equi-join on the
    bucket (shuffle-hash), not a BroadcastNestedLoopJoin theta join."""
    plan = _plan(REGISTRY["join_interval_bucketed"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_incremental_merge_is_single_outer_join(spark):
    """MERGE compiles to exactly one full-outer join on the key — no
    rewrite-everything union-of-anti-joins shape."""
    plan = _plan(REGISTRY["pipeline_incremental_merge"].fn(spark, SF_DIR))
    assert plan.count("FullOuter") == 1


def test_quantize_int8_is_shuffle_free(spark):
    """Quantization is a map-side codec: the plan must be scan→project
    with no Exchange and no Python evaluation."""
    plan = _plan(REGISTRY["embedding_quantize_int8"].fn(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_paragraph_dedup_shuffles_twice_on_keys_not_bodies(spark):
    """One shuffle keyed on the chunk sha256 (keep-first window), one on
    doc_id (reassembly agg) — and the window partition key is the digest,
    so duplicate detection never compares full texts."""
    plan = _plan(REGISTRY["dedup_paragraphs"].fn(spark, SF_DIR))
    assert plan.count("Exchange") == 2
    assert "sha2" in plan


def test_runtime_bloom_filter_injects_on_unbroadcastable_join(spark):
    """At 100 TB a filtered dim exceeds the broadcast threshold and the
    fact scan exceeds the 10 GB application-side threshold, so Catalyst's
    InjectRuntimeFilter semi-reduces the fact with a bloom filter built
    from the filtered creation side BEFORE the shuffle. Locally both
    sizes sit under the thresholds (the rule correctly skips: a
    broadcastable dim makes bloom pointless), so emulate the production
    size ratios by lowering the thresholds, then assert the plan carries
    the bloom build + might_contain probe."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        j = (
            l.join(o, l["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = _plan(j)
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_zorder_layout_prunes_both_dimensions(spark):
    """Linear (date-sorted) layout: skips files on the sort key, zero
    skipping on partkey. Z-order layout: skips on BOTH dimensions. The
    skip counts live in the unregistered detail audit (file split points
    are byte/scale-dependent); the registered query hashes the
    layout-independent conservation facts against its DuckDB oracle."""
    from rws_data_ingester_spark.operators.layout import zorder_skip_audit

    rows = {
        (r["layout"], r["dim"]): r
        for r in zorder_skip_audit(spark, SF_DIR).collect()
    }
    lin_pk = rows[("linear", "l_partkey")]
    zo_pk = rows[("zorder", "l_partkey")]
    zo_day = rows[("zorder", "ship_day")]
    assert lin_pk["n_candidate_files"] == lin_pk["n_files"]  # no partkey skipping
    assert zo_pk["n_candidate_files"] < lin_pk["n_candidate_files"]
    assert zo_day["n_candidate_files"] < zo_day["n_files"]


def test_zorder_write_preserves_rows(spark):
    from rws_data_ingester_spark.operators.layout import write_zordered
    import tempfile

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_linenumber")
        .limit(5000)
    )
    out = tempfile.mkdtemp(prefix="rws_zorder_eq_")
    write_zordered(li, out, "l_orderkey", "l_partkey")
    back = spark.read.parquet(out).select(*li.columns)
    assert rows_to_multiset(li.columns, back.collect()) == rows_to_multiset(
        li.columns, li.collect()
    )


def test_zorder_write_rejects_non_power_of_two_fan_out(spark):
    """span = 65536 // n_files only tiles the z-key space exactly for
    power-of-two fan-outs; a non-power-of-two lets floor(zkey/span)
    reach n_files — one extra _zbucket directory beyond the requested
    count (round-8 ADVICE). The public signature now refuses it up
    front instead of silently over-fanning."""
    import pytest as _pytest

    from rws_data_ingester_spark.operators.layout import write_zordered

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    for bad in (3, 12, 100, 0, -8):
        with _pytest.raises(ValueError, match="power of two"):
            write_zordered(li, "/tmp/never_written", "l_orderkey", "l_partkey", n_files=bad)


def test_lateral_topn_compiles_to_window_group_limit(spark):
    """The correlated LATERAL ... ORDER BY ... LIMIT must decorrelate to
    the WindowGroupLimit shape (per-group partial limits before the
    shuffle), not a per-outer-row re-scan of orders."""
    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.plans import REGISTRY

    df = REGISTRY["join_lateral_topn"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_lateral_topn_matches_window_formulation(spark):
    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.plans import REGISTRY
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    cat = Catalog(spark, SF_DIR)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    expected = sorted(
        tuple(r)
        for r in cat.orders.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 2) & (F.col("o_custkey") < 100))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in REGISTRY["join_lateral_topn"].fn(spark, SF_DIR).collect()
    )
    assert got == expected


def test_null_safe_join_keeps_nulled_region(spark):
    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.plans import REGISTRY

    rows = REGISTRY["join_null_safe"].fn(spark, SF_DIR).collect()
    assert sum(r["n_nations"] for r in rows) == 25  # no nation dropped
    assert len(rows) == 5  # all five regions present, incl. the nulled one


def test_cached_reuse_reads_in_memory_scan(spark):
    """All three consumers of the cached projection must read the
    InMemoryTableScan, not re-run the parquet scan+filter."""
    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.plans import REGISTRY

    df = REGISTRY["pipeline_cached_reuse"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3


def test_cached_reuse_unpersists_previous_invocation(spark):
    """Repeated invocations (driver sweep, tests) must not accumulate
    InMemoryRelations: each call unpersists the previous call's cache, so
    at most one is ever live (ADVICE round 2)."""
    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.operators import scale
    from rws_data_ingester_spark.plans import REGISTRY

    REGISTRY["pipeline_cached_reuse"].fn(spark, SF_DIR).collect()
    first = scale._LAST_CACHED_REUSE
    assert first is not None and first.is_cached
    REGISTRY["pipeline_cached_reuse"].fn(spark, SF_DIR).collect()
    assert scale._LAST_CACHED_REUSE is not first
    assert not first.is_cached, "previous invocation's cache still live"
    assert scale._LAST_CACHED_REUSE.is_cached


def test_salted_join_rejects_outer_modes(spark):
    """right/full outer would replicate unmatched small-side rows once
    per salt shard — salted_join must refuse rather than silently return
    a wrong result."""
    import pytest

    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.catalog import Catalog

    cat = Catalog(spark, SF_DIR)
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(cat.orders, cat.customer, "o_custkey", "c_custkey", how=how)


def test_pround_bind_projection_survives_optimization(spark):
    """The expensive-operand sites bind the raw value in an inner
    projection and round the bound column — pround references its operand
    4x, so if CollapseProject ever starts inlining a non-cheap
    multi-referenced alias (a Spark-upgrade behavior change), the HOF
    cosine chain would silently re-evaluate per reference (measured 2.0 s
    vs 0.73 s at sf0.1). Results would stay IDENTICAL, so only this plan
    assertion can catch the regression: the optimized plan must still
    carry the bound intermediate column."""
    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.plans import REGISTRY

    df = REGISTRY["simsearch_topk_exact"].fn(spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_raw_sim" in optimized, (
        "the raw-cosine bind was inlined away — pround's operand will "
        "re-evaluate 4x; restore the two-phase projection"
    )
    # and exactly one cosine fold in the plan: the aggregate() chain for
    # the dot product must appear once, not once per pround reference
    assert optimized.count("zip_with(qe") <= 2, (
        "cosine dot chain duplicated in the optimized plan"
    )


# --- round-5 plan pins for the r4 bench drifters -------------------------
# BENCH_r04 read these four >=1.2x their r3 medians; every solo control run
# said "box band, not plans". These pins capture the CURRENT (correct)
# physical shape so a future real regression is a test failure instead of a
# bench forensic (VERDICT r4, task 3).


def test_text_quality_scores_plan_is_shuffle_free_narrow_scan(spark):
    """One codegen'd scan->project pipeline: no Exchange, no Window, a
    single FileScan reading only (doc_id, text). Any shuffle or wider
    ReadSchema here is a real plan regression, not band noise."""
    df = REGISTRY["text_quality_scores"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange" not in plan and "Window" not in plan
    assert plan.count("FileScan") == 1
    read_schema = next(l for l in _formatted(df).splitlines() if "ReadSchema" in l)
    assert "text" in read_schema and "n_chars" not in read_schema


def test_pipeline_quality_filter_plan_is_one_shuffle_agg(spark):
    """Verdict cascade folds into the scan projection; exactly one
    Exchange (partial->final count), two HashAggregates, no Window, and a
    3-column ReadSchema (text, lang, n_chars)."""
    df = REGISTRY["pipeline_quality_filter"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") == 2
    assert "Window" not in plan and plan.count("FileScan") == 1
    read_schema = next(l for l in _formatted(df).splitlines() if "ReadSchema" in l)
    assert "doc_id" not in read_schema  # column pruning held


def test_window_running_plan_is_single_window_single_shuffle(spark):
    """All three framed aggregates (running sum, moving avg, count) share
    ONE Window node over ONE Exchange on user_id — the r4 WindowExec
    duplicate-expression fix, pinned. A second Window/Exchange means the
    window outputs stopped sharing their spec."""
    plan = _plan(REGISTRY["window_running"].fn(spark, SF_DIR))
    assert plan.count("Window [") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    # the single Window node carries all three expressions
    window_line = next(l for l in plan.splitlines() if "Window [" in l)
    assert (
        "sum(value" in window_line
        and "avg(value" in window_line
        and "count(1)" in window_line
    )


def test_simsearch_np_plan_has_partial_group_limit_and_pushed_filter(spark):
    """BLAS twin: one MapInPandas scorer over a pruned scan with the
    IsNotNull pushed to parquet, then map-side WindowGroupLimit (Partial)
    before the single Exchange and the Final limit — top-k never shuffles
    more than k rows per query per partition."""
    df = REGISTRY["simsearch_topk_exact_np"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("MapInPandas") == 1
    assert "WindowGroupLimit" in plan
    partial_before_exchange = plan.index("Exchange hashpartitioning") < plan.rindex(
        "WindowGroupLimit"
    )
    assert partial_before_exchange, "map-side Partial WindowGroupLimit missing"
    assert plan.count("Exchange hashpartitioning") == 1
    assert "PushedFilters: [IsNotNull(embedding)]" in _formatted(df)


def test_multiset_fingerprint_detects_loss_dup_and_mutation(spark):
    """The z-order audit's fingerprint (count, decimal-sum, xor of the
    whole-row hash) replaced the two corpus-wide exceptAll passes
    (profiled alpha 1.58 / 76% of the query at sf10). Sensitivity pin:
    identical multisets agree regardless of order/partitioning; a
    dropped row, a duplicated row, and a single mutated value each
    change the fingerprint."""
    from rws_data_ingester_spark.operators.layout import _multiset_fingerprint

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_linenumber")
        .limit(2000)
        .cache()
    )
    try:
        base = _multiset_fingerprint(li)
        # order/partitioning-independent
        assert _multiset_fingerprint(li.orderBy("l_partkey").repartition(7)) == base
        # loss
        one = li.limit(1)
        assert _multiset_fingerprint(li.exceptAll(one)) != base
        # duplication
        assert _multiset_fingerprint(li.unionAll(one)) != base
        # single-value mutation
        from pyspark.sql import functions as F

        mutated = li.withColumn(
            "l_partkey",
            F.when(F.monotonically_increasing_id() == 0, F.col("l_partkey") + 1)
            .otherwise(F.col("l_partkey")),
        )
        assert _multiset_fingerprint(mutated) != base
    finally:
        li.unpersist()
