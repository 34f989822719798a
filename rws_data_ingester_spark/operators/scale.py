"""Scale strategies that aren't single Catalyst knobs (SURVEY.md §4.3):
skew-salted joins and bucketed (pre-shuffled) tables.

AQE already handles moderate skew (spark.sql.adaptive.skewJoin, on in
session.py); ``salted_join`` is the explicit fallback for pathological
keys AQE splitting can't fix (one key >> everything). ``bucketize`` is
the co-location strategy: pay the shuffle once at write time, then every
future equi-join/agg on the bucket key is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big (skewed) side with a random
    shard id, replicate the small side across all shards, join on
    (key, salt). The hot key's rows spread over n_salts reducers instead
    of one. Result is row-identical to the plain join.

    The salt must be deterministic per row for retry-safety — derived from
    a hash of the row, not rand() (a retried task must re-produce
    the same salt or shuffle re-computation corrupts the join).

    ``salt_cols`` (default: all columns) picks which columns feed the
    salt hash — a few high-entropy columns (an event id, a timestamp)
    give the same spread at a fraction of the per-row hash cost on wide
    fact rows. Known limitation of ANY deterministic row-hash salt:
    full-duplicate rows of a hot key (identical across salt_cols) all
    land in ONE salt bucket and are not spread. That trade is deliberate —
    mixing in a nondeterministic ordinal (monotonically_increasing_id)
    would spread duplicates but break retry-stability, corrupting the
    join under task re-execution; dedup-first or add a unique id column
    upstream when duplicate-dominated hot keys are expected (r9 ADVICE).

    Only inner/left/left_semi/left_anti are supported: the small side is
    replicated n_salts times, so right/full outer would emit every
    unmatched small-side row once per shard — not row-identical to the
    plain join. Flip the sides (or dedup unmatched rows) for those.
    """
    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "replicating the small side would duplicate its unmatched rows "
            f"{n_salts}x under right/full outer joins"
        )
    salt_src = salt_cols if salt_cols else big.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    big_salted = big.withColumn("_salt", salt)
    small_replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(
        small_replicated,
        (big_salted[big_key] == small_replicated[small_key])
        & (big_salted["_salt"] == small_replicated["_salt"]),
        how,
    )
    return out.drop("_salt")


def detect_hot_keys(
    big: DataFrame,
    key: str,
    sample_fraction: float = 0.001,
    hot_share: float = 0.05,
    max_hot_keys: int = 1000,
) -> list:
    """Sampled Zipf-head detection: key values holding more than
    ``hot_share`` of a ``sample_fraction`` row sample. One cheap
    narrow-column sample pass; the result is a driver-side list bounded
    by ``max_hot_keys`` (hot keys are by definition few — a thousand
    keys each owning >5% of the data cannot exist). At 100 TB the
    sample is ~rows*fraction per executor with a partial-agg combine,
    never a full shuffle of the key column."""
    # NULL keys are excluded: a NULL can dominate a sample (sparse FK
    # columns) but it is not saltable — the inner equi-join drops it
    # regardless of strategy, so salting it would only add a WHEN branch
    sampled = (
        big.select(key).filter(F.col(key).isNotNull()).sample(
            fraction=sample_fraction, seed=42
        )
    )
    # ONE realization of the sample for both the total and the per-key
    # counts (round-9 ADVICE: two separate actions over the same .sample()
    # can see different rows when the upstream partitioning is unstable —
    # e.g. a repartitioned input — which shifts the hot_share threshold).
    # The grouped frame is cached, materialized once by the total-sum
    # action, and the top-k filter reads that same materialization.
    grouped = sampled.groupBy(key).count().cache()
    try:
        total = grouped.agg(F.sum("count")).first()[0] or 0
        if total == 0:
            return []
        rows = (
            grouped.filter(F.col("count") > hot_share * total)
            .orderBy(F.col("count").desc())
            .limit(max_hot_keys)
            .collect()
        )
    finally:
        grouped.unpersist()
    return [r[key] for r in rows]


def salted_join_adaptive(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    hot_keys: list | None = None,
    sample_fraction: float = 0.001,
    hot_share: float = 0.05,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-targeted salted join: salt ONLY the detected hot keys, plain
    shuffle join for everything else, union the two halves. Result is
    row-identical to the plain join (the two halves partition the big
    side by key membership, and the small side is filtered per half, so
    no row can match in both).

    Why this exists (measured, SKEW_r09.json / SCALE.md §r9-skew): the
    blanket ``salted_join`` replicates the ENTIRE small side n_salts
    times — at the sf10 33%-head measurement that premium (~2.3×)
    exceeded the 1.4–1.5× skew penalty it removed, so blanket salting
    LOST even under heavy skew. The adaptive form replicates the small
    side only for the hot keys (a driver-bounded list, usually 1-10
    rows), so its cold path IS the plain join and its hot path spreads
    each hot key over n_salts reducers. Overhead on uniform data: one
    sampled key-frequency pass (``detect_hot_keys``) plus an IN-filter;
    pass ``hot_keys`` explicitly to skip detection (e.g. known-hot
    tenant ids, or reuse across the pipeline's joins on the same key).

    SINGLE-PASS form: a first cut split the big side into hot/cold
    halves and unioned a plain join with a blanket ``salted_join`` —
    measured at the sf10 33%-head pair that DOUBLE-SCANS the fact table
    (9.2 s skewed vs 3.7 s unsalted), which is disqualifying at 100 TB.
    Instead the salt is CONDITIONAL inside one projection: hot-key rows
    get a deterministic row-hash salt in [0, n_salts), cold rows salt 0;
    the small side explodes its salt range ONLY for hot keys (cold keys
    carry the single salt 0). One scan of the big side, one shuffle on
    (key, salt), no union — the plan is the plain join plus an
    |hot_keys| x n_salts row inflation of the small side.

    Same outer-join restriction as ``salted_join`` (hot small-side rows
    are replicated), the same ``salt_cols`` knob and duplicate-row
    limitation (full-duplicate hot rows share one salt bucket — the
    price of the deterministic retry-stable salt), and the plain-join
    semantics of NULL keys are preserved: ``isin`` yields NULL for a
    NULL key, the WHEN falls through to salt 0, and the equi-join drops
    the NULL key exactly like the unsalted join would."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(
            big, big_key, sample_fraction=sample_fraction, hot_share=hot_share
        )
    if not hot_keys:
        return big.join(small, big[big_key] == small[small_key], "inner")
    salt_src = salt_cols if salt_cols else big.columns
    row_salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    big_salted = big.withColumn(
        "_salt",
        F.when(F.col(big_key).isin(hot_keys), row_salt).otherwise(F.lit(0)),
    )
    small_salted = small.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col(small_key).isin(hot_keys),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    out = big_salted.join(
        small_salted,
        (big_salted[big_key] == small_salted[small_key])
        & (big_salted["_salt"] == small_salted["_salt"]),
        "inner",
    )
    return out.drop("_salt")


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
) -> DataFrame:
    """Write df as a bucketed managed table and return the bucketed scan.

    Joins/aggregations between tables bucketed identically on the join key
    skip the exchange entirely (verify: no Exchange above the scans in
    .explain). This is the 100 TB answer to repeated fact-fact joins on
    the same key.
    """
    spark = df.sparkSession
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def observed(df: DataFrame, name: str, **metrics: F.Column):
    """Attach observable metrics to a DataFrame: ``observed(df, "stage1",
    rows=F.count(F.lit(1)), rev=F.sum("o_totalprice"))`` returns
    (df, Observation). Metrics are computed DURING the next action on the
    plan — zero extra passes over the data, which is the only affordable
    way to get row-count/quality counters out of a 100 TB pipeline stage.
    Read them after the action via ``obs.get``.

    Session-level landmine (Spark 4.1): once ANY Observation exists, the
    session's ObservationManager is live and NOT java-serializable — and
    MLlib model.transform() serializes the fitted model (whose training
    summary pins the SparkSession) into its prediction-UDF closure, so
    every later model.transform in the session throws Task-not-
    serializable. Score models via coefficient literals instead (see
    quality.pipeline_quality_classifier)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    named = [col.alias(alias) for alias, col in metrics.items()]
    return df.observe(obs, *named), obs


# --------------------------------------------------------------------------
# Registered query exercising salted_join end-to-end: the oracle is the
# PLAIN join+aggregate, so the driver verifies the salting is invisible in
# the result — the whole point of the strategy.
# --------------------------------------------------------------------------
from rws_data_ingester_spark.catalog import Catalog  # noqa: E402
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query  # noqa: E402


@query(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through the skew-salted join path.
    orders is the (potentially skewed) big side, customer the replicated
    small side; the salt spreads any hot o_custkey over 8 reducers. The
    oracle is the unsalted SQL join — result identity is the contract."""
    c = Catalog(spark, sf_dir)
    joined = salted_join(
        c.orders,
        c.customer.select("c_custkey", "c_mktsegment"),
        "o_custkey",
        "c_custkey",
        n_salts=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        pround(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "join_salted_adaptive",
    oracle="""
    SELECT c.c_mktsegment,
           o.o_orderpriority,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_orderpriority
    """,
)
def join_salted_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per (segment, priority) through the hot-key-targeted
    adaptive salted join (r9's `salted_join_adaptive`) — the oracle is
    the plain unsalted SQL join, so the driver verifies the conditional
    salting is invisible in the result, exactly like `join_salted_skew`
    does for the blanket form.

    The hot-key list is pinned deterministically to the single most
    frequent o_custkey (tie-broken by key) via one bounded driver
    collect, so the HOT path (conditional row-hash salt + small-side
    explode over n_salts) is exercised at every fixture scale — the
    sampled `detect_hot_keys` would correctly find nothing hot in
    uniform TPC-H data and reduce this to the plain join, which would
    leave the salting branch driver-unproven. `salt_cols` is narrowed to
    the unique o_orderkey: same spread as whole-row hashing at a
    fraction of the per-row cost on a wide fact row (r9 ADVICE)."""
    c = Catalog(spark, sf_dir)
    top = (
        c.orders.groupBy("o_custkey")
        .count()
        .orderBy(F.col("count").desc(), F.col("o_custkey"))
        .first()
    )
    # empty warehouse → no top key; [] falls back to the plain join,
    # which is exactly the oracle's answer on zero rows
    joined = salted_join_adaptive(
        c.orders,
        c.customer.select("c_custkey", "c_mktsegment"),
        "o_custkey",
        "c_custkey",
        n_salts=8,
        hot_keys=[] if top is None else [top["o_custkey"]],
        salt_cols=["o_orderkey"],
    )
    return joined.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        pround(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# pipeline_cached_reuse: previous invocation's cached frame, unpersisted
# on the next call (see the docstring for the lifetime contract).
_LAST_CACHED_REUSE: DataFrame | None = None


@query(
    "pipeline_cached_reuse",
    oracle="""
    WITH open_orders AS (
      SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT 'n_by_priority_rows' AS metric,
           COUNT(DISTINCT o_orderpriority)::DOUBLE AS value FROM open_orders
    UNION ALL
    SELECT 'open_revenue', ROUND(SUM(o_totalprice), 2) FROM open_orders
    UNION ALL
    SELECT 'open_count', COUNT(*)::DOUBLE FROM open_orders
    """,
)
def pipeline_cached_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit mid-pipeline caching: one filtered projection feeds three
    separate aggregates, so without a cache the scan+filter runs three
    times. ``.cache()`` materializes it once (columnar, memory-first) and
    every consumer reads the InMemoryTableScan *(plan-asserted in
    tests/test_scale_plans.py)*. At 100 TB the same call is
    ``persist(MEMORY_AND_DISK)`` and the decision rule is: cache when
    (consumers - 1) x scan cost > materialization cost — here 2 x scan
    for one write. The cached frame is the filtered SUBSET, not the
    fact table.

    Cache lifetime: the returned union is lazy, so unpersisting before
    the caller materializes it would defeat the cache. Instead each
    invocation unpersists the PREVIOUS invocation's cache, bounding the
    executor-memory footprint to one live InMemoryRelation no matter how
    many times the driver sweep / tests call this query; long-lived
    applications should likewise unpersist once the last consumer has
    materialized."""
    global _LAST_CACHED_REUSE
    if _LAST_CACHED_REUSE is not None:
        _LAST_CACHED_REUSE.unpersist()
    o = Catalog(spark, sf_dir).orders
    open_orders = (
        o.filter(F.col("o_orderstatus") == "O")
        .select("o_orderpriority", "o_totalprice")
        .cache()
    )
    _LAST_CACHED_REUSE = open_orders
    a = open_orders.agg(
        F.countDistinct("o_orderpriority").cast("double").alias("value")
    ).select(F.lit("n_by_priority_rows").alias("metric"), "value")
    b = open_orders.agg(
        pround(F.sum("o_totalprice"), 2).alias("value")
    ).select(F.lit("open_revenue").alias("metric"), "value")
    c = open_orders.agg(F.count("*").cast("double").alias("value")).select(
        F.lit("open_count").alias("metric"), "value"
    )
    return a.unionByName(b).unionByName(c)
