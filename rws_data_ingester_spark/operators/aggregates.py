"""Aggregation operators: hash aggs, distinct, rollup/cube/grouping sets,
filtered aggs, statistics, argmin/argmax, ordered string/array collection.

Reference ancestry (SURVEY.md §2.4): the reference's only aggregations are
string/list accumulation — ``"\\n".join(paragraphs)`` and message-line
collection (src/rotterdam_swimming_advice.py:79-80,111-115,188-190). Those
become ``collect_list`` + ``concat_ws`` here (order pinned by sorting, per
the oracle rules). Everything numeric is [EXT].

Scale notes: every groupBy below aggregates with map-side partial
aggregation (Spark's HashAggregate partial→final), so the shuffle carries
one row per (partition × group), not per input row. Grouping keys are
low-cardinality; no skew handling needed. For high-cardinality keys at
100 TB, AQE coalescing + the same plan still hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query


@query(
    "agg_basic",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)::BIGINT AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        pround(F.sum("l_quantity"), 2).alias("sum_qty"),
        pround(F.avg("l_extendedprice"), 4).alias("avg_price"),
        pround(F.min("l_extendedprice"), 2).alias("min_price"),
        pround(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey)::BIGINT AS n_parts,
           COUNT(DISTINCT l_suppkey)::BIGINT AS n_supps,
           COUNT(*)::BIGINT AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "agg_approx_distinct_bounds",
    oracle="""
    -- The oracle checks the *contract* of approx_count_distinct (default
    -- rsd 5%): the Spark side computes |approx-exact|/exact <= 0.15 as a
    -- boolean; the oracle asserts it must be TRUE for every group.
    SELECT l_returnflag, TRUE AS within_bounds FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx distinct — the 100 TB substitute for exact
    count-distinct (constant memory per group vs a full shuffle of keys)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        (
            F.abs(F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey"))
            / F.countDistinct("l_partkey")
            <= 0.15
        ).alias("within_bounds")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        pround(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*)::BIGINT AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        pround(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*)::BIGINT AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-passthrough path: the engine accepts raw SQL over the registered
    catalog views (Catalyst produces the identical plan either way)."""
    cat = Catalog(spark, sf_dir)
    # Statement-scoped DataFrame args, not registered temp views: a
    # session-global view named `orders` clobbers any user view of that
    # name and races across concurrent Catalogs on different sf_dirs.
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM {orders}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """,
        orders=cat.orders,
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS n_open,
           ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0.0), 2) AS sum_finished,
           ROUND(COALESCE(AVG(o_totalprice) FILTER (WHERE o_totalprice > 100000), 0.0), 4) AS avg_big
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        pround(
            F.coalesce(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), F.lit(0.0)), 2
        ).alias("sum_finished"),
        pround(
            F.coalesce(F.avg(F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))), F.lit(0.0)), 4
        ).alias("avg_big"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(STDDEV_SAMP(c_acctbal) + 1e-8, 4) AS sd_bal,
           ROUND(VAR_SAMP(c_acctbal) + 1e-6, 4) AS var_bal,
           ROUND(MEDIAN(c_acctbal) + 1e-8, 4) AS med_bal,
           ROUND(QUANTILE_CONT(c_acctbal, 0.9) + 1e-8, 4) AS p90_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics (percentile/median) require a per-group sort;
    at 100 TB prefer percentile_approx (see agg_approx_percentile).
    + 1e-8 on both sides: stddev/var are co-moment streams (and the
    interpolated quantiles small expression chains) whose merge/evaluation
    order differs ACROSS engines — the two true doubles sit ulps apart and
    can straddle a scale-4 rounding boundary (the agg_corr_covar class,
    fuzz seed 5008)."""
    c = Catalog(spark, sf_dir).customer
    return c.groupBy("c_mktsegment").agg(
        pround(F.stddev_samp("c_acctbal") + 1e-8, 4).alias("sd_bal"),
        pround(F.var_samp("c_acctbal") + 1e-6, 4).alias("var_bal"),
        pround(F.median("c_acctbal") + 1e-8, 4).alias("med_bal"),
        pround(F.percentile("c_acctbal", 0.9) + 1e-8, 4).alias("p90_bal"),
    )


@query(
    "agg_approx_percentile_bounds",
    oracle="""
    -- Contract check for percentile_approx: approx p50 must land within
    -- the exact p40..p60 envelope per group (TRUE for every group).
    SELECT l_returnflag, TRUE AS within_bounds FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The envelope claim only holds for groups large enough that the
    interpolated p40..p60 band contains an actual element: approx_percentile
    returns a group MEMBER, so a 4-row group whose exact p40/p60 interpolate
    between elements can legitimately exclude it. The contract is asserted
    for groups with >= 30 non-null values and is vacuous (TRUE) below that —
    at driver scale (sf >= 0.001) every return flag has thousands of rows."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.when(F.count("l_extendedprice") < 30, F.lit(True))
        .otherwise(
            F.percentile_approx("l_extendedprice", 0.5, 10000).between(
                F.percentile("l_extendedprice", 0.4), F.percentile("l_extendedprice", 0.6)
            )
        )
        .alias("within_bounds")
    )


@query(
    "agg_min_max_by",
    oracle="""
    -- max_by/min_by pick an ARBITRARY row on price ties, so the ordering
    -- key is the (price, orderkey) pair — tie-free, hence deterministic
    -- and engine-agnostic. DuckDB's max_by rejects STRUCT ordering keys,
    -- so the oracle spells the identical semantics as max-of-struct +
    -- field extract (lexicographic struct comparison in both engines);
    -- the CASE keeps SQL's skip-NULL-ordering max_by contract.
    SELECT o_custkey,
           (MAX(CASE WHEN o_totalprice IS NOT NULL
                     THEN {'v': o_totalprice, 'k': o_orderkey} END)).k::BIGINT
             AS biggest_order,
           (MIN(CASE WHEN o_totalprice IS NOT NULL
                     THEN {'v': o_totalprice, 'k': o_orderkey} END)).k::BIGINT
             AS smallest_order,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by with a deterministic tie-break: the ordering key is
    struct(o_totalprice, o_orderkey) — unique, so ties on price resolve
    to the larger (max) / smaller (min) orderkey on every engine and
    every partition order. NULL prices are skipped (the when() yields a
    NULL ordering value, which min_by/max_by ignore per SQL semantics)."""
    o = Catalog(spark, sf_dir).orders
    ordk = F.when(
        F.col("o_totalprice").isNotNull(),
        F.struct(F.col("o_totalprice").alias("v"), F.col("o_orderkey").alias("k")),
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordk).alias("biggest_order"),
        F.min_by("o_orderkey", ordk).alias("smallest_order"),
        pround(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "agg_string_collect",
    oracle="""
    SELECT n_name AS nation,
           STRING_AGG(c_name, '|' ORDER BY c_name) AS customers,
           COUNT(*)::BIGINT AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's '\\n'.join accumulation (SURVEY §2.4 [REF]) as a
    distributed op: collect_list is unordered across partitions, so the
    order is pinned by array_sort before joining — exactly the rule the
    oracle contract demands for order-sensitive aggregates."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("customers"),
            F.count("*").alias("n_cust"),
        )
    )


@query(
    "agg_collect_set",
    oracle="""
    SELECT user_id,
           STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen,
           COUNT(DISTINCT event_type)::BIGINT AS n_types
    FROM events GROUP BY user_id
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_seen"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice) + 1e-8, 4) + 0.0       AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice) + 1e-6, 2) + 0.0 AS qty_price_covar,
           ROUND(COVAR_POP(l_discount, l_tax) + 1e-10, 6) + 0.0           AS disc_tax_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`+ 0.0` on both sides normalizes IEEE negative zero — ROUND can
    yield -0.0 in one engine and +0.0 in the other, which hash-differ.
    The scale-proportional nudges (1e-8 @ 4, 1e-6 @ 2, 1e-10 @ 6 — the
    q17/q22 idiom) exist because CORR/COVAR are co-moment streams whose
    merge order legitimately differs ACROSS engines: the two true values
    sit ulps apart, and when they straddle a rounding boundary even
    bit-identical rounding diverges by a unit of the target scale (fuzz
    seed 5008 landed COVAR_POP a hair either side of x.0078375)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        (pround(F.corr("l_quantity", "l_extendedprice") + 1e-8, 4) + 0.0).alias("qty_price_corr"),
        (pround(F.covar_samp("l_quantity", "l_extendedprice") + 1e-6, 2) + 0.0).alias(
            "qty_price_covar"
        ),
        (pround(F.covar_pop("l_discount", "l_tax") + 1e-10, 6) + 0.0).alias("disc_tax_covar"),
    )


@query(
    "agg_bool",
    oracle="""
    SELECT o_orderpriority,
           BOOL_AND(o_totalprice > 1000)   AS all_over_1k,
           BOOL_OR(o_totalprice > 300000)  AS any_over_300k,
           BOOL_AND(o_orderstatus != 'X')  AS none_x
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 300000).alias("any_over_300k"),
        F.bool_and(F.col("o_orderstatus") != "X").alias("none_x"),
    )


@query(
    "agg_share_of_total",
    oracle="""
    WITH per_nation AS (
      SELECT n_name AS nation, SUM(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT nation,
           ROUND(rev, 2) AS revenue,
           ROUND(rev / nullif(SUM(rev) OVER (), 0), 6) AS share
    FROM per_nation
    """,
)
def agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total per nation. The global total is computed by a
    second aggregation over the *already-reduced* per-nation table (25
    rows) and cross-joined back — NOT via an unpartitioned window over the
    fact table, which would funnel every row through one task at scale.
    The oracle uses SUM() OVER () because its input is the tiny per-nation
    relation, where that's equivalent."""
    cat = Catalog(spark, sf_dir)
    per_nation = (
        cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    total = per_nation.agg(F.sum("rev").alias("total"))
    return per_nation.crossJoin(F.broadcast(total)).select(
        "nation",
        pround("rev", 2).alias("revenue"),
        # nullif: revenues can cancel to a zero total (ANSI divide errors,
        # DuckDB emits inf) — NULL share on both engines
        pround(F.col("rev") / F.nullif(F.col("total"), F.lit(0.0)), 6).alias("share"),
    )


@query("agg_freq_items", oracle=None)  # approx sketch → rows-only
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate frequent items (Karp-Papadimitriou-Shenker sketch via
    df.stat.freqItems) over event types — constant memory per partition,
    one pass; the 100 TB answer when exact top-k heavy hitters would need
    a full shuffle. Output is the sorted candidate set."""
    ev = Catalog(spark, sf_dir).events
    freq = ev.stat.freqItems(["event_type"], support=0.1)
    return freq.select(
        F.explode(F.sort_array(F.col("event_type_freqItems"))).alias("frequent_event_type")
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus)::BIGINT  AS g_status,
           GROUPING(o_orderpriority)::BIGINT AS g_priority,
           COUNT(*)::BIGINT AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() flags disambiguate real NULL keys from rollup/cube
    subtotal rows — without them a cube over a nullable key is unreadable."""
    o = Catalog(spark, sf_dir).orders
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count("*").alias("n_orders"),
    ).select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n_orders")


@query(
    "agg_histogram",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(least(o_totalprice, 599999.99) / 25000.0) AS BIGINT)
               AS bucket
      FROM orders
    )
    SELECT bucket,
           ROUND(CAST(bucket AS DOUBLE) * 25000.0, 2) AS bucket_lo,
           ROUND(CAST(bucket + 1 AS DOUBLE) * 25000.0, 2) AS bucket_hi,
           COUNT(*)::BIGINT AS n_orders
    FROM b GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (24 x 25k buckets, top bucket
    clamped). Bucket arithmetic is explicit floor(x / width) rather than
    width_bucket() so both engines run the identical single IEEE divide —
    a pure map-side projection; the shuffle carries one row per bucket.
    The streaming/approx sibling is agg_approx_percentile_bounds."""
    o = Catalog(spark, sf_dir).orders
    bucket = F.floor(F.least(F.col("o_totalprice"), F.lit(599999.99)) / 25000.0).cast(
        "long"
    )
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "bucket",
            pround(F.col("bucket") * 25000.0, 2).alias("bucket_lo"),
            pround((F.col("bucket") + 1) * 25000.0, 2).alias("bucket_hi"),
            "n_orders",
        )
    )


@query("agg_hll_sketch_merge", oracle=None)  # sketch binary is engine-specific → rows-only
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg): build ONE sketch per day, then union
    the daily sketches and estimate total distinct users — the
    incremental-rollup pattern that replaces re-scanning raw history for
    every distinct-count refresh. At 100 TB the daily sketches are a few
    KB each and live in the rollup table; a month-to-date distinct is a
    30-sketch union, not a 3 TB shuffle. approx_count_distinct can't do
    this (its partials aren't exposed); sketch columns are. Output pins
    the estimate next to the exact count; the test asserts <5% error
    and that the union of daily sketches equals sketching the whole
    stream directly."""
    ev = Catalog(spark, sf_dir).events
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_daily"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct_users"),
        F.count("*").alias("n_daily_sketches"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct_users"))
    return merged.crossJoin(exact).select(
        "est_distinct_users", "exact_distinct_users", "n_daily_sketches"
    )
