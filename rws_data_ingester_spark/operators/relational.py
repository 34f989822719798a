"""Core relational operators: scan→filter→project, joins, sorts, set ops.

All pure DataFrame API — Catalyst owns the physical strategy (broadcast vs
sort-merge join, TakeOrderedAndProject for top-k, pushdown into parquet).
Scale notes are on each operator; the recurring theme: dimension tables get
``F.broadcast`` hints so the 100 TB fact side never shuffles for a join,
and every LIMIT rides behind a unique-key ORDER BY for determinism.

Reference ancestry (SURVEY.md §2.2/§2.3/§2.6/§2.7): the reference's only
relational logic is nested-field projection + substring-contains filter +
first-match limit (src/rotterdam_swimming_advice.py:169-185); everything
else here is [EXT] surface mandated by the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query
from rws_data_ingester_spark.session import local_frame

from rws_data_ingester_spark.functions.timefmt import (  # noqa: F401
    DUCK_TS_FMT,
    TS_FMT,
    ts_str,
)


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (SURVEY.md §7 step 1).
# Exercises scan → pushdown filter → project → hash agg (partial+final) →
# sort in one shot. At 100 TB: single shuffle on a 6-value grouping key,
# map-side partial aggregation collapses almost everything before exchange.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)::BIGINT                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            pround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            pround(F.sum(disc_price), 2).alias("sum_disc_price"),
            pround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            pround(F.avg("l_quantity"), 4).alias("avg_qty"),
            pround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            pround(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Predicates: comparison / boolean / IN / BETWEEN / LIKE / NULL handling.
# All sargable → pushed into the parquet scan (check: PushedFilters in
# .explain("formatted")).
# --------------------------------------------------------------------------
@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS total_price,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_totalprice IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 200000)
        & (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        pround("o_totalprice", 2).alias("total_price"),
        ts_str("o_orderdate").alias("order_date"),
    )


# --------------------------------------------------------------------------
# Joins. Catalyst picks hash vs sort-merge; we hint broadcast for dims.
# --------------------------------------------------------------------------
@query(
    "join_inner_customer_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_spent
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    """,
)
def join_inner_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            pround(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )


@query(
    "join_broadcast_star",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*)::BIGINT AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ broadcast dims — zero shuffle on the fact side.

    At 100 TB the only exchange in this plan is the final small-key agg;
    all three dim joins are broadcast-hash (verify: BroadcastHashJoin ×3
    in .explain). This is THE canonical scale pattern for the star schema.
    """
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey)::BIGINT AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(cat.orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            pround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*)::BIGINT AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*)::BIGINT AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_cust, 0)::BIGINT AS n_cust,
           COALESCE(s.n_supp, 0)::BIGINT AS n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_cust")
    )
    s = cat.supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_supp")
    )
    return (
        c.alias("c")
        .join(s.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full")
        .select(
            F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    big = cat.orders.filter(F.col("o_totalprice") > 150000)
    return cat.customer.join(
        big, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.customer.join(
        cat.orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_theta_self",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_theta_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join (pairs within region). The equi part of the condition
    keeps it a hash join; only the < residual is post-filtered."""
    n = Catalog(spark, sf_dir).nation
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@query(
    "join_range_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('p0', 0.0, 500.0), ('p1', 500.0, 1000.0),
             ('p2', 1000.0, 1500.0), ('p3', 1500.0, 100000.0)
    )
    SELECT b.band, COUNT(*)::BIGINT AS n_parts,
           ROUND(AVG(p.p_retailprice), 4) AS avg_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join against a tiny band table → broadcast nested
    loop, which is the right physical plan when one side is a handful of
    interval rows (the O(n·k) BNLJ beats any shuffle)."""
    p = Catalog(spark, sf_dir).part
    bands = local_frame(
        spark,
        [("p0", 0.0, 500.0), ("p1", 500.0, 1000.0), ("p2", 1000.0, 1500.0), ("p3", 1500.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            pround(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


@query(
    "join_asof_last_click",
    oracle="""
    SELECT p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(MAX(c.ts), '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.ts
    """,
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at ts <= purchase ts.

    Implemented the scale-correct way — NOT the O(n·m)-per-user join the
    oracle uses, but a single sort within user partitions: union both
    streams, order by (ts, kind) with clicks first at equal ts, and carry
    `last(click_ts, ignorenulls)` forward. One shuffle on user_id, linear
    work per partition; survives arbitrarily many events per user.
    """
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    # A NULL-user or NULL-ts click can never satisfy the oracle's
    # `c.user_id = p.user_id AND c.ts <= p.ts` (NULL predicate), so drop
    # them before the union — otherwise the window's NULL-user partition
    # would happily carry a NULL-user click into a NULL-user purchase
    # (window partitioning groups NULLs together; equi-join does not).
    # NULL-key PURCHASES stay: the left join emits them with NULL click.
    clicks = ev.filter(
        (F.col("event_type") == "click")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        "user_id", "ts", F.lit(0).alias("kind"), F.col("ts").alias("click_ts"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"), F.lit(None).cast("timestamp").alias("click_ts"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "kind").rowsBetween(W.unboundedPreceding, 0)
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("kind") == 1).select(
        "event_id",
        ts_str("ts").alias("purchase_ts"),
        ts_str("last_click_ts").alias("last_click_ts"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k.
# --------------------------------------------------------------------------
@query(
    "sort_multi_key_top100",
    oracle="""
    SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi_key_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .select("o_orderkey", "o_orderpriority", pround("o_totalprice", 2).alias("total_price"))
        .limit(100)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY o_orderkey LIMIT 50 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.orderBy("o_orderkey").select("o_orderkey", "o_custkey").offset(10).limit(50)


@query(
    "topk_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def topk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark fuses orderBy+limit into TakeOrderedAndProject —
    each partition keeps a k-heap, driver merges k×partitions rows. No full
    sort, no full shuffle; this is exactly the 100 TB-safe plan."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", pround("l_extendedprice", 2).alias("price"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------
@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"))
    s = cat.supplier.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"))
    return c.unionByName(s)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        cat.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        cat.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT event_type FROM events WHERE user_id = 1
    INTERSECT ALL
    SELECT event_type FROM events WHERE user_id = 2
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return ev.filter(F.col("user_id") == 1).select("event_type").intersectAll(
        ev.filter(F.col("user_id") == 2).select("event_type")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM nation n RIGHT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return cat.nation.join(
        cat.supplier, F.col("s_nationkey") == F.col("n_nationkey"), "right"
    ).select("s_suppkey", "s_name", F.col("n_name").alias("nation"))


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(cat.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0.0), 2) AS O,
           ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0.0), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one output column per pivot value. Spark's pivot with an
    explicit value list avoids the extra distinct-scan pass; the oracle
    states the equivalent conditional aggregation."""
    li = Catalog(spark, sf_dir).lineitem
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(pround(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag",
        pround(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("O"),
        pround(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("F"),
    )


@query(
    "unpivot_order_metrics",
    oracle="""
    SELECT o_orderkey, 'o_totalprice' AS metric, ROUND(o_totalprice, 2) AS val FROM orders
    UNION ALL
    SELECT o_orderkey, 'o_custkey' AS metric, o_custkey::DOUBLE AS val FROM orders
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        pround("o_totalprice", 2).alias("o_totalprice"),
        F.col("o_custkey").cast("double").alias("o_custkey"),
    ).unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "o_custkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via SQL passthrough — Catalyst plans the subquery
    as a broadcast scalar (one extra tiny job), identical to DuckDB."""
    cat = Catalog(spark, sf_dir)
    # statement-scoped args — no session temp views (see agg_grouping_sets)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
        FROM {orders}
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM {orders})
        """,
        orders=cat.orders,
    )


@query(
    "in_subquery_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
    """,
)
def in_subquery_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM {customer}
        WHERE c_nationkey IN (SELECT n_nationkey FROM {nation} WHERE n_regionkey = 1)
        """,
        customer=cat.customer,
        nation=cat.nation,
    )


@query(
    "pipeline_incremental_merge",
    oracle="""
    WITH changes AS (
      SELECT c_custkey AS key, 'U' AS op, c_acctbal + 50.0 AS new_bal
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, 'D', NULL FROM customer WHERE c_custkey % 10 = 1
      UNION ALL
      SELECT c_custkey + 1000000, 'I', 100.0 FROM customer WHERE c_custkey % 10 = 2
    ),
    merged AS (
      SELECT COALESCE(c.c_mktsegment, 'NEW') AS segment,
             CASE WHEN ch.op = 'U' THEN ch.new_bal
                  WHEN ch.op = 'I' THEN ch.new_bal
                  ELSE c.c_acctbal END AS bal
      FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.key
      WHERE ch.op IS NULL OR ch.op <> 'D'
    )
    SELECT segment, COUNT(*)::BIGINT AS n_rows,
           ROUND(SUM(bal) + 0.000001, 2) AS total_bal
    FROM merged GROUP BY segment
    """,
)
def pipeline_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental upsert (MERGE) without a table format: apply a
    changeset of updates / deletes / inserts to a snapshot via ONE full
    outer join on the key — the scale shape Delta/Iceberg MERGE compiles
    to underneath. Both sides shuffle once on the key; the op dispatch is
    a projection. The changeset here is derived deterministically from
    the snapshot itself (key mod 10) so the query is self-contained and
    oracle-checkable; in production it arrives as a CDC feed. At 100 TB
    the win over rewrite-everything is that only the join on the key
    moves data — no fact-table rewrite outside matched files."""
    c = Catalog(spark, sf_dir).customer
    upd = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("key"),
        F.lit("U").alias("op"),
        # exact double arithmetic on purpose: a scaled-and-ROUNDed update
        # (x * 1.1 → half-cent values) rounds HALF_UP on Spark but
        # HALF_EVEN on DuckDB, and at sf0.1 enough rows sit on the
        # boundary to shift segment totals by whole cents
        (F.col("c_acctbal") + 50.0).alias("new_bal"),
    )
    dels = c.filter(F.col("c_custkey") % 10 == 1).select(
        F.col("c_custkey").alias("key"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_bal"),
    )
    ins = c.filter(F.col("c_custkey") % 10 == 2).select(
        (F.col("c_custkey") + 1000000).alias("key"),
        F.lit("I").alias("op"),
        F.lit(100.0).alias("new_bal"),
    )
    changes = upd.unionAll(dels).unionAll(ins)
    merged = (
        c.join(changes, F.col("c_custkey") == F.col("key"), "full_outer")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("c_mktsegment", F.lit("NEW")).alias("segment"),
            F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
            .otherwise(F.col("c_acctbal"))
            .alias("bal"),
        )
    )
    return merged.groupBy("segment").agg(
        F.count("*").alias("n_rows"),
        pround(F.sum("bal") + 0.000001, 2).alias("total_bal"),
    )


@query(
    "join_interval_bucketed",
    oracle="""
    WITH iv AS (
      SELECT user_id AS owner, MIN(ts) AS iv_start,
             MIN(ts) + INTERVAL 2 HOUR AS iv_end
      FROM events WHERE user_id < 20 GROUP BY user_id
    )
    SELECT iv.owner, COUNT(*)::BIGINT AS n_events,
           COUNT(DISTINCT e.user_id)::BIGINT AS n_users
    FROM iv JOIN events e ON e.ts >= iv.iv_start AND e.ts <= iv.iv_end
    GROUP BY iv.owner
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join at scale: the naive form is an unbounded
    theta join (every event × every interval — a broadcast nested loop
    that dies when BOTH sides are big). This form buckets time into hours,
    explodes each interval into the hour buckets it covers (bounded:
    span/1h + 1 rows), equi-joins events to buckets on the truncated
    hour, and applies the exact BETWEEN as a post-filter — turning the
    theta join into a shuffle-hash equi-join keyed on the bucket. The
    oracle states the naive BETWEEN semantics; this plan must reproduce
    it exactly. (Closes the interval-bucketing strategy SCALE.md's join
    section calls for when neither side broadcasts.)"""
    ev = Catalog(spark, sf_dir).events
    iv = (
        ev.filter(F.col("user_id") < 20)
        .groupBy(F.col("user_id").alias("owner"))
        .agg(F.min("ts").alias("iv_start"))
        .withColumn("iv_end", F.timestamp_add("HOUR", F.lit(2), F.col("iv_start")))
    )
    buckets = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "iv_start"),
                F.date_trunc("hour", "iv_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    pts = ev.select("user_id", "ts", F.date_trunc("hour", "ts").alias("bucket"))
    return (
        pts.join(buckets.hint("shuffle_hash"), "bucket")
        .filter((F.col("ts") >= F.col("iv_start")) & (F.col("ts") <= F.col("iv_end")))
        .groupBy("owner")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


_SHARED_SQL = """
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue,
       -- + 1e-6 (the q17/q22 idiom): AVG of discrete money can land a
       -- hair under a decimal halfway whose shortest repr IS the halfway,
       -- where Spark's decimal-repr ROUND and a binary-rounding engine
       -- disagree by a full cent (functions/rounding.py; fuzz seed 4026).
       -- The nudge is inside the shared string, so both engines see it.
       ROUND(AVG(o.o_totalprice) + 0.000001, 2) AS avg_order,
       MIN(o.o_orderdate) AS first_order,
       MAX(o.o_orderdate) AS last_order
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus <> 'F'
GROUP BY c.c_mktsegment
"""


@query("sql_passthrough_segment_revenue", oracle=_SHARED_SQL)
def sql_passthrough_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL passthrough: the engine registers the catalog tables as views
    and hands the user's SQL string to spark.sql verbatim — and the SAME
    string is the DuckDB oracle, character for character, proving the
    exposed dialect is the portable ANSI subset. A reference user who
    writes plain SQL (rather than the DataFrame builder surface every
    other query demonstrates) switches engines by changing nothing."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(("orders", "customer"))
    return spark.sql(_SHARED_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_custkey < 100
"""


@query("join_lateral_topn", oracle=_LATERAL_SQL)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with a per-row ORDER BY ... LIMIT —
    the SQL-standard spelling of top-n-per-group. Catalyst decorrelates
    the lateral into a DomainJoin and the limit becomes a rank filter, so
    the physical plan is the same WindowGroupLimit shape as
    window_topk_per_group — per-group partial limits before the shuffle,
    never a per-customer re-scan of orders. The identical string runs on
    DuckDB as the oracle (portable ANSI, like
    sql_passthrough_segment_revenue)."""
    cat = Catalog(spark, sf_dir)
    cat.register_views(("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


@query(
    "join_null_safe",
    oracle="""
    WITH n AS (SELECT n_nationkey, nullif(n_regionkey, 2) AS rk FROM nation),
         r AS (SELECT r_regionkey, r_name, nullif(r_regionkey, 2) AS rk
               FROM region)
    SELECT r.r_name, COUNT(n.n_nationkey)::BIGINT AS n_nations
    FROM n JOIN r ON n.rk IS NOT DISTINCT FROM r.rk
    GROUP BY r.r_name
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing, the semantic a plain equi-join
    silently drops. Region 2's key is nulled on both sides, so its
    nations survive only under null-safe semantics — the oracle pins
    exactly that. Catalyst plans <=> as a hash join (null-safe keys hash
    like values), so the scale shape is identical to the plain join."""
    cat = Catalog(spark, sf_dir)
    n = cat.nation.select(
        "n_nationkey", F.nullif(F.col("n_regionkey"), F.lit(2)).alias("rk")
    )
    r = cat.region.select(
        "r_name", F.nullif(F.col("r_regionkey"), F.lit(2)).alias("rk")
    )
    return (
        n.join(r, n["rk"].eqNullSafe(r["rk"]))
        .groupBy("r_name")
        .agg(F.count("n_nationkey").alias("n_nations"))
    )
