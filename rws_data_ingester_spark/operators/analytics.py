"""Composite analytics queries — full scan→multi-join→agg→top-k pipelines
shaped after the classic TPC-H Q3/Q5/Q10 patterns, adapted to the fixture
star schema (SURVEY.md §2.3/§2.4/§2.6 composed end-to-end).

These are the queries that exercise the whole optimizer at once: pushed
date/segment filters, broadcast of the small dims, shuffle joins between
the fact tables, partial/final aggregation, and TakeOrderedAndProject for
the top-k — the plan shape a 100 TB star-schema workload lives or dies on.
Timestamps are rendered to date strings on both sides (engine-comparable
hashing; registry rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query

def _revenue() -> F.Column:
    # built lazily — Column construction needs an active SparkContext,
    # which doesn't exist at import time. Callers add 1e-6 before ROUND(.., 2)
    # on BOTH engines: revenue sums can land exactly on a half-cent rounding
    # boundary, where each engine's summation order rounds differently; the
    # nudge (>> 1e-9 FP noise, << visible precision) breaks the tie one way.
    return F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 0.000001, 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment-filtered customers × date-bounded orders ×
    late-shipping lineitems → revenue per order, top 10. Both date
    predicates push into the parquet scans; customer (after the segment
    filter) broadcasts. The fact-fact join is hinted shuffle_hash: at
    scale lineitem can never broadcast, and locally the hint beats the
    cost model's broadcast pick (measured 0.6s vs 0.85s warm at sf0.1)."""
    cat = Catalog(spark, sf_dir)
    cutoff = "1998-06-01"
    c = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    o = cat.orders.filter(F.col("o_orderdate") < cutoff)
    li = cat.lineitem.filter(F.col("l_shipdate") > cutoff).hint("shuffle_hash")
    return (
        F.broadcast(c)
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(pround(_revenue() + 1e-6, 2).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name AS nation,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 0.000001, 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: six-table star with the customer-nation = supplier-nation
    equality folded into the supplier join. region/nation/supplier
    broadcast; the two fact tables meet in one shuffle join."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        cat.customer.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cat.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(pround(_revenue() + 1e-6, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 0.000001, 2) AS revenue,
           n_name AS nation
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, top 20. The
    returnflag filter pushes into the lineitem scan so the fact-fact join
    sees only returned lines (~1/3 of the table)."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = cat.lineitem.filter(F.col("l_returnflag") == "R").hint("shuffle_hash")
    return (
        cat.customer.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(pround(_revenue() + 1e-6, 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS. Catalyst decorrelates it into a left
    semi join on l_orderkey with the l_shipdate > o_orderdate residual —
    same plan a hand-written semi join would get, written declaratively."""
    cat = Catalog(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM {orders}
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM {lineitem}
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        orders=cat.orders,
        lineitem=cat.lineitem,
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0 + 0.000001, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery (per-part average quantity).
    Catalyst decorrelates into an aggregate-then-join: one pass computes
    avg(l_quantity) per partkey, then joins it back — the subquery never
    re-executes per row, which is the only survivable form at 100 TB."""
    cat = Catalog(spark, sf_dir)
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0 + 0.000001, 2) AS avg_yearly
        FROM {lineitem} JOIN {part} ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM {lineitem} l2
                            WHERE l2.l_partkey = p_partkey)
        """,
        lineitem=cat.lineitem,
        part=cat.part,
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount) + 0.000001, 2) AS revenue_delta,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure filter→agg, zero joins. Every predicate pushes into
    the parquet scan; the whole query is one pruned scan + one partial/
    final agg — the best-case plan and the yardstick the other shapes are
    judged against."""
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        pround(F.sum(F.col("l_extendedprice") * F.col("l_discount")) + 1e-6, 2).alias(
            "revenue_delta"
        ),
        F.count("*").alias("n_lines"),
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / nullif(SUM(l_extendedprice * (1 - l_discount)), 0) + 0.000001, 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate <  TIMESTAMP '1997-09-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional share over a fact-dim join. part broadcasts;
    the two sums come out of ONE aggregation pass (conditional sum), not
    two scans."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-09-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")).agg(
        pround(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.nullif(F.sum(rev), F.lit(0.0))
            + 1e-6,
            4,
        ).alias("promo_pct")
    )


@query(
    "q19_bracketed_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)) + 0.000001, 2) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
       OR (p_brand = 'Brand#9' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
       OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
    """,
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR of AND-brackets spanning both join sides. Catalyst
    extracts the common join key and pushes the bracket residual as a
    post-join filter; the per-side conjuncts it can derive (brand/size on
    part, quantity on lineitem) prune before the join."""
    cat = Catalog(spark, sf_dir)
    li, p = cat.lineitem, cat.part
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    bracket = (
        ((b == "Brand#1") & q.between(1, 11) & (sz <= 5))
        | ((b == "Brand#9") & q.between(10, 20) & (sz <= 10))
        | ((b == "Brand#20") & q.between(20, 30) & (sz <= 15))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(bracket)
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-6, 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big_orders AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT c_custkey, c_name, o_orderkey,
           ROUND(o_totalprice, 2) AS total_price,
           ROUND(total_qty, 2) AS total_qty
    FROM big_orders
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING-filtered aggregate joined back to the facts. The
    lineitem aggregation reduces before any join (the only survivable
    order at scale — join-then-aggregate would shuffle the full fact
    twice); the reduced big-orders set then drives the joins."""
    cat = Catalog(spark, sf_dir)
    big = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            pround("o_totalprice", 2).alias("total_price"),
            pround("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(25)
    )


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT c_nationkey,
           COUNT(*)::BIGINT AS n_customers,
           ROUND(SUM(c_acctbal) + 0.000001, 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders — a
    scalar subquery (broadcast single value) composed with NOT EXISTS
    (decorrelated to a left anti join on o_custkey)."""
    cat = Catalog(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_nationkey,
               COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal) + 0.000001, 2) AS total_bal
        FROM {customer}
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM {customer} WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM {orders} WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
        """,
        customer=cat.customer,
        orders=cat.orders,
    )


@query(
    "q7_nation_trade_flow",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate)::BIGINT AS ship_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 0.000001, 2) AS volume
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name != cn.n_name
    GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l_shipdate)
    """,
)
def q7_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-border volume between two nations per ship-year —
    the same dimension table (nation) joined twice under different roles,
    both broadcast."""
    cat = Catalog(spark, sf_dir)
    sn = cat.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    cn = cat.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        cat.lineitem.join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-6, 2
            ).alias("volume")
        )
    )


@query(
    "q8_market_share",
    oracle="""
    WITH region_sales AS (
      SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
             sn.n_name AS supp_nation,
             l_extendedprice * (1 - l_discount) AS vol
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE'
    )
    -- nullif: a year's volumes can cancel to exactly 0 (negative money),
    -- where Spark's ANSI divide errors and DuckDB emits inf — NULL both.
    SELECT order_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END)
                 / nullif(SUM(vol), 0) + 0.000001, 6) AS mkt_share
    FROM region_sales GROUP BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's purchase volume per
    year — conditional-sum ratio from a single pass, nation joined twice
    (customer side restricts the region, supplier side names the
    contender)."""
    cat = Catalog(spark, sf_dir)
    cn = cat.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = cat.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cat.lineitem.join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("cn_region"),
        )
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            pround(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.nullif(F.sum(vol), F.lit(0.0))
                + 1e-6,
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q13_customer_order_histogram",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    SELECT c_count::BIGINT AS n_orders,
           COUNT(*)::BIGINT AS n_customers
    FROM per_cust GROUP BY c_count
    """,
)
def q13_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: two-level aggregation (orders per customer, then the
    count-of-counts histogram). The left join keeps zero-order customers;
    COUNT(o_orderkey) — not COUNT(*) — makes them count 0. Second agg
    input is customer-sized, already reduced."""
    cat = Catalog(spark, sf_dir)
    per_cust = (
        cat.customer.join(
            cat.orders, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").alias("n_orders")).agg(
        F.count("*").alias("n_customers")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)) + 0.000001, 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view + argmax via scalar subquery. The view is
    computed once; Catalyst broadcasts the single max value back — ties
    all surface, matching the SQL semantics (no arbitrary limit 1)."""
    cat = Catalog(spark, sf_dir)
    revenue = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-6, 2
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))::BIGINT
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))::BIGINT
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL 75 DAY
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipmode→linestatus proxy; the fixture lineitem has no
    l_shipmode/l_commitdate): fact-fact equi-join with a range predicate,
    then CASE-bucketed conditional counts per group — the two-bucket
    priority split of TPC-H Q12. Both facts shuffle on orderkey; the
    priority CASE evaluates map-side pre-aggregation."""
    cat = Catalog(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.orders.join(cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 75 DAY"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 75 DAY
    )
    SELECT s_name, COUNT(*)::BIGINT AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the sole-late-supplier-on-a-multi-supplier-order query.
    'Late' is shipdate > orderdate + 75 days (fixture has no
    commit/receipt dates).

    The correlated NOT EXISTS ("no OTHER supplier was late on this
    order") is NOT decorrelated to a left-anti self-join against the
    late set — since `late` is DISTINCT on (orderkey, suppkey), the
    predicate is exactly "the order has ONE distinct late supplier",
    i.e. a groupBy(l_orderkey) count==1 over `late` itself, keeping the
    sole suppkey with max() (count==1 makes max ≡ the only value). That
    removes both the anti-join AND the second evaluation of the whole
    late pipeline: the previous semi+anti form referenced `late` twice,
    and Catalyst did NOT reuse the exchange (ReusedExchange: 0 — two
    full join+distinct passes over lineitem), profiled at 2/3 of the
    query's sf10 cost. The correlated EXISTS ("another supplier, late
    or not, contributed") stays a left-semi probe into lineitem on
    (orderkey, suppkey≠); supplier names attach by broadcast at the
    end. sf10: 26.8 s (two-pass form) → 15.4 s; tail α 1.29 → ~1.05."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    fo = cat.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        li.join(fo, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAY"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.count("*").alias("_n_late"), F.max("l_suppkey").alias("l_suppkey"))
        .filter(F.col("_n_late") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    l1 = sole_late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    multi = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    return (
        multi.join(
            F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - 0.55 * p_retailprice * l_quantity) + 0.000001, 2) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit by nation × year), reshaped: the
    fixture has no partsupp, so supply cost is proxied as 55% of
    p_retailprice — the join/agg skeleton (part-name filter pushed to the
    part scan, two broadcastable dims, fact-fact join on l_orderkey,
    partial agg on (nation, year)) is the thing under test, not the cost
    model. part/supplier/nation broadcast; only orders⋈lineitem shuffles."""
    cat = Catalog(spark, sf_dir)
    red_parts = cat.part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    profit = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.55 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        cat.lineitem.join(F.broadcast(red_parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cat.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(pround(profit + 0.000001, 2).alias("profit"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    -- nullif: unit cost is undefined for zero-quantity lines (Spark's
    -- ANSI divide errors, DuckDB emits inf); NULL is skipped by MIN on
    -- both engines, so such lines never price an offer.
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / nullif(l_quantity, 0)) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           ROUND(ps.unit_cost, 4) AS unit_cost
    FROM ps
    JOIN part     ON p_partkey = ps.l_partkey
    JOIN supplier ON s_suppkey = ps.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_size = 11 AND p_type = 'ECONOMY'
      AND ps.unit_cost = (
        SELECT MIN(ps2.unit_cost) FROM ps ps2 WHERE ps2.l_partkey = ps.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (cheapest supplier per part): the correlated MIN subquery
    over the part's offers, decorrelated into a min-over-window on the
    derived (part, supplier, unit_cost) table — one shuffle keyed on
    l_partkey serves both the per-part MIN and the equality filter, where
    the correlated form would rescan. unit_cost derives from lineitem
    (fixture has no partsupp): MIN(extendedprice/quantity) per
    (part, supplier) — an exact selection, not a sum, so both engines
    compare identical doubles."""
    from pyspark.sql import Window as W

    cat = Catalog(spark, sf_dir)
    ps = (
        cat.lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0.0))
            ).alias("unit_cost")
        )
    )
    best = ps.withColumn(
        "min_cost", F.min("unit_cost").over(W.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    parts = cat.part.filter(
        (F.col("p_size") == 11) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    return (
        best.join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cat.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            pround("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(10)
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH stock AS (
      SELECT l_partkey, SUM(l_quantity * p_retailprice) AS value
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, ROUND(value + 0.000001, 2) AS value
    FROM stock
    WHERE value > (SELECT SUM(value) * 0.0015 FROM stock)
    ORDER BY value DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock): per-part inventory value restricted
    to two nations' suppliers, kept when above a fraction of the TOTAL —
    the scalar-subquery-in-HAVING pattern. The total is a one-row
    aggregate crossJoin-broadcast back against the per-part rows (same
    single-pass trick as agg_share_of_total), NOT a driver-side collect;
    the per-part table shuffles once on l_partkey and is reused for both
    the total and the filter via the crossJoin."""
    cat = Catalog(spark, sf_dir)
    nations = cat.nation.filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    stock = (
        cat.lineitem.join(
            F.broadcast(cat.part.select("p_partkey", "p_retailprice")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nations), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * F.col("p_retailprice")).alias("value"))
    )
    total = stock.agg((F.sum("value") * 0.0015).alias("threshold"))
    return (
        stock.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            pround(F.col("value") + 0.000001, 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 11, 15, 23, 28, 37, 42)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 20
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (supplier-part relationship count): distinct suppliers
    per (brand, type, size) bucket, excluding a supplier blocklist — the
    NOT IN subquery decorrelated to a broadcast left-anti join (fixture's
    'complaints' proxy: negative account balance). The part-attribute
    filters all push to the part scan; COUNT(DISTINCT) expands to the
    standard two-phase partial-distinct aggregate."""
    cat = Catalog(spark, sf_dir)
    parts = cat.part.filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 11, 15, 23, 28, 37, 42)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complainers = cat.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        cat.lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(complainers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 400
    )
    ORDER BY s_name
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (suppliers with excess stock of a part family): nested
    IN subqueries — part-name family → that family's 1997 lineitems →
    suppliers shipping >400 units — decorrelated to broadcast-semi-join
    chain: part filter broadcast into the lineitem scan (with the shipdate
    range pushed down), per-supplier HAVING aggregate, then a left-semi
    join from supplier. Ids flow through every join; no payload columns
    shuffle."""
    cat = Catalog(spark, sf_dir)
    small_parts = cat.part.filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return (
        cat.supplier.join(
            F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(cat.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
