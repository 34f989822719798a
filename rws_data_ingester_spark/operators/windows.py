"""Window-function operators: ranking, offsets, frames, top-k per group.

All [EXT] (SURVEY.md §2.5 — the reference has no window logic). Every
window spec is deterministic: ORDER BY always ends in a unique key unless
the function is tie-stable (rank/dense_rank).

Scale notes: a window = one shuffle on partitionBy keys + per-partition
sort. Partitioning by user_id / custkey distributes well (many keys, no
mega-key in the fixtures); skewed real data would take AQE or salting.
Top-k-per-group filters immediately after row_number so nothing wide
survives the window stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.functions.timefmt import ts_str
from rws_data_ingester_spark.plans.registry import query


@query(
    "window_rank",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           RANK()       OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)::BIGINT AS prio_rank,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)::BIGINT AS prio_dense,
           ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)::BIGINT AS rn_in_status,
           NTILE(4)     OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)::BIGINT AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice NULLS LAST), 6)
             AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice NULLS LAST), 6)
             AS cume,
           NTH_VALUE(o_orderkey, 2) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           )::BIGINT AS second_priciest_key
    FROM orders
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/distribution window family over one orders scan:
    rank/dense_rank (tie-stable), row_number/ntile (key-tiebroken),
    percent_rank/cume_dist (tie-stable by definition), and nth_value over
    the whole-partition frame (second-priciest per status, key-tiebroken).
    One query = one shuffle per distinct partitioning; Catalyst groups the
    three o_orderstatus windows into shared Window nodes."""
    o = Catalog(spark, sf_dir).orders
    # o_totalprice is nullable: Spark defaults ASC to NULLS FIRST while
    # DuckDB defaults to NULLS LAST, so the null placement is pinned
    # explicitly (LAST) on both engines.
    w_prio = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    w_key = W.partitionBy("o_orderstatus").orderBy("o_orderkey")
    w_price = W.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").asc_nulls_last())
    w_nth = (
        W.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    # window expressions bound raw, rounded in the outer select: WindowExec
    # does NOT dedup identical window expressions (unlike HashAggregate),
    # so pround's multiple operand references would materialize each
    # window function 6× — 6× the compute and 6× the window buffer width
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w_prio).cast("long").alias("prio_rank"),
        F.dense_rank().over(w_prio).cast("long").alias("prio_dense"),
        F.row_number().over(w_key).cast("long").alias("rn_in_status"),
        F.ntile(4).over(w_key).cast("long").alias("quartile"),
        F.percent_rank().over(w_price).alias("_pct"),
        F.cume_dist().over(w_price).alias("_cume"),
        F.nth_value("o_orderkey", 2).over(w_nth).cast("long").alias("second_priciest_key"),
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "prio_rank",
        "prio_dense",
        "rn_in_status",
        "quartile",
        pround("_pct", 6).alias("pct_rank"),
        pround("_cume", 6).alias("cume"),
        "second_priciest_key",
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id,
           user_id,
           ROUND(value, 4) AS value,
           ROUND(LAG(value)  OVER w, 4) AS prev_value,
           ROUND(LEAD(value) OVER w, 4) AS next_value,
           ROUND(FIRST_VALUE(value) OVER w, 4) AS first_value,
           ROUND(LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4) AS final_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULLS LAST pinned: a NULL event time sorts opposite by default on
    # the two engines (Spark NULLS FIRST asc, DuckDB NULLS LAST asc)
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    # raw window columns bound first — WindowExec doesn't dedup, see
    # window_rank
    return ev.select(
        "event_id",
        "user_id",
        pround("value", 4).alias("value"),
        F.lag("value").over(w).alias("_prev"),
        F.lead("value").over(w).alias("_next"),
        F.first("value").over(w).alias("_first"),
        F.last("value").over(w_full).alias("_final"),
    ).select(
        "event_id",
        "user_id",
        "value",
        pround("_prev", 4).alias("prev_value"),
        pround("_next", 4).alias("next_value"),
        pround("_first", 4).alias("first_value"),
        pround("_final", 4).alias("final_value"),
    )


@query(
    "window_running",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS n_so_far
    FROM events
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULLS LAST pinned — see window_lag_lead
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), "event_id")
    # raw window columns bound first — WindowExec doesn't dedup, see
    # window_rank
    return ev.select(
        "event_id",
        "user_id",
        F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("_run"),
        F.avg("value").over(w.rowsBetween(-2, 0)).alias("_mov3"),
        F.count("*").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("n_so_far"),
    ).select(
        "event_id",
        "user_id",
        pround("_run", 4).alias("running_total"),
        pround("_mov3", 4).alias("moving_avg3"),
        "n_so_far",
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT c_custkey,
           ROUND(c_acctbal, 4) AS acctbal,
           COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                 RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)::BIGINT AS n_within_500
    FROM customer
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based): count of peers whose balance is within
    500 below mine. Deterministic despite value ties because RANGE frames
    include all peer rows."""
    c = Catalog(spark, sf_dir).customer
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal").rangeBetween(-500, 0)
    return c.select(
        "c_custkey",
        pround("c_acctbal", 4).alias("acctbal"),
        F.count("*").over(w).alias("n_within_500"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total_price, rn
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical dedup/top-k pattern.
    Catalyst inserts a WindowGroupLimit (rank-limit pushdown) before the
    full sort at scale, so partitions prune to k rows early."""
    cat = Catalog(spark, sf_dir)
    joined = cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
    w = W.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        joined.select(
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", pround("o_totalprice", 2).alias("total_price"), "rn")
    )


@query(
    "window_share_of_group",
    oracle="""
    -- + 0.0 collapses IEEE negative zero (0 / negative-sum): Spark's
    -- ROUND drops the sign through BigDecimal, DuckDB's keeps it.
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / nullif(SUM(l_extendedprice) OVER (PARTITION BY l_orderkey), 0),
                 6) + 0.0 AS price_share
    FROM lineitem
    """,
)
def window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    w = W.partitionBy("l_orderkey")
    # nullif guards the zero-sum group (prices can cancel): Spark's ANSI
    # divide would error and DuckDB would emit inf — NULL on both engines.
    # raw share bound first — WindowExec doesn't dedup, see window_rank
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            / F.nullif(F.sum("l_extendedprice").over(w), F.lit(0.0))
        ).alias("_share"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        (pround("_share", 6) + 0.0).alias("price_share"),
    )



# window_distribution (percent_rank/cume_dist) and window_nth_value were
# folded into window_rank above — same orders scan, one registered query
# per rotation slot (round-2 consolidation).
