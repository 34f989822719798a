"""Time-series warehouse operators over the events stream: gap-filled
hourly grids, cohort retention, and SCD2 interval building
(SURVEY.md §2.9/§2.10 [EXT] — the reference is a point-in-time cron ETL
with no history model; these are the standard shapes a time-series /
warehouse user expects from the engine).

Scale design: every operator aggregates the raw events FIRST (map-side
partial aggregation, event-count → cell-count reduction before any
exchange), then does its window/join work on the aggregated grid —
hours x types, users, or change-points — which is orders of magnitude
smaller than the event stream. The time spine is generated, not stored
(``sequence()`` + explode of a 2-value bounds row), so the gap-fill
never scans anything to learn the calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "timeseries_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), agg AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*)::BIGINT AS n, MAX(value) AS max_value
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), grid AS (
      SELECT t.event_type, s.h,
             COALESCE(a.n, 0)::BIGINT AS n_events,
             a.max_value,
             (CASE WHEN a.h IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_gap
      FROM types t CROSS JOIN spine s
      LEFT JOIN agg a ON a.event_type = t.event_type AND a.h = s.h
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           n_events, is_gap,
           ROUND(LAST_VALUE(max_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS value_filled
    FROM grid
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per event type: a generated hour spine ×
    the type dimension, left-joined onto the hourly aggregate; missing
    hours get count 0, an is_gap marker, and a carried-forward (LOCF)
    hourly max — the hypertable ``time_bucket_gapfill`` + ``locf`` shape.
    The carried metric is MAX (an exact order statistic) rather than AVG
    on purpose: engines sum doubles in different orders, and at sf0.1 the
    per-cell averages drift past any fixed rounding — max is bit-identical
    everywhere, so the LOCF contract stays oracle-exact at every scale.
    The raw stream collapses to hours × types cells before any window
    touches it, so the LOCF pass costs nothing at any corpus scale."""
    ev = Catalog(spark, sf_dir).events
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"), F.max("value").alias("max_value"))
    # ONE corpus scan: bounds and the type dimension both derive from the
    # hourly-cell aggregate, not from separate passes over the raw events.
    # The cell frame is localCheckpoint-ed (lazy) because per-branch column
    # pruning specializes each consumer's partial aggregate, which defeats
    # exchange reuse — without the cut, Catalyst re-scans the fact per
    # branch (verified in the plan). Cells are hours x types — trivial.
    agg = agg.localCheckpoint(eager=False)
    bounds = agg.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    types = agg.select("event_type").distinct()
    grid = (
        types.crossJoin(spine)
        .join(agg, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            "max_value",
            F.when(F.col("n").isNull(), 1).otherwise(0).cast("long").alias("is_gap"),
        )
    )
    w = W.partitionBy("event_type").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    # LOCF window bound raw, rounded outside — WindowExec doesn't dedup
    # identical window expressions, so pround's multiple references would
    # materialize the last() 6× (see windows.window_rank)
    return grid.select(
        "event_type",
        F.date_format("h", _TS_FMT).alias("hour_start"),
        "n_events",
        "is_gap",
        F.last("max_value", ignorenulls=True).over(w).alias("_locf"),
    ).select(
        "event_type",
        "hour_start",
        "n_events",
        "is_gap",
        pround("_locf", 6).alias("value_filled"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           (date_diff('day', f.cohort_week, a.active_week) // 7)::BIGINT
             AS week_offset,
           COUNT(DISTINCT a.user_id)::BIGINT AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users are cohorted by the week of
    their first event; n_active counts distinct cohort members active in
    each later week. Both inputs are user-level aggregates (events
    collapse to one row per user / per user-week before the join), and
    the join key is user_id — one co-partitioned shuffle at any scale."""
    ev = Catalog(spark, sf_dir).events
    # ONE corpus scan: the user-week activity cells are the only pass over
    # events; cohort weeks derive from those cells (min week per user),
    # reusing the user-keyed partitioning the distinct just produced
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct().localCheckpoint(eager=False)
    firsts = activity.groupBy("user_id").agg(
        F.min("active_week").alias("cohort_week")
    )
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("CAST(datediff(active_week, cohort_week) / 7 AS BIGINT)").alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events WHERE ts IS NOT NULL
    ), starts AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev_type IS NULL OR prev_type != event_type
    ), iv AS (
      SELECT user_id, event_type, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM starts
    )
    SELECT user_id, event_type,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_current
    FROM iv
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 builder: collapse each user's
    event-type timeline into [valid_from, valid_to) intervals, one row
    per change-point, open interval marked is_current — the standard
    CDC-apply → dimension-history shape. Change-point detection is one
    lag() pass partitioned by user; the lead() close-off then runs on
    change-points only (a fraction of the events), reusing the same
    user-keyed partitioning — AQE sees one exchange."""
    # NULL event time excluded on both engines: an event with no
    # timestamp has no place on a validity timeline.
    ev = Catalog(spark, sf_dir).events.filter(F.col("ts").isNotNull())
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        ev.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(wo).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    iv = starts.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(W.partitionBy("user_id").orderBy("ts", "event_id")).alias(
            "valid_to"
        ),
    )
    return iv.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", _TS_FMT).alias("valid_from"),
        F.date_format("valid_to", _TS_FMT).alias("valid_to"),
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("long").alias(
            "is_current"
        ),
    )


@query(
    "engagement_rolling_active",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), bounds AS (
      SELECT MIN(d) AS lo, MAX(d) AS hi FROM days
    ), contrib AS (
      SELECT DISTINCT user_id, d + x * INTERVAL 1 DAY AS obs_day
      FROM days, (SELECT unnest(generate_series(0, 6)) AS x)
    ), wau AS (
      SELECT CAST(obs_day AS DATE) AS obs_day, COUNT(*)::BIGINT AS wau
      FROM contrib GROUP BY obs_day
    ), dau AS (
      SELECT d AS obs_day, COUNT(*)::BIGINT AS dau FROM days GROUP BY d
    )
    SELECT strftime(w.obs_day, '%Y-%m-%d') AS day,
           COALESCE(d.dau, 0)::BIGINT AS dau,
           w.wau
    FROM wau w LEFT JOIN dau d ON w.obs_day = d.obs_day, bounds b
    WHERE w.obs_day BETWEEN b.lo AND b.hi
    """,
)
def engagement_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU + trailing-7-day WAU per day via the contribution-day
    trick: each (user, active-day) cell CONTRIBUTES to the 7 observation
    days it falls inside, so the rolling distinct count becomes a plain
    groupBy over exploded cells — no per-day self-join against the event
    stream, no windowed COUNT DISTINCT (which Spark can't do over a
    range frame anyway). Shuffle volume is user-days x 7 cells, not
    events. The approximate sibling for wider windows is
    agg_hll_sketch_merge (mergeable sketches instead of exact cells)."""
    ev = Catalog(spark, sf_dir).events
    # user-day cells checkpoint (lazy): three consumers (bounds, the
    # contribution explode, DAU) would each re-scan the fact otherwise —
    # per-branch column pruning blocks exchange reuse (see gapfill note)
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct().localCheckpoint(eager=False)
    bounds = days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    contrib = (
        days.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("x"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("x")).alias("obs_day"))
        .distinct()
    )
    wau = contrib.groupBy("obs_day").agg(F.count("*").alias("wau"))
    dau = days.groupBy(F.col("d").alias("obs_day")).agg(F.count("*").alias("dau"))
    return (
        wau.join(dau, "obs_day", "left")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("obs_day").between(F.col("lo"), F.col("hi")))
        .select(
            F.date_format("obs_day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            "wau",
        )
    )


@query(
    "trend_wow_revenue",
    oracle="""
    WITH wk AS (
      SELECT date_trunc('week', o_orderdate) AS w,
             SUM(o_totalprice) AS rev,
             COUNT(*)::BIGINT AS n_orders
      FROM orders GROUP BY date_trunc('week', o_orderdate)
    )
    SELECT strftime(w, '%Y-%m-%d') AS week_start,
           ROUND(rev, 2) AS revenue,
           n_orders,
           ROUND(rev - LAG(rev) OVER (ORDER BY w), 2) + 0.0 AS wow_delta,
           ROUND((rev / nullif(LAG(rev) OVER (ORDER BY w), 0) - 1.0) * 100.0, 4) + 0.0
             AS wow_pct
    FROM wk
    """,
)
def trend_wow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue trend: weekly rollup, then lag() deltas.
    The unpartitioned lag window is deliberate and safe — it runs over
    the WEEKLY AGGREGATE (one row per calendar week, bounded by the
    calendar, not the data), never over the fact table; the fact
    collapses map-side first. A zero-revenue prior week makes wow_pct
    undefined (NULL via nullif) in BOTH engines — Spark returns NULL for
    x/0 while DuckDB returns inf, so the guard is a cross-engine
    correctness constraint, not style (same class as the
    timeseries_anomaly_zscore sd guard)."""
    o = Catalog(spark, sf_dir).orders
    wk = o.groupBy(F.date_trunc("week", "o_orderdate").alias("w")).agg(
        F.sum("o_totalprice").alias("rev"), F.count("*").alias("n_orders")
    )
    # the lag window expression is bound ONCE — WindowExec doesn't dedup,
    # and pround's references across two output columns would otherwise
    # materialize 12 copies of the same lag (see windows.window_rank)
    lag = F.lag("rev").over(W.orderBy("w"))
    return wk.select(
        F.date_format("w", "yyyy-MM-dd").alias("week_start"),
        "rev",
        "n_orders",
        lag.alias("_lag"),
    ).select(
        "week_start",
        pround("rev", 2).alias("revenue"),
        "n_orders",
        pround(F.col("rev") - F.col("_lag"), 2).alias("wow_delta"),
        pround(
            (F.col("rev") / F.nullif(F.col("_lag"), F.lit(0.0)) - 1.0) * 100.0, 4
        ).alias("wow_pct"),
    )


@query(
    "timeseries_anomaly_zscore",
    oracle="""
    WITH cells AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*)::BIGINT AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), stats AS (
      SELECT event_type, AVG(n) AS mu, STDDEV_SAMP(n) AS sd
      FROM cells GROUP BY event_type
    )
    SELECT c.event_type,
           strftime(c.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           c.n AS n_events,
           ROUND((c.n - s.mu) / nullif(s.sd, 0), 2) + 0.0 AS zscore,
           (CASE WHEN abs((c.n - s.mu) / nullif(s.sd, 0)) >= 2.0
                 THEN 1 ELSE 0 END)::BIGINT AS is_anomaly
    FROM cells c JOIN stats s ON c.event_type = s.event_type
    """,
)
def timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: z-score each (type, hour) cell's event
    count against its type's distribution, flag |z| >= 2 — the standard
    first-line monitoring rule over a metric stream. The fact collapses
    to hourly cells map-side; stats are a per-type aggregate over cells
    broadcast back, so the whole detector is two cell-level aggregates
    regardless of corpus size. zscore rounds at 2 decimals: mu/sd are
    float sums whose last bits are summation-order-dependent across
    engines, and a coarse rounding keeps the oracle hash stable (the
    |z|>=2 cut sits far above that noise floor)."""
    ev = Catalog(spark, sf_dir).events
    cells = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    stats = cells.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    # nullif guard: a type whose hourly counts are all identical has
    # sd = 0, where Spark's Divide yields NULL but DuckDB (IEEE division)
    # yields inf/nan — nullif on BOTH sides makes them agree on NULL
    # zscore / is_anomaly = 0 for constant series.
    z = (F.col("n") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0))
    return (
        cells.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.date_format("h", _TS_FMT).alias("hour_start"),
            F.col("n").alias("n_events"),
            pround(z, 2).alias("zscore"),
            F.when(F.abs(z) >= 2.0, 1).otherwise(0).cast("long").alias("is_anomaly"),
        )
    )


@query("engagement_wau_hll", oracle=None)  # sketch estimates → rows-only
def engagement_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users from MERGED DAILY SKETCHES — the
    100 TB path for engagement_rolling_active: the raw stream is touched
    once (per-day HLL sketch build, a few KB per day); every observation
    day then unions its 7 trailing sketches and estimates. The window
    join runs over the daily sketch table (calendar-sized), so widening
    the window or recomputing history never rescans events — the reason
    rollup tables store sketch columns instead of counts. Accuracy vs the
    exact contribution-day twin is pinned in tests (<5% per day)."""
    ev = Catalog(spark, sf_dir).events
    daily = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .localCheckpoint(eager=False)
    )
    obs = daily.select(F.col("d").alias("obs_day"))
    trailing = obs.join(
        daily,
        (F.col("d") <= F.col("obs_day"))
        & (F.col("d") >= F.date_sub(F.col("obs_day"), 6)),
    )
    return (
        trailing.groupBy("obs_day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_est"),
            F.count("*").alias("n_sketches_merged"),
        )
        .select(
            F.date_format("obs_day", "yyyy-MM-dd").alias("day"),
            "wau_est",
            "n_sketches_merged",
        )
    )
