"""Python extension-point surface (SURVEY.md §2.10 [EXT], last row):
scalar UDF, Arrow-batched pandas UDAF (grouped-agg), applyInPandas
grouped-map, and a Python UDTF — one oracle-checked query per kind.

These exist to prove the extension surface, not to be the hot path: the
scale guidance (SURVEY §2.10 / pyspark guide) is built-ins first, Arrow
batching when Python is unavoidable, row-at-a-time F.udf last. Each query
below picks data small enough that the Python boundary cost is irrelevant
while the oracle still pins exact semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query


# --------------------------------------------------------------------------
# Row-at-a-time scalar UDF (the slow path, demonstrated deliberately)
# --------------------------------------------------------------------------
@F.udf(T.LongType())
def vowel_count(s: str) -> int:
    return sum(1 for ch in (s or "") if ch in "aeiouAEIOU")


@query(
    "udf_scalar_vowels",
    oracle="""
    SELECT n_nationkey,
           length(regexp_replace(n_name, '[^aeiouAEIOU]', '', 'g'))::BIGINT AS vowels
    FROM nation
    """,
)
def udf_scalar_vowels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF on the 25-row nation table — the
    extension point exists; the hot-path rule is to never use it there."""
    n = Catalog(spark, sf_dir).nation
    return n.select("n_nationkey", vowel_count("n_name").alias("vowels"))


# --------------------------------------------------------------------------
# Grouped-aggregate pandas UDAF (Arrow batch per group)
# --------------------------------------------------------------------------
@F.pandas_udf(T.DoubleType())
def geomean(v: pd.Series) -> float:
    # Geometric mean is defined only for positive values: non-positive or
    # NULL prices are excluded on BOTH engines (DuckDB's LN errors on
    # x <= 0; numpy's returns NaN/-inf). All-excluded group -> NULL.
    vals = v.to_numpy(dtype="float64", na_value=np.nan)
    vals = vals[vals > 0.0]
    if len(vals) == 0:
        return None
    return float(np.exp(np.log(vals).mean()))


@F.pandas_udf(T.LongType())
def pd_count(v: pd.Series) -> int:
    return int(len(v))


@query(
    "udaf_geomean_price",
    oracle="""
    SELECT o_orderpriority,
           ROUND(EXP(AVG(LN(CASE WHEN o_totalprice > 0 THEN o_totalprice END))) + 1e-6, 2)
             AS geo_mean_price,
           COUNT(*)::BIGINT AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def udaf_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a grouped-agg pandas UDF: geometric mean of
    order value per priority. The whole group's column arrives as one
    Arrow batch; the oracle states the closed form EXP(AVG(LN(x))).
    The count is also a pandas UDAF — Spark disallows mixing grouped-agg
    pandas UDFs with JVM aggregates in one agg()."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.groupBy("o_orderpriority")
        .agg(
            geomean("o_totalprice").alias("gm_raw"),
            pd_count("o_totalprice").alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            (pround(F.col("gm_raw") + 1e-6, 2)).alias("geo_mean_price"),
            "n_orders",
        )
    )


# --------------------------------------------------------------------------
# Grouped-map applyInPandas (per-group DataFrame → DataFrame)
# --------------------------------------------------------------------------
_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_nationkey", T.LongType()),
        T.StructField("bal_z", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # SQL aggregate semantics, mirrored exactly: AVG/STDDEV_SAMP skip
    # NULLs (plain numpy .std() would poison the whole group with NaN),
    # STDDEV_SAMP needs >= 2 non-null values, and a zero/undefined sd
    # yields NULL z for every row (the oracle's nullif). A NULL balance
    # row keeps NULL z via NaN -> NA in the Float64 extension array.
    bal = pdf["c_acctbal"].to_numpy(dtype="float64", na_value=np.nan)
    valid = bal[~np.isnan(bal)]
    sd = valid.std(ddof=1) if len(valid) >= 2 else 0.0
    if sd == 0.0 or np.isnan(sd):
        z_out = pd.array([pd.NA] * len(bal), dtype="Float64")
    else:
        z_out = pd.array(np.round((bal - valid.mean()) / sd, 6), dtype="Float64")
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "c_nationkey": pdf["c_nationkey"],
            "bal_z": z_out,
        }
    )


@query(
    "grouped_map_zscore",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / nullif(STDDEV_SAMP(c_acctbal)
                          OVER (PARTITION BY c_nationkey), 0), 6) AS bal_z
    FROM customer
    """,
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation z-score of account balance via applyInPandas — the
    grouped-map (UDTF-ish) extension point. Each nation's rows arrive as
    one pandas frame; at 100 TB the group key must be chosen so a single
    group fits an executor (here: ~1/25th of customer)."""
    c = Catalog(spark, sf_dir).customer
    return (
        c.select("c_custkey", "c_nationkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)
    )


# --------------------------------------------------------------------------
# Python UDTF (Spark 3.5+): one input row → many output rows
# --------------------------------------------------------------------------
@query(
    "udtf_bigrams",
    oracle="""
    -- Linear form: zipped parallel UNNESTs + LEAD; indexing the carried
    -- list per row is accidentally quadratic on multi-MB documents.
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 20
    ),
    tok AS (
      SELECT doc_id,
             UNNEST(generate_series(1, len(toks))) AS i,
             UNNEST(toks) AS tok
      FROM d
    )
    SELECT doc_id, (i - 1)::BIGINT AS pos,
           tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS bigram
    FROM tok
    QUALIFY lead(tok) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
    """,
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word bigrams via a Python UDTF applied with a SQL LATERAL join —
    the table-function extension point (eval yields N rows per input)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, bigram: string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigrams", Bigrams)
    cat = Catalog(spark, sf_dir)
    # statement-scoped arg instead of a session temp view (no pollution,
    # no cross-sf_dir race); the UDTF registration is the demo surface
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.bigram
        FROM {docs} d, LATERAL bigrams(d.text) t
        """,
        docs=cat.documents.filter(F.col("doc_id") < 20),
    )


# --------------------------------------------------------------------------
# Cogrouped-map (applyInPandas over a cogroup — the two-sided extension
# point: each key's rows from BOTH inputs arrive in one Python call)
# --------------------------------------------------------------------------
@query(
    "cogroup_click_attribution",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id::BIGINT AS user_id,
           p.event_id::BIGINT AS purchase_id,
           COUNT(c.ts)::BIGINT AS n_prior_clicks,
           ROUND(COALESCE(SUM(c.value), 0), 4) AS click_value
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    GROUP BY p.user_id, p.event_id
    """,
)
def cogroup_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase 30-minute click attribution via cogrouped applyInPandas:
    a user's clicks AND purchases arrive together in one Arrow batch, so
    the per-key merge logic is arbitrary Python — the extension point for
    merge semantics Catalyst can't express. (This one it CAN express — the
    batch twin is the oracle's range join, and the streaming twin is
    `stream_stream_click_attribution` — which is exactly what makes it
    hash-checkable.)

    Scale lesson baked in: cogrouping directly on user_id means one
    Python call per user — measured ~7 s for 1 500 tiny groups at sf0.1,
    ~4-5 ms of Arrow/invoke overhead per group, function body irrelevant.
    So the cogroup key is a HASH BUCKET of the user (64 buckets), and the
    per-user logic runs inside the batch over numpy slices — same
    semantics, ~20x fewer UDF calls. The bucket count is the number of
    parallel work units: size it ~2-3x cores on a cluster. Per-key state
    is unchanged (a sorted click array per user)."""
    ev = Catalog(spark, sf_dir).events
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("bucket")
    # timestamps cross into pandas as int64 epoch-MICROS, not as a
    # timestamp column: Arrow casts timestamp[us] -> timestamp[ns] for
    # pandas and raises ArrowInvalid for anything past 2262-04-11 — a
    # corrupt far-future clock in one row would kill the whole job. An
    # int64 has no such window and searchsorted semantics are identical.
    ts_us = F.unix_micros("ts").alias("ts")
    # NULL-ts clicks can never satisfy `c.ts > p.ts - 30m AND c.ts <= p.ts`
    # (NULL predicate), so drop them Spark-side — this also guarantees the
    # pandas kernel's click `ts` column is never NaN. NULL-ts purchases
    # MUST survive: the oracle's LEFT JOIN emits them with 0 clicks.
    clicks = ev.filter(
        (F.col("event_type") == "click") & F.col("ts").isNotNull()
    ).select(bucket, "user_id", ts_us, "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        bucket, "user_id", "event_id", ts_us
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("purchase_id", T.LongType()),
            T.StructField("n_prior_clicks", T.LongType()),
            T.StructField("click_value", T.DoubleType()),
        ]
    )

    def attribute(clicks_pdf: pd.DataFrame, purch_pdf: pd.DataFrame) -> pd.DataFrame:
        names = [f.name for f in out_schema.fields]
        if purch_pdf.empty:
            return pd.DataFrame(columns=names)
        if not {"ts", "user_id", "event_id"}.issubset(purch_pdf.columns):
            # Catalyst prunes the cogroup's input value columns when the
            # caller observes no output values (a bare count()), leaving
            # only the grouping key (computed aliases like the epoch-micros
            # `ts` may survive pruning while plain attributes are cut, so
            # check every required column). Row COUNT is then the only
            # observable — one output row per purchase — so placeholder
            # values are legal. Without this branch a count() on this
            # query crashes the Python worker with a KeyError.
            n = len(purch_pdf)
            return pd.DataFrame(
                {
                    "user_id": purch_pdf["user_id"].astype("Int64")
                    if "user_id" in purch_pdf.columns
                    else [0] * n,
                    "purchase_id": [0] * n,
                    "n_prior_clicks": [0] * n,
                    "click_value": [0.0] * n,
                }
            )[names]
        # Per user inside the bucket: sorted clicks + two binary searches
        # per purchase — O((c+p) log c), no iterrows (which alone cost
        # ~10x here). The window sum is a direct slice sum so the float
        # accumulation matches a plain per-group SUM.
        has_clicks = not clicks_pdf.empty and {"ts", "user_id", "value"}.issubset(
            clicks_pdf.columns
        )
        by_user: dict = {}
        if has_clicks:
            cs = clicks_pdf.sort_values(["user_id", "ts"], kind="stable")
            for uid, grp in cs.groupby("user_id", sort=False):
                by_user[uid] = (
                    grp["ts"].to_numpy(dtype="int64"),
                    grp["value"].to_numpy(),
                )
        empty_ts = np.array([], "int64")
        window_us = 30 * 60 * 1_000_000  # 30 minutes in epoch-micros
        # A NULL purchase ts arrives as NaN (nullable int64 -> float64) and
        # would crash the int64 cast. The oracle's LEFT JOIN predicate is
        # NULL for such rows -> no matching clicks, so map NaN to a
        # sentinel far below any real clock: both searchsorted bounds land
        # at 0 (empty window -> 0 clicks, 0.0 value). -(2**62) is exactly
        # float64-representable (np.where produces a float array before the
        # int64 cast — int64-min-based sentinels round DOWN and then wrap
        # around on `pts - window_us`, yielding negative click counts) and
        # leaves 2**62 of headroom so the subtraction cannot underflow.
        null_ts_sentinel = -(2**62)
        out_uid, out_pid, out_n, out_val = [], [], [], []
        # dropna=False: a NULL-user purchase is still a purchase — the
        # oracle's LEFT JOIN emits it with 0 clicks (NULL never equi-joins),
        # while pandas' default dropna=True would silently delete the row.
        # NULL-user CLICKS need no such care: the clicks groupby above
        # drops them, which matches the oracle (they can never match).
        for uid, grp in purch_pdf.groupby("user_id", sort=False, dropna=False):
            cts, cval = (
                by_user.get(uid, (empty_ts, np.array([])))
                if uid == uid  # NaN key: no click can belong to it
                else (empty_ts, np.array([]))
            )
            pts_raw = grp["ts"].to_numpy()
            if pts_raw.dtype.kind == "f":
                pts = np.where(
                    np.isnan(pts_raw), null_ts_sentinel, pts_raw
                ).astype("int64")
            else:
                pts = pts_raw.astype("int64")
            lo_idx = np.searchsorted(cts, pts - window_us, side="right")
            hi_idx = np.searchsorted(cts, pts, side="right")
            # keep float64 (NaN-capable) when NULL user ids are present;
            # the final pd.array(..., dtype="Int64") turns NaN into SQL NULL
            u_raw = grp["user_id"].to_numpy()
            out_uid.append(
                u_raw if u_raw.dtype.kind == "f" else u_raw.astype("int64")
            )
            out_pid.append(grp["event_id"].to_numpy().astype("int64"))
            out_n.append((hi_idx - lo_idx).astype("int64"))
            # nansum = SQL COALESCE(SUM(value), 0): NULL click values are
            # skipped, and an all-NULL window sums to 0 — a plain .sum()
            # would poison the whole window with NaN
            out_val.extend(
                round(float(np.nansum(cval[l:h])), 4) if h > l else 0.0
                for l, h in zip(lo_idx, hi_idx)
            )
        uid_cat = np.concatenate(out_uid)
        return pd.DataFrame(
            {
                "user_id": pd.array(uid_cat, dtype="Int64")
                if uid_cat.dtype.kind == "f"
                else uid_cat,
                "purchase_id": np.concatenate(out_pid),
                "n_prior_clicks": np.concatenate(out_n),
                "click_value": out_val,
            }
        )[names]

    return (
        clicks.groupBy("bucket")
        .cogroup(purchases.groupBy("bucket"))
        .applyInPandas(attribute, out_schema)
    )


@query(
    "udf_sql_registered",
    oracle="""
    SELECT r_name,
           (length(r_name) - length(translate(lower(r_name), 'aeiou', '')))::BIGINT
             AS n_vowels
    FROM region
    """,
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-facing UDF surface: ``spark.udf.register`` makes a Python
    function callable from SQL strings, completing the extension-point
    matrix (DataFrame-side UDFs are demonstrated by udf_scalar_vowels).
    Same deliberate-demo contract as that query: row-at-a-time Python on
    the 5-row region table ONLY (allow-listed in plan hygiene); anything
    hot-path belongs in pandas_udf. The oracle recomputes the vowel count
    with pure SQL string functions — the UDF must agree with the
    built-in-only formulation."""
    cat = Catalog(spark, sf_dir)
    spark.udf.register(
        "py_vowel_count",
        lambda s: sum(s.lower().count(v) for v in "aeiou") if s else 0,
        "long",
    )
    # statement-scoped table arg; the UDF registration itself is the
    # session-global surface under demonstration
    return spark.sql(
        "SELECT r_name, py_vowel_count(r_name) AS n_vowels FROM {region}",
        region=cat.region,
    )
