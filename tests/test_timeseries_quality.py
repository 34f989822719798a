"""Semantic property tests for the time-series batch (gap-fill, cohort
retention, SCD2 intervals) plus histogram and the quality audit — oracle
parity runs separately in test_oracle_parity.py.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def test_gapfill_grid_is_complete_and_gaps_are_empty(spark):
    ev = Catalog(spark, SF_DIR).events
    n_types = ev.select("event_type").distinct().count()
    out = REGISTRY["timeseries_gapfill"].fn(spark, SF_DIR).collect()
    hours = {r["hour_start"] for r in out}
    # full grid: every type x every spine hour
    assert len(out) == n_types * len(hours)
    for r in out:
        if r["is_gap"] == 1:
            assert r["n_events"] == 0
        else:
            assert r["n_events"] > 0
            # non-gap hours always have a filled value (their own average)
            assert r["value_filled"] is not None


def test_gapfill_locf_carries_last_value(spark):
    out = REGISTRY["timeseries_gapfill"].fn(spark, SF_DIR).collect()
    by_type = defaultdict(list)
    for r in out:
        by_type[r["event_type"]].append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r["hour_start"])
        last_seen = None
        for r in rows:
            if r["is_gap"] == 0:
                last_seen = r["value_filled"]
            else:
                assert r["value_filled"] == last_seen


def test_cohort_week_zero_equals_cohort_size(spark):
    ev = Catalog(spark, SF_DIR).events
    out = REGISTRY["cohort_retention"].fn(spark, SF_DIR).collect()
    zero = {r["cohort_week"]: r["n_active"] for r in out if r["week_offset"] == 0}
    sizes = {
        r["cohort_week"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.date_format(F.date_trunc("week", F.min("ts")), "yyyy-MM-dd").alias("cohort_week"))
        .groupBy("cohort_week")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # week 0 activity == cohort size (every user is active in their first week)
    assert zero == sizes
    for r in out:
        assert r["week_offset"] >= 0
        assert r["n_active"] <= sizes[r["cohort_week"]]


def test_scd2_intervals_partition_each_user_timeline(spark):
    out = REGISTRY["scd2_intervals"].fn(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in out:
        by_user[r["user_id"]].append(r)
    for user, rows in by_user.items():
        currents = [r for r in rows if r["is_current"] == 1]
        assert len(currents) == 1, f"user {user}: {len(currents)} open intervals"
        closed = sorted(
            (r for r in rows if r["valid_to"] is not None), key=lambda r: r["valid_from"]
        )
        # contiguity: each interval closes where the next opens
        for a, b in zip(closed, closed[1:]):
            assert a["valid_to"] == b["valid_from"]
        # no zero-advance change points collapse to the same type twice in a row
        ordered = sorted(rows, key=lambda r: (r["valid_to"] is None, r["valid_from"]))
        for a, b in zip(ordered, ordered[1:]):
            assert a["event_type"] != b["event_type"] or a["valid_from"] != b["valid_from"]


def test_histogram_partitions_all_orders(spark):
    o = Catalog(spark, SF_DIR).orders
    out = REGISTRY["agg_histogram"].fn(spark, SF_DIR).collect()
    assert sum(r["n_orders"] for r in out) == o.count()
    for r in out:
        assert r["bucket_hi"] - r["bucket_lo"] == 25000.0


def test_quality_audit_clean_fixture(spark):
    vals = {
        r["check_name"]: r["value"]
        for r in REGISTRY["data_quality_audit"].fn(spark, SF_DIR).collect()
    }
    assert vals["orders_rowcount"] > 0
    for check in (
        "orderkey_nulls",
        "orderkey_dups",
        "totalprice_nonpositive",
        "orderdate_out_of_range",
        "orphan_custkeys",
    ):
        assert vals[check] == 0.0, f"{check}: {vals[check]}"


def test_rolling_active_wau_bounds(spark):
    ev = Catalog(spark, SF_DIR).events
    n_users = ev.select("user_id").distinct().count()
    n_days = ev.select(F.date_trunc("day", "ts")).distinct().count()
    out = REGISTRY["engagement_rolling_active"].fn(spark, SF_DIR).collect()
    assert len(out) == n_days  # one row per day in the observed range
    for r in out:
        assert r["dau"] <= r["wau"] <= n_users
    # trailing window ramps up: by day 7 the WAU must exceed any single DAU
    by_day = sorted(out, key=lambda r: r["day"])
    if len(by_day) > 7:
        assert by_day[7]["wau"] >= max(r["dau"] for r in by_day[:8])


def test_wow_trend_first_week_has_no_delta(spark):
    out = REGISTRY["trend_wow_revenue"].fn(spark, SF_DIR).collect()
    by_week = sorted(out, key=lambda r: r["week_start"])
    assert by_week[0]["wow_delta"] is None and by_week[0]["wow_pct"] is None
    assert all(r["wow_delta"] is not None for r in by_week[1:])
    o = Catalog(spark, SF_DIR).orders
    total = o.agg(F.round(F.sum("o_totalprice"), 0)).collect()[0][0]
    assert abs(sum(r["revenue"] for r in out) - total) < 1.0


def test_hll_sketch_merge_matches_exact_within_5pct(spark):
    row = REGISTRY["agg_hll_sketch_merge"].fn(spark, SF_DIR).collect()[0]
    est, exact = row["est_distinct_users"], row["exact_distinct_users"]
    assert abs(est - exact) / exact < 0.05, (est, exact)
    assert row["n_daily_sketches"] > 1


def test_hll_union_of_dailies_equals_direct_sketch(spark):
    """Merging per-day sketches must estimate the same as sketching the
    whole stream in one pass — the property that makes sketches
    incrementally maintainable."""
    ev = Catalog(spark, SF_DIR).events
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    merged = (
        ev.groupBy(F.date_trunc("day", "ts"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert direct == merged


def test_weighted_reservoir_k_per_group_and_bias(spark):
    d = Catalog(spark, SF_DIR).documents
    out = REGISTRY["sample_weighted_reservoir"].fn(spark, SF_DIR).collect()
    per_lang = defaultdict(list)
    for r in out:
        per_lang[r["lang"]].append(r)
    n_langs = d.select("lang").distinct().count()
    assert len(per_lang) == n_langs
    for lang, rows in per_lang.items():
        assert len(rows) == min(5, d.filter(F.col("lang") == lang).count())
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    # length-weighted draw must overrepresent long documents overall
    corpus_avg = d.agg(F.avg("n_chars")).collect()[0][0]
    sample_avg = sum(r["n_chars"] for r in out) / len(out)
    assert sample_avg > corpus_avg


def test_anomaly_zscore_flags_match_threshold(spark):
    out = REGISTRY["timeseries_anomaly_zscore"].fn(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["is_anomaly"] == (1 if abs(r["zscore"]) >= 2.0 else 0) or (
            # rounding display at 2dp can disagree with the unrounded cut
            # only within half an ulp of the threshold
            abs(abs(r["zscore"]) - 2.0) <= 0.005
        )
    # a healthy detector flags a small minority, not zero and not half
    frac = sum(r["is_anomaly"] for r in out) / len(out)
    assert 0.0 < frac < 0.3, frac


def test_anomaly_zscore_constant_series_cross_engine(spark, tmp_path):
    """A type whose hourly counts are all identical has stddev 0; without
    the nullif guard Spark's Divide yields NULL while DuckDB's IEEE
    division yields inf/nan, so the engines diverge exactly there. Pin:
    both return NULL zscore and is_anomaly=0 for every constant-series
    cell (latent-data regression, ADVICE round 2)."""
    import duckdb

    rows = [
        # 'steady': exactly 2 events in each of 3 hours → sd = 0
        *[("steady", f"2024-01-01 0{h}:{m}:00") for h in (0, 1, 2) for m in (10, 40)],
        # 'vary': distinct hourly counts so the query also has normal cells
        ("vary", "2024-01-01 00:05:00"),
        *[("vary", f"2024-01-01 01:{m}:00") for m in (5, 15, 25)],
    ]
    df = spark.createDataFrame(
        [(t, ts) for t, ts in rows], "event_type string, ts_s string"
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"),
             F.lit(1).alias("user_id"))
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = REGISTRY["timeseries_anomaly_zscore"].fn(spark, str(tmp_path)).collect()
    steady = [r for r in out if r["event_type"] == "steady"]
    assert len(steady) == 3
    assert all(r["zscore"] is None and r["is_anomaly"] == 0 for r in steady)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    drows = con.execute(REGISTRY["timeseries_anomaly_zscore"].oracle).fetchall()
    dsteady = [r for r in drows if r[0] == "steady"]
    assert len(dsteady) == 3
    assert all(r[3] is None and r[4] == 0 for r in dsteady)


def test_wau_hll_tracks_exact_within_5pct(spark):
    """The sketch-rollup WAU must stay within HLL error of the exact
    contribution-day form on every observation day."""
    exact = {
        r["day"]: r["wau"]
        for r in REGISTRY["engagement_rolling_active"].fn(spark, SF_DIR).collect()
    }
    est = {
        r["day"]: r["wau_est"]
        for r in REGISTRY["engagement_wau_hll"].fn(spark, SF_DIR).collect()
    }
    assert set(est) == set(exact)
    for day, e in est.items():
        assert abs(e - exact[day]) / exact[day] < 0.05, (day, e, exact[day])
    # early days merge fewer than 7 sketches; steady state merges exactly 7
    merged = {
        r["day"]: r["n_sketches_merged"]
        for r in REGISTRY["engagement_wau_hll"].fn(spark, SF_DIR).collect()
    }
    assert max(merged.values()) <= 7


def test_wow_trend_zero_revenue_week_cross_engine(spark, tmp_path):
    """A week whose revenue sums to exactly 0 makes the next week's
    wow_pct an x/0: Spark's Divide yields NULL while DuckDB's IEEE
    division yields inf, so without the nullif guard the engines diverge
    on such data. Pin: both emit NULL wow_pct for the week after a
    zero-revenue week (same latent-divide class as the anomaly-zscore
    sd guard; fixtures never contain a zero week)."""
    import duckdb

    rows = [
        ("2024-01-01", 100.0),  # week 1
        ("2024-01-08", 0.0),    # week 2: rev == 0
        ("2024-01-09", 0.0),
        ("2024-01-15", 50.0),   # week 3: wow_pct vs 0 → NULL
    ]
    df = spark.createDataFrame(
        [(i, d, p) for i, (d, p) in enumerate(rows)],
        "o_orderkey long, d string, o_totalprice double",
    ).select(
        "o_orderkey",
        F.col("d").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    out = {r["week_start"]: r for r in REGISTRY["trend_wow_revenue"].fn(spark, str(tmp_path)).collect()}
    assert out["2024-01-15"]["wow_pct"] is None
    assert out["2024-01-08"]["wow_pct"] == -100.0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    drows = {r[0]: r for r in con.execute(REGISTRY["trend_wow_revenue"].oracle).fetchall()}
    assert drows["2024-01-15"][4] is None
    assert drows["2024-01-08"][4] == -100.0


def test_text_ratio_guards_on_degenerate_docs_cross_engine(spark, tmp_path):
    """Empty and whitespace/punctuation-only documents hit the two real
    zero denominators in the text suite: space_ratio's length(text) and
    chars_per_token's BPE token count. Pin that both engines return NULL
    there (Spark x/0 → NULL, DuckDB → inf/nan without the guard) and
    that the split-based ratios stay non-NULL (split('', ' ') → ['']
    in both engines)."""
    import duckdb

    docs = [
        (1, "", "en", "web", 0),
        (2, "   ", "en", "web", 3),          # whitespace-only → 0 BPE tokens
        (3, "normal text here", "en", "web", 16),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )

    q = {r["doc_id"]: r for r in REGISTRY["text_quality_scores"].fn(spark, str(tmp_path)).collect()}
    dq = {r[0]: r for r in con.execute(REGISTRY["text_quality_scores"].oracle).fetchall()}
    assert q[1]["space_ratio"] is None and dq[1][3] is None
    assert q[2]["space_ratio"] == 1.0 and dq[2][3] == 1.0
    assert q[1]["distinct_ratio"] == 1.0 and dq[1][2] == 1.0  # [''] → 1/1

    b = {r["doc_id"]: r for r in REGISTRY["text_token_count_bpe"].fn(spark, str(tmp_path)).collect()}
    db = {r[0]: r for r in con.execute(REGISTRY["text_token_count_bpe"].oracle).fetchall()}
    for k in (1, 2):
        assert b[k]["bpe_tokens"] == 0 and db[k][2] == 0
        assert b[k]["chars_per_token"] is None and db[k][3] is None
    assert b[3]["chars_per_token"] == db[3][3] and b[3]["chars_per_token"] is not None
