"""Differential fuzz of the events-reading oracle pairs on an
ADVERSARIAL event log the fixtures never contain: timestamps exactly on
hour/day/week boundaries, identical-timestamp ties, exact duplicate
rows under distinct event_ids, sessions exactly at the gap threshold,
single-event users, a constant-rate event type, malformed / non-object /
null JSON props, empty-string and unicode event types, zero / negative /
NULL values. Every oracle-paired query whose SQL touches ONLY the events
table runs on both engines with the driver's compare rules — window
inclusion boundaries, keep-first tie-breaks, and JSON fallbacks are the
classic cross-engine divergence surface.

The streaming stream_* pairs replay the same parquet through
availableNow triggers, so this also pins streaming semantics on
boundary data.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import TABLES, rows_to_multiset

# (event_id, ts, user_id, event_type, value, props)
ADVERSARIAL_EVENTS = [
    # user 1: a complete signup→click→purchase funnel, clean
    (0, "2024-01-01 00:09:58.778549", 1, "signup", 10.0, '{"k": 1}'),
    (1, "2024-01-01 00:16:06.738090", 1, "click", 5.5, '{"k": 2}'),
    (2, "2024-01-01 00:30:00.000000", 1, "purchase", 99.99, '{"k": 3}'),
    # user 2: purchase BEFORE click (out-of-order funnel)
    (3, "2024-01-01 01:00:00.000000", 2, "purchase", 50.0, '{"k": 4}'),
    (4, "2024-01-01 02:00:00.000000", 2, "click", 1.0, '{"k": 5}'),
    # exact hour boundaries: both endpoints of [01:00, 02:00)
    (5, "2024-01-01 01:00:00.000000", 3, "click", 2.0, '{"k": 6}'),
    (6, "2024-01-01 01:59:59.999999", 3, "click", 3.0, '{"k": 7}'),
    (7, "2024-01-01 02:00:00.000000", 3, "click", 4.0, '{"k": 8}'),
    # identical-timestamp tie for one user, distinct event_ids
    (8, "2024-01-01 03:00:00.000000", 4, "click", 1.0, '{"k": 9}'),
    (9, "2024-01-01 03:00:00.000000", 4, "click", 2.0, '{"k": 10}'),
    # exact duplicate payload under a new event_id (dedup target)
    (10, "2024-01-01 03:00:00.000000", 4, "click", 1.0, '{"k": 9}'),
    # session gap EXACTLY at a 30-minute threshold
    (11, "2024-01-01 04:00:00.000000", 5, "click", 1.0, '{"k": 11}'),
    (12, "2024-01-01 04:30:00.000000", 5, "click", 1.0, '{"k": 12}'),
    (13, "2024-01-01 05:00:00.000001", 5, "click", 1.0, '{"k": 13}'),
    # single-event user
    (14, "2024-01-02 00:00:00.000000", 6, "signup", 0.0, '{"k": 14}'),
    # constant-rate type: exactly 2 per hour for 3 hours (sd = 0)
    (15, "2024-01-02 01:10:00.000000", 7, "steady", 1.0, '{"k": 15}'),
    (16, "2024-01-02 01:40:00.000000", 7, "steady", 1.0, '{"k": 16}'),
    (17, "2024-01-02 02:10:00.000000", 7, "steady", 1.0, '{"k": 17}'),
    (18, "2024-01-02 02:40:00.000000", 7, "steady", 1.0, '{"k": 18}'),
    (19, "2024-01-02 03:10:00.000000", 7, "steady", 1.0, '{"k": 19}'),
    (20, "2024-01-02 03:40:00.000000", 7, "steady", 1.0, '{"k": 20}'),
    # malformed / non-object / empty / null-valued JSON props
    (21, "2024-01-03 00:00:00.000000", 8, "error", -1.0, "{not json"),
    (22, "2024-01-03 00:10:00.000000", 8, "error", 0.0, "[1, 2, 3]"),
    (23, "2024-01-03 00:20:00.000000", 8, "error", None, ""),
    (24, "2024-01-03 00:30:00.000000", 8, "error", 7.0, '{"k": null}'),
    (25, "2024-01-03 00:40:00.000000", 8, "error", 8.0, None),
    (26, "2024-01-03 00:50:00.000000", 8, "error", 9.0, '{"other": 5}'),
    # empty-string and unicode event types
    (27, "2024-01-04 00:00:00.000000", 9, "", 1.0, '{"k": 27}'),
    (28, "2024-01-04 00:05:00.000000", 9, "点击", 2.0, '{"k": 28}'),
    # week boundary: Sunday 23:59:59 vs Monday 00:00:00 (cohort weeks)
    (29, "2024-01-07 23:59:59.000000", 10, "signup", 1.0, '{"k": 29}'),
    (30, "2024-01-08 00:00:00.000000", 10, "click", 1.0, '{"k": 30}'),
    (31, "2024-01-15 00:00:00.000000", 10, "click", 1.0, '{"k": 31}'),
    # negative and zero values for sums
    (32, "2024-01-05 12:00:00.000000", 11, "purchase", -42.5, '{"k": 32}'),
    (33, "2024-01-05 12:30:00.000000", 11, "purchase", 0.0, '{"k": 33}'),
    # a click then purchase within the attribution window across users
    (34, "2024-01-06 10:00:00.000000", 12, "click", 1.0, '{"k": 34}'),
    (35, "2024-01-06 10:59:59.000000", 12, "purchase", 75.0, '{"k": 35}'),
    (36, "2024-01-06 11:00:01.000000", 12, "purchase", 85.0, '{"k": 36}'),
    # NULL-valued click inside a purchase's attribution window: SQL
    # SUM skips the NULL (COALESCE → 0) — a naive numpy slice-sum
    # would propagate NaN (caught by the random fuzz, seed 89)
    (37, "2024-01-06 12:00:00.000000", 13, "click", None, '{"k": 37}'),
    (38, "2024-01-06 12:10:00.000000", 13, "purchase", 20.0, '{"k": 38}'),
    # NULL ts / NULL user_id / all-NULL: routine in scraped logs; windows,
    # sessionization and attribution must agree on both engines (probe:
    # all pairs already matched — the null-ordering hardening covers it)
    (39, None, 14, "click", 1.0, '{"k": 39}'),
    (40, "2024-01-06 13:00:00.000000", None, "click", 2.0, '{"k": 40}'),
    (41, None, None, None, None, None),
    # NULL-ts click for a user who HAS purchases: event 39's NULL-ts
    # click hashed to a purchase-free cogroup bucket, so the unix_micros
    # NaN->int64 crash went unexercised (caught by the round-3 advice).
    # User 13 owns purchase 38, so this click shares its bucket.
    (42, None, 13, "click", 3.0, '{"k": 42}'),
    # NULL-ts purchase: the attribution LEFT JOIN predicate is NULL ->
    # the row must still be EMITTED with 0 clicks / 0.0 value
    (43, None, 12, "purchase", 10.0, '{"k": 43}'),
    # NULL-user purchase: pandas groupby(dropna=True) would silently
    # delete the row; the oracle emits it (NULL never equi-joins)
    (44, "2024-01-06 13:30:00.000000", None, "purchase", 5.0, '{"k": 44}'),
]

OTHER_TABLES = [t for t in TABLES if t != "events"]


def _events_only_pairs():
    import re

    names = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        sql = q.oracle.lower()
        if "events" not in sql:
            continue
        # word-boundary match: "part" must not hit "PARTITION BY"
        if any(re.search(rf"\b{t}\b", sql) for t in OTHER_TABLES):
            continue
        names.append(name)
    assert len(names) >= 15, names
    return names


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_events")
    df = spark.createDataFrame(
        ADVERSARIAL_EVENTS,
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.repartition(2).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)


@pytest.mark.parametrize("name", _events_only_pairs())
def test_events_only_oracle_pair_on_adversarial_log(spark, adversarial_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, adversarial_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/events.parquet/*.parquet')"
    )
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
    if sm != dm:
        only_s = {k: c for k, c in sm.items() if dm.get(k) != c}
        only_d = {k: c for k, c in dm.items() if sm.get(k) != c}
        raise AssertionError(
            f"{name}: value mismatch on adversarial events; "
            f"spark-only sample {list(only_s.items())[:3]}; "
            f"duck-only sample {list(only_d.items())[:3]}"
        )


@pytest.fixture(scope="module")
def far_future_dir(spark, tmp_path_factory):
    """Events log with a corrupt far-future clock (year 2400 — past
    pandas' datetime64[ns] ceiling of 2262-04-11). Any operator that
    ships a raw timestamp column through Arrow→pandas dies on this row
    with ArrowInvalid; the pandas-path operators therefore carry
    timestamps as int64 epoch-micros (or project `ts` away) instead."""
    d = tmp_path_factory.mktemp("far_future_events")
    rows = [
        # clean 30-min attribution pair for user 1
        (0, "2024-01-01 10:00:00.000000", 1, "click", 5.0, "{}"),
        (1, "2024-01-01 10:10:00.000000", 1, "purchase", 50.0, "{}"),
        # the corrupt clock: a click in year 2400 for user 2
        (2, "2400-01-01 00:00:00.000000", 2, "click", 1.0, "{}"),
        # and a purchase whose window must NOT include the 2400 click
        (3, "2024-01-01 11:00:00.000000", 2, "purchase", 9.0, "{}"),
        # purchase in 2400: its window reaches the 2400 click
        (4, "2400-01-01 00:05:00.000000", 2, "purchase", 7.0, "{}"),
        # pre-epoch clock (negative epoch-micros): a 19th-century pair
        (5, "1899-12-31 23:00:00.000000", 3, "click", 2.0, "{}"),
        (6, "1899-12-31 23:10:00.000000", 3, "purchase", 30.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.repartition(2).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)


def test_cogroup_attribution_survives_far_future_clock(spark, far_future_dir):
    out = REGISTRY["cogroup_click_attribution"].fn(spark, far_future_dir)
    got = {
        r["purchase_id"]: (r["n_prior_clicks"], r["click_value"])
        for r in out.collect()
    }
    assert got[1] == (1, 5.0)  # clean pair attributed
    assert got[3] == (0, 0.0)  # 2400 click NOT in a 2024 window
    assert got[4] == (1, 1.0)  # 2400 purchase sees the 2400 click
    assert got[6] == (1, 2.0)  # pre-epoch (negative micros) pair attributed


def test_stateful_stream_survives_far_future_clock(spark, far_future_dir):
    from rws_data_ingester_spark.streaming import jobs

    out = jobs.run_to_memory(
        jobs.stateful_running_totals(spark, far_future_dir), output_mode="update"
    )
    got = {r["user_id"]: (r["total_value"], r["n_events"]) for r in out.collect()}
    assert got[1] == (55.0, 2)
    assert got[2] == (17.0, 3)
    assert got[3] == (32.0, 2)


# --------------------------------------------------------------------------
# Pathological JSON in props: 100k-deep nesting, 20k keys (~300 KB), a
# 5000-digit number, a 20k-deep single-key chain, a 300 KB string value.
# Found: ANSI CAST of an extracted string value killed scalar_json_funcs
# (now try_cast on both engines) and variant_get's INVALID_VARIANT_CAST
# killed scalar_variant_funcs (now try_variant_get) — one corrupt row
# must degrade to NULL, never fail a 100 TB scan. Every events-only pair
# runs against this corpus with the driver's compare rules, EXCEPT the
# two JSON-scalar queries, which hit documented engine-capability
# deviations here: Spark's variant parser rejects 100k-deep nesting and
# 5000-digit numbers (try_parse_json -> NULL; the desired degradation)
# where DuckDB's JSON accepts them, and Spark's variant renders object
# keys sorted where DuckDB preserves insertion order. Those two get a
# dedicated pinned-Spark-semantics test below instead.
# --------------------------------------------------------------------------
_JSON_CAPABILITY_DEVIATIONS = {"scalar_json_funcs", "scalar_variant_funcs"}
def _pathological_json_events():
    deep = "[" * 50_000 + "]" * 50_000
    wide = "{" + ",".join(f'"k{i}": {i}' for i in range(20_000)) + "}"
    hugenum = '{"k": ' + "9" * 5_000 + "}"
    deepobj = '{"k": ' * 20_000 + "1" + "}" * 20_000
    bigstr = '{"k": "' + "x" * 300_000 + '"}'
    return [
        (0, "2024-01-01 00:00:00", 1, "click", 1.0, deep),
        (1, "2024-01-01 00:10:00", 1, "click", 2.0, wide),
        (2, "2024-01-01 00:20:00", 2, "purchase", 3.0, hugenum),
        (3, "2024-01-01 00:30:00", 2, "click", 4.0, deepobj),
        (4, "2024-01-01 00:40:00", 3, "signup", 5.0, bigstr),
        (5, "2024-01-01 00:50:00", 3, "click", 6.0, '{"k": 7}'),
    ]


@pytest.fixture(scope="module")
def pathological_json_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pathological_json")
    df = spark.createDataFrame(
        _pathological_json_events(),
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.repartition(2).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    [n for n in _events_only_pairs() if n not in _JSON_CAPABILITY_DEVIATIONS],
)
def test_events_only_oracle_pair_on_pathological_json(
    spark, pathological_json_dir, name
):
    q = REGISTRY[name]
    sdf = q.fn(spark, pathological_json_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{pathological_json_dir}/events.parquet/*.parquet')"
    )
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
    assert sm == dm, f"{name}: value mismatch on pathological JSON"


@pytest.mark.parametrize("name", sorted(_JSON_CAPABILITY_DEVIATIONS))
def test_json_scalars_degrade_not_crash_on_pathological_json(
    spark, pathological_json_dir, name
):
    """Pinned Spark semantics on beyond-capability JSON: the job SURVIVES
    (pre-fix, ANSI CAST / INVALID_VARIANT_CAST killed it on one row),
    payloads past the variant parser's limits degrade to invalid/NULL,
    and the one normal row still extracts its value."""
    out = {r["event_id"]: r for r in REGISTRY[name].fn(spark, pathological_json_dir).collect()}
    assert len(out) == 6
    if name == "scalar_json_funcs":
        assert out[5]["k_path"] == 7 and out[5]["is_valid"] is True
        assert out[4]["is_valid"] is True      # 300 KB string value is FINE
        assert out[4]["k_path"] is None        # string k -> NULL, not a crash
        for eid in (0, 2, 3):                  # beyond variant capability
            assert out[eid]["is_valid"] is False
    else:
        assert out[5]["k_long"] == 7
        assert out[4]["k_long"] is None
        for eid in (0, 2, 3):
            assert out[eid]["props_roundtrip"] is None
