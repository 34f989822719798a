"""Differential fuzz on PATHOLOGICAL DISTRIBUTIONS — the dimension the
other suites never stress. The random warehouse is hazard-dense but
distributionally mild (small uniform keys, no skew, 2024-era clocks, at
most one planted duplicate); real corpora are the opposite. This suite
builds one deterministic warehouse that is distribution-hostile:

- HEAVY SKEW: one user owns ~5/6 of the event log (the hot-key shape
  salting/AQE exist for), one order carries 60 lineitems, one customer
  places 30 orders, one (part, supplier) pair dominates lineitem.
- MASSIVE DUPLICATION: 150 byte-identical documents (LSH puts them all
  in the SAME band buckets — the within-bucket all-pairs worst case;
  connected components gets one 150-clique), 40 identical embedding
  vectors (every cosine tie must break deterministically on both
  engines), 30 identical event payloads under distinct event_ids
  (keep-first dedup ties at scale).
- EPOCH-BOUNDARY CLOCKS: the event log straddles 1970-01-01 (negative
  epoch micros — sessionization, watermarks, as-of and attribution
  windows must not assume unsigned time), kept inside a 10-day span so
  hour-spine operators (gap-fill) stay bounded. A few orders sit at
  1965 / 2038 (32-bit-time boundary) among the normal 1992-1998 dates.
- INT64-EXTREME KEYS: a customer/user at 2**61 and a user at -1 — join
  hashing, pmod bucketing and window partitioning must not care.

Every oracle-paired query runs on both engines under the driver's
compare rules; every rows-only query must execute and be deterministic.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import TABLES, rows_to_multiset

EXCLUDED = {"source_text_roundtrip"}

# DOCUMENTED ENGINE DEVIATION (discovered by this suite): Spark
# Structured Streaming initializes the watermark at EPOCH ZERO on a
# fresh query, so events with pre-1970 event times are born late — the
# stateful operators (dropDuplicatesWithinWatermark, session_window
# state) silently drop them in the very first micro-batch, while the
# batch twins and the SQL oracle process them like any other rows. This
# is hard-wired engine behavior, not a plan defect; the two streaming
# pairs are excluded from the generic sweep and the exact deviation is
# pinned by test_streaming_drops_pre_epoch_rows_* below (batch twins
# session_window_native / session_window_islands / dedup_first_event
# stay IN the sweep and agree with the oracle on the same data).
STREAMING_PRE_EPOCH = {"stream_dedup_within_watermark", "stream_session_windows"}

ORACLE_PAIRS = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None and n not in EXCLUDED | STREAMING_PRE_EPOCH
)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)

HOT_USER = 7
BIG_CUST = 2**61  # int64-extreme customer/user key
DUP_TEXT = "the quick brown fox jumps over the lazy dog again and again"


def _gen_pathological():
    region = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    nation = [(i, f"NATION_{i % 5}", i % len(region)) for i in range(8)]

    customer = [
        (k, f"Customer#{k}", k % 8, float(k * 25) / 4.0, "BUILDING")
        for k in range(1, 21)
    ]
    customer.append((BIG_CUST, "Customer#huge", 3, 1000.0, "MACHINERY"))

    supplier = [(k, f"Supplier#{k}", k % 8, float(k) * 0.25) for k in range(1, 9)]
    part = [
        (k, f"part {k}", f"Brand#{1 + k % 5}",
         ["PROMO", "STANDARD", "ECONOMY"][k % 3], k % 50, 100.0 + k)
        for k in range(1, 16)
    ]

    # orders: customer 1 places 30 of the 80; extreme clocks mixed in
    orders = []
    for k in range(60):
        ck = 1 if k < 30 else 2 + (k % 19)
        orders.append((100 + k, ck, ["O", "F", "P"][k % 3],
                       float(1000 + 25 * k) / 4.0,
                       f"199{2 + k % 7}-{1 + k % 12:02d}-15 00:00:00",
                       ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                        "5-LOW"][k % 5]))
    orders.append((900, BIG_CUST, "O", 500.0, "1965-03-01 12:00:00", "2-HIGH"))
    orders.append((901, BIG_CUST, "F", 750.25, "2038-01-19 03:14:07", "5-LOW"))
    orders.append((902, 3, "O", 0.0, "1970-01-01 00:00:00", "1-URGENT"))

    # lineitem: order 100 carries 60 lines; one hot (part, supplier) pair
    lineitem = []
    for ln in range(1, 61):
        lineitem.append((100, 1, 1, ln, float(ln % 10 + 1), 250.0,
                         0.0625, 0.0, "N", "O",
                         f"1995-0{1 + ln % 9}-10 00:00:00"))
    for k in range(160):
        ok = 101 + (k % 59)
        lineitem.append((ok, 2 + k % 14, 1 + k % 8, 1 + k // 59,
                         float(1 + k % 50), float(100 + k) / 4.0,
                         [0.0, 0.0625, 0.125][k % 3], [0.0, 0.0625][k % 2],
                         ["A", "N", "R"][k % 3], ["O", "F"][k % 2],
                         f"199{3 + k % 5}-{1 + k % 12:02d}-20 00:00:00"))

    # events: 600 rows straddling the epoch; user 7 owns 500 of them.
    # 30 byte-identical payloads (distinct event_ids) for dedup ties.
    events = []
    eid = 0
    for k in range(500):
        # ten days around 1970-01-01: 1969-12-27 .. 1970-01-05
        day = 27 + (k % 10)  # 27..36 -> wraps into January
        date = (f"1969-12-{day:02d}" if day <= 31
                else f"1970-01-{day - 31:02d}")
        events.append((eid, f"{date} {k % 24:02d}:{(7 * k) % 60:02d}:"
                       f"{(13 * k) % 60:02d}.{(k * 101) % 1000000:06d}",
                       HOT_USER,
                       ["click", "click", "click", "purchase", "signup"][k % 5],
                       float(k % 40) / 4.0, '{"k": 1}'))
        eid += 1
    for k in range(30):  # identical payload block, distinct ids
        events.append((eid, "1970-01-02 00:00:00", 3, "click", 1.0, '{"k": 9}'))
        eid += 1
    for k in range(70):
        uid = [-1, 2, 3, 4, 5, 6, BIG_CUST][k % 7]
        day = 1 + k % 5
        events.append((eid, f"1970-01-{day:02d} {k % 24:02d}:30:00",
                       uid, ["click", "purchase", "signup", "steady"][k % 4],
                       float(k) / 4.0, '{"k": 2}'))
        eid += 1

    # documents: 150 identical + 20 distinct (incl. empty / whitespace)
    documents = [(i, DUP_TEXT, "en", "web", len(DUP_TEXT)) for i in range(150)]
    for i in range(150, 168):
        t = f"distinct doc {i} with words " + "token " * (i % 7)
        documents.append((i, t, ["en", "fr", "de"][i % 3],
                          ["web", "wiki", "books"][i % 3], len(t)))
    documents.append((168, "", "en", "web", 0))
    documents.append((169, "   ", "en", "wiki", 3))

    # embeddings: 40 identical vectors + structured distinct ones.
    # 3-decimal components (binary-comparable after ROUND on both engines).
    dup_vec = [0.125, -0.5, 0.25, 0.75, -0.125, 0.0, 0.5, -0.25]
    embeddings = [(i, list(dup_vec), i % 3) for i in range(40)]
    for i in range(40, 56):
        vec = [round(((i * 7 + j * 13) % 21 - 10) / 8.0, 3) for j in range(8)]
        embeddings.append((i, vec, i % 4))
    embeddings.append((56, [0.0] * 8, 1))          # zero norm
    embeddings.append((57, None, 2))               # NULL
    embeddings.append((58, [float("nan")] + [1.0] * 7, 0))  # NaN
    embeddings.append((59, [1.0] * 4, 3))          # off-modal dimension

    return {
        "region": region, "nation": nation, "customer": customer,
        "supplier": supplier, "part": part, "orders": orders,
        "lineitem": lineitem, "events": events, "documents": documents,
        "embeddings": embeddings,
    }


_SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": "c_custkey long, c_name string, c_nationkey int, "
                "c_acctbal double, c_mktsegment string",
    "supplier": "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    "part": "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
    "documents": "doc_id long, text string, lang string, source string, n_chars long",
    "embeddings": "vec_id long, embedding array<float>, label int",
}


@pytest.fixture(scope="module")
def patho_dir(spark, tmp_path_factory):
    tables = _gen_pathological()
    d = tmp_path_factory.mktemp("pathological_wh")
    for t, schema in _SCHEMAS.items():
        spark.createDataFrame(tables[t], schema).repartition(2).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    spark.createDataFrame(
        tables["orders"],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    ).repartition(2).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        tables["lineitem"],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate_s string",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        F.col("l_shipdate_s").cast("timestamp").alias("l_shipdate"),
    ).repartition(2).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        tables["events"],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).repartition(2).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)


@pytest.mark.parametrize("name", ORACLE_PAIRS)
def test_oracle_pair_on_pathological_warehouse(spark, patho_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, patho_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{patho_dir}/{t}.parquet/*.parquet')"
        )
    res = con.execute(q.oracle)
    dcols = [x[0] for x in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    sm = rows_to_multiset(scols, srows, sig=6)
    dm = rows_to_multiset(dcols, drows, sig=6)
    if sm != dm:
        only_s = {k: c for k, c in sm.items() if dm.get(k) != c}
        only_d = {k: c for k, c in dm.items() if sm.get(k) != c}
        raise AssertionError(
            f"{name}: value mismatch on pathological warehouse; "
            f"spark-only sample {list(only_s.items())[:3]}; "
            f"duck-only sample {list(only_d.items())[:3]}"
        )


def _oracle_rows(patho_dir: str, name: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{patho_dir}/{t}.parquet/*.parquet')"
        )
    res = con.execute(REGISTRY[name].oracle)
    return [x[0] for x in res.description], [tuple(r) for r in res.fetchall()]


@pytest.mark.parametrize("name,ts_col", [
    ("stream_dedup_within_watermark", "ts"),
    ("stream_session_windows", "session_start"),
])
def test_streaming_drops_pre_epoch_rows_and_nothing_else(
    spark, patho_dir, name, ts_col
):
    """Pins the STREAMING_PRE_EPOCH deviation exactly: on a log that
    straddles 1970-01-01, the streaming form must equal the oracle
    restricted to rows at/after the epoch, and every row it drops must
    be strictly pre-epoch — the fresh-query watermark starts at epoch
    zero, nothing else may go missing."""
    q = REGISTRY[name]
    sdf = q.fn(spark, patho_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    dcols, drows = _oracle_rows(patho_dir, name)
    assert sorted(scols) == sorted(dcols)

    i = dcols.index(ts_col)
    kept = [r for r in drows if r[i] is not None and str(r[i]) >= "1970-01-01"]
    dropped = [r for r in drows if not (r[i] is not None and str(r[i]) >= "1970-01-01")]
    assert dropped, "fixture must actually contain pre-epoch rows"
    assert rows_to_multiset(scols, srows, sig=6) == rows_to_multiset(
        dcols, kept, sig=6
    ), f"{name}: streaming output != oracle restricted to post-epoch rows"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_survives_pathological_warehouse(spark, patho_dir, name):
    """The skew/duplication worst cases must execute and be deterministic:
    150 identical docs put the LSH tiers' whole corpus in one band bucket
    and hand connected-components a 150-clique; 40 identical vectors tie
    every similarity; one user holds 5/6 of the event log."""
    df = REGISTRY[name].fn(spark, patho_dir)
    rows = df.collect()
    assert df.columns, f"{name}: no columns"
    rows2 = REGISTRY[name].fn(spark, patho_dir).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2)), (
        f"{name}: nondeterministic on pathological warehouse"
    )
