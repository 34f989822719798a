"""Differential fuzz of every oracle pair that reads ONLY the TPC-H-ish
star schema (region/nation/customer/supplier/part/orders/lineitem) on an
ADVERSARIAL micro-warehouse the generated fixtures never contain:

- exact ties on every ranking/top-k sort column (acctbal, totalprice,
  extendedprice, retailprice) — keep-first and LIMIT tie-breaks are the
  classic cross-engine nondeterminism surface;
- NULLs in measures (acctbal, retailprice, totalprice, quantity,
  discount) AND in a join key (c_nationkey) — Spark ASC defaults to
  NULLS FIRST while DuckDB defaults to NULLS LAST, so any unqualified
  ORDER BY over a nullable column diverges;
- zero and negative money amounts (sum cancellation → divide-by-zero in
  share-of-total shapes; log of non-positive in geometric means);
- discount exactly 0.0 and 1.0 (revenue terms collapse to 0);
- empty-string and unicode names/segments/types, LIKE/regex
  metacharacters (`%`, `_`) inside p_name;
- timestamps at year boundaries and with non-midnight time-of-day
  (date_trunc vs raw-timestamp grouping);
- referential-integrity violations: an order with no lineitems, a
  customer with no orders, a part and a supplier never sold, and an
  ORPHAN lineitem whose l_orderkey has no orders row (inner vs outer
  join semantics);
- duplicate natural names under distinct keys (two customers named
  "Customer#1", two nations named "NATION_0" in different regions).

Every such pair runs on BOTH engines with the driver's compare rules
(column names + row count + order-insensitive value multiset). This is
the local re-proof harness for the round-1 greens and the staged
round-4 window: the 87 pairs here are exactly the analytics/relational/
aggregate/window/scalar/connector surface those windows check.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from pyspark.sql import functions as F

from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import rows_to_multiset

TPCH = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
NON_TPCH = ("events", "documents", "embeddings")

# ---------------------------------------------------------------------------
# (r_regionkey, r_name) — one unicode region, one empty-string-named region
REGION = [
    (0, "AFRICA"),
    (1, "AMERICA"),
    (2, "ASIA"),
    (3, "EUROPE"),
    (4, "MIDDLE EAST"),
    (5, "ΝΈΑ ΖΗΛΑΝΔΊΑ"),
    (6, ""),
]

# (n_nationkey, n_name, n_regionkey) — nation 4 has no customers or
# suppliers; nations 0 and 5 share the name "NATION_0" in different regions.
NATION = [
    (0, "NATION_0", 0),
    (1, "NATION_1", 1),
    (2, "NATION_2", 2),
    (3, "NATION_3", 3),
    (4, "NATION_EMPTY", 5),
    (5, "NATION_0", 4),
]

# (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
CUSTOMER = [
    (1, "Customer#1", 0, 100.0, "BUILDING"),
    (2, "Customer#2", 0, 100.0, "BUILDING"),      # acctbal tie; NO orders
    (3, "Customer#3", 1, -42.5, "AUTOMOBILE"),    # negative balance
    (4, "Customer#4", 1, 0.0, "MACHINERY"),       # zero balance
    (5, "Customer#5", 2, None, "FURNITURE"),      # NULL balance, has orders
    (6, "Customer#6", 2, 9999999.99, "HOUSEHOLD"),
    (7, "Customer#7", 3, 55.5, ""),               # empty segment
    (8, "客户#8", 3, 55.5, "BUILDING"),            # unicode name, tie with 7
    (9, "Customer#9", None, 10.0, "BUILDING"),    # NULL nation FK
    (10, "Customer#1", 0, 200.0, "AUTOMOBILE"),   # duplicate name, new key
]

# (s_suppkey, s_name, s_nationkey, s_acctbal)
SUPPLIER = [
    (1, "Supplier#1", 0, 500.0),
    (2, "Supplier#2", 1, 500.0),    # acctbal tie
    (3, "Supplier#3", 2, -10.0),
    (4, "Supplier#4", 3, None),     # NULL balance
    (5, "Supplier#5", 0, 0.0),      # never ships a lineitem
    (6, "Supplier#6", 1, 250.0),
]

# (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
PART = [
    (1, "part alpha", "Brand#1", "PROMO", 10, 100.0),
    (2, "part beta", "Brand#1", "STANDARD", 10, 100.0),   # price+size tie
    (3, "part 100% _spec_", "Brand#2", "ECONOMY", 0, 50.0),  # LIKE metachars
    (4, "part delta", "Brand#3", "PROMO", 50, 0.0),       # zero price
    (5, "part epsilon", "Brand#3", "LARGE", 25, -5.0),    # negative price
    (6, "", "Brand#4", "", 1, 75.0),                      # empty name+type
    (7, "part ζήτα", "Brand#4", "MEDIUM", 100, 300.0),    # unicode
    (8, "part eta", "Brand#5", "SMALL", 5, None),         # NULL price
    (9, "part theta", "Brand#5", "SMALL", 5, 100.0),      # never sold
]

# (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate_s,
#  o_orderpriority)
ORDERS = [
    # customer 1: three orders (histogram shape), totalprice ties
    (100, 1, "O", 1000.0, "1995-01-01 00:00:00", "1-URGENT"),
    (101, 1, "F", 1000.0, "1996-06-15 00:00:00", "2-HIGH"),
    (102, 1, "P", 1000.0, "1997-03-01 12:34:56", "5-LOW"),  # non-midnight
    # order with NO lineitems
    (103, 3, "O", 500.0, "1998-01-01 00:00:00", "3-MEDIUM"),
    # year-boundary pair, one with 23:59:59 time-of-day
    (104, 4, "F", 250.0, "1999-12-31 23:59:59", "4-NOT SPECIFIED"),
    (105, 4, "F", 250.0, "2000-01-01 00:00:00", "1-URGENT"),
    # zero / negative / NULL totalprice
    (106, 5, "O", 0.0, "1996-01-01 00:00:00", "2-HIGH"),
    (107, 5, "F", -120.0, "1996-07-04 00:00:00", "5-LOW"),
    (108, 6, "O", None, "2000-06-01 00:00:00", "3-MEDIUM"),
    # all-returned order
    (109, 6, "F", 800.0, "1995-03-15 00:00:00", "1-URGENT"),
    # unicode customer's order, dup-name customer's order
    (110, 8, "O", 75.0, "2001-08-01 00:00:00", "4-NOT SPECIFIED"),
    (111, 10, "F", 1000.0, "1995-06-01 00:00:00", "2-HIGH"),  # 4-way tie
    # NULL-nation customer's order
    (112, 9, "O", 60.0, "1997-11-11 00:00:00", "5-LOW"),
]

# (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
#  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
#  l_shipdate_s)
LINEITEM = [
    # order 100: discount 0.0 and 1.0, extendedprice tie across orders
    (100, 1, 1, 1, 10.0, 500.0, 0.0, 0.05, "N", "O", "1995-01-02 00:00:00"),
    (100, 2, 2, 2, 20.0, 500.0, 1.0, 0.0, "N", "O", "1995-02-01 00:00:00"),
    # order 101: zero quantity, negative quantity, NULL discount
    (101, 3, 3, 1, 0.0, 300.0, 0.05, 0.02, "A", "F", "1996-06-20 00:00:00"),
    (101, 4, 1, 2, -5.0, 200.0, 0.1, 0.04, "R", "F", "1996-07-01 00:00:00"),
    (101, 5, 2, 3, 15.0, 250.0, None, 0.01, "N", "F", "1996-08-01 00:00:00"),
    # order 102: NULL quantity, unicode part, shipdate BEFORE orderdate
    (102, 7, 6, 1, None, 450.0, 0.02, 0.03, "N", "O", "1997-02-01 00:00:00"),
    (102, 6, 4, 2, 50.0, 500.0, 0.08, 0.06, "N", "O", "1997-04-01 00:00:00"),
    # order 104/105: year-boundary shipdates, extendedprice tie
    (104, 1, 1, 1, 5.0, 125.0, 0.1, 0.0, "A", "F", "1999-12-31 23:59:59"),
    (105, 1, 2, 1, 5.0, 125.0, 0.1, 0.0, "N", "F", "2000-01-01 00:00:00"),
    # order 106: zero extendedprice; order 107: negative money
    (106, 3, 3, 1, 1.0, 0.0, 0.0, 0.0, "N", "O", "1996-01-15 00:00:00"),
    (107, 5, 3, 1, 2.0, -60.0, 0.05, 0.02, "R", "F", "1996-07-10 00:00:00"),
    # order 109: ALL lines returned
    (109, 4, 1, 1, 30.0, 400.0, 0.06, 0.03, "A", "F", "1995-04-01 00:00:00"),
    (109, 8, 6, 2, 40.0, 400.0, 0.07, 0.05, "A", "F", "1995-05-01 00:00:00"),
    # order 110/111/112: small tails, NULL-price part
    (110, 8, 4, 1, 3.0, 75.0, 0.0, 0.0, "N", "O", "2001-08-05 00:00:00"),
    (111, 2, 2, 1, 25.0, 999.0, 0.04, 0.08, "N", "F", "1995-06-10 00:00:00"),
    (112, 3, 3, 1, 6.0, 60.0, 0.09, 0.01, "R", "O", "1997-11-20 00:00:00"),
    # ORPHAN: no orders row for key 999
    (999, 1, 1, 1, 7.0, 70.0, 0.03, 0.02, "N", "O", "1998-05-05 00:00:00"),
]


def _tpch_only_pairs():
    names = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        sql = q.oracle.lower()
        if not any(re.search(rf"\b{t}\b", sql) for t in TPCH):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in NON_TPCH):
            continue
        names.append(name)
    assert len(names) >= 80, names
    return names


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_tpch")
    specs = {
        "region": (REGION, "r_regionkey int, r_name string"),
        "nation": (NATION, "n_nationkey int, n_name string, n_regionkey int"),
        "customer": (
            CUSTOMER,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        ),
        "supplier": (
            SUPPLIER,
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        ),
        "part": (
            PART,
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ),
    }
    for t, (rows, schema) in specs.items():
        spark.createDataFrame(rows, schema).repartition(2).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")

    spark.createDataFrame(
        ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    ).repartition(2).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    spark.createDataFrame(
        LINEITEM,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate_s string",
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate_s").cast("timestamp").alias("l_shipdate"),
    ).repartition(2).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return str(d)


@pytest.mark.parametrize("name", _tpch_only_pairs())
def test_tpch_oracle_pair_on_adversarial_warehouse(spark, adversarial_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, adversarial_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    for t in TPCH:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adversarial_dir}/{t}.parquet/*.parquet')"
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
            f"{name}: value mismatch on adversarial warehouse; "
            f"spark-only sample {list(only_s.items())[:3]}; "
            f"duck-only sample {list(only_d.items())[:3]}"
        )
