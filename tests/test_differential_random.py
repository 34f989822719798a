"""SEEDED randomized differential fuzz: generate a full random warehouse
(all 10 tables) from hazard-heavy value pools — NULLs at random density,
deliberate ties, zero/negative money, empty/unicode strings, boundary
timestamps, orphan FKs, degenerate vectors — and run EVERY oracle-paired
query on both engines with the driver's compare rules.

The handcrafted suites (test_differential_{tpch,events,docs,embeddings})
pin known divergence classes; this suite searches for unknown ones: each
seed is a different random warehouse, and seeds are FIXED so a failure
reproduces exactly (re-run with the printed seed). Extra seeds can be
swept ad hoc via SPARK_GRAFT_FUZZ_SEEDS=7,8,9 without changing code.

Excluded by documented contract (not divergences):
- source_text_roundtrip: line-oriented text files cannot carry embedded
  newlines (the corpus generator plants them).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import TABLES, rows_to_multiset

EXCLUDED = {"source_text_roundtrip"}

_DEFAULT_SEEDS = [1301]
SEEDS = (
    [int(s) for s in os.environ["SPARK_GRAFT_FUZZ_SEEDS"].split(",")]
    if os.environ.get("SPARK_GRAFT_FUZZ_SEEDS")
    else _DEFAULT_SEEDS
)

ORACLE_PAIRS = sorted(
    n for n, q in REGISTRY.items() if q.oracle is not None and n not in EXCLUDED
)

_SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "FURNITURE", "HOUSEHOLD", "", "细分"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_TYPES = ["PROMO", "STANDARD", "ECONOMY", "LARGE", "MEDIUM", "SMALL", ""]
_TOKENS = [
    "the", "data", "spark", "query", "点击", "café", "naïve", "123", "a",
    "repeat", "repeat", "UPPER", "mixed-Case", "3.14", "-42", "%", "_",
    "semi;colon", "x" * 40, "déjà",
    # unicode-torture tier (round 4): the NFD twin of the NFC "café"
    # above (distinct codepoints, identical glyphs — must stay distinct
    # in grouping/dedup on both engines), a ZWJ emoji sequence, an
    # astral-plane (surrogate-pair) word, zero-width-space inside a
    # token, and case-folding tricksters (safe: no oracle case-folds)
    "café", "\U0001f469‍\U0001f680", "\U0001d54a\U0001d56d\U0001d552\U0001d563\U0001d558",
    "zero​width", "straße", "ςΣσ",
]


def _gen_warehouse(rng: np.random.RandomState):
    """One random warehouse. Every pool mixes plausible values with the
    hazard classes; densities are randomized per seed."""

    def pick(pool):
        return pool[rng.randint(len(pool))]

    def maybe(v, p_null):
        return None if rng.rand() < p_null else v

    def money():
        # quarter grid (multiples of 0.25): binary-exact doubles, so sums
        # and products are bit-identical across engines regardless of
        # summation order. Off-grid decimals would let one-ulp sum
        # differences straddle a ROUND(x, 2) boundary and read as a
        # one-cent "divergence" that no query-level fix can remove.
        pool = [None, 0.0, -123.25, 100.0, 100.0, 250.0,
                float(rng.randint(-2000, 36000)) / 4.0]
        return pick(pool)

    def ts(base_day: int, span_days: int, boundary_p: float = 0.25) -> str:
        if rng.rand() < boundary_p:
            # exact midnight / end-of-day / year-boundary shapes
            day = base_day + int(rng.randint(span_days))
            tod = pick(["00:00:00", "23:59:59", "12:00:00"])
        else:
            day = base_day + int(rng.randint(span_days))
            tod = f"{rng.randint(24):02d}:{rng.randint(60):02d}:{rng.randint(60):02d}"
        # day 0 = 1995-01-01; map via numpy datetime arithmetic
        d = np.datetime64("1995-01-01") + np.timedelta64(day, "D")
        return f"{d} {tod}"

    region = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST", "ΠΕΡΙΟΧΉ", ""])]
    n_nation = 8
    nation = [
        (i, f"NATION_{rng.randint(6)}", int(rng.randint(len(region))))
        for i in range(n_nation)
    ]
    n_cust = 40
    customer = [
        (
            k,
            pick([f"Customer#{k}", f"Customer#{rng.randint(5)}", "客户#x", "Customer#1"]),
            maybe(int(rng.randint(n_nation + 2)), 0.08),   # +2 → orphan FKs
            money(),
            pick(_SEGMENTS),
        )
        for k in range(1, n_cust + 1)
    ]
    n_supp = 12
    supplier = [
        (k, f"Supplier#{k}", int(rng.randint(n_nation)), money())
        for k in range(1, n_supp + 1)
    ]
    n_part = 25
    part = [
        (
            k,
            pick([f"part {k}", "part 100% _x_", "", "part ζ", f"part {rng.randint(4)}"]),
            f"Brand#{rng.randint(1, 6)}",
            pick(_TYPES),
            int(rng.randint(0, 51)),
            money(),
        )
        for k in range(1, n_part + 1)
    ]
    n_orders = 70
    orders = [
        (
            100 + k,
            int(rng.randint(1, n_cust + 6)),               # +6 → orphan custkeys
            pick(["O", "F", "P"]),
            money(),
            ts(0, 2400),
            pick(_PRIORITIES),
        )
        for k in range(n_orders)
    ]
    lineitem = []
    lines_per_order: dict = {}
    for _ in range(200):
        ok = int(pick([o[0] for o in orders] + [99999]))    # orphan orderkey
        ln = lines_per_order.get(ok, 0) + 1
        lines_per_order[ok] = ln
        lineitem.append(
            (
                ok,
                int(rng.randint(1, n_part + 3)),
                int(rng.randint(1, n_supp + 2)),
                ln,
                pick([None, 0.0, -5.0, float(rng.randint(1, 51))]),
                money(),
                # binary-exact rate grids (1/16) for the same reason as money()
                pick([None, 0.0, 0.0625, 0.125, 1.0]),
                pick([0.0, 0.0625, 0.25]),
                pick(["A", "N", "R"]),
                pick(["O", "F"]),
                ts(1, 2400),
            )
        )
    events = []
    for i in range(80):
        events.append(
            (
                i,
                ts(10592, 4) + f".{rng.randint(1000000):06d}",  # ~2024-01-01 + 4d
                int(rng.randint(1, 15)),
                pick(["click", "click", "purchase", "signup", "steady", "", "点击"]),
                pick([None, 0.0, -1.5, float(rng.randint(0, 400)) / 4.0]),
                pick(['{"k": 1}', "{not json", "[1,2]", "", None, '{"k": null}',
                      '{"other": 5}']),
            )
        )
    documents = []
    for i in range(30):
        shape = rng.rand()
        if shape < 0.1:
            text = pick(["", "   ", "\t \t"])
        elif shape < 0.2:
            text = pick(_TOKENS) + " " * int(rng.randint(1, 4))
        else:
            k = int(rng.randint(1, 30))
            text = " ".join(pick(_TOKENS) for _ in range(k))
        documents.append(
            (i, text, pick(["en", "en", "fr", "de", "zh", "es"]),
             pick(["web", "wiki", "books"]), len(text))
        )
    embeddings = []
    for i in range(20):
        shape = rng.rand()
        if shape < 0.08:
            vec = None
        elif shape < 0.16:
            vec = [0.0] * 8
        elif shape < 0.24:
            vec = [float("nan")] + [1.0] * 7
        elif shape < 0.32:
            # -0.0 component + a tiny negative that rounds to zero from
            # below: DuckDB ROUND keeps the sign of zero; every consuming
            # oracle carries `+ 0.0` (first_elem/min/max/sum/centroid)
            vec = [-0.0, -1e-9] + [round(float(x), 3) for x in rng.randn(6)]
        else:
            vec = [round(float(x), 3) for x in rng.randn(8)]
        embeddings.append((i, vec, maybe(int(rng.randint(-1, 4)), 0.1)))
    # plant one exact duplicate vector pair
    if embeddings[-1][1] is not None and embeddings[-2][1] is not None:
        embeddings[-1] = (embeddings[-1][0], list(embeddings[-2][1]), embeddings[-1][2])
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


@pytest.fixture(scope="module", params=SEEDS)
def random_dir(spark, tmp_path_factory, request):
    seed = request.param
    rng = np.random.RandomState(seed)
    tables = _gen_warehouse(rng)
    d = tmp_path_factory.mktemp(f"random_wh_{seed}")
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
    return seed, str(d)


ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_survives_random_warehouse(spark, random_dir, name):
    """Rows-only queries (no oracle) must execute and be deterministic on
    the random warehouse too. Runs on the FIRST seed only — the per-seed
    cost is dominated by the heavyweight pipelines, and the oracle-paired
    sweep above is the per-seed signal."""
    seed, d = random_dir
    if seed != SEEDS[0]:
        pytest.skip("rows-only survival runs on the first seed only")
    df = REGISTRY[name].fn(spark, d)
    rows = df.collect()
    assert df.columns, f"{name} seed={seed}: no columns"
    rows2 = REGISTRY[name].fn(spark, d).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2)), (
        f"{name} seed={seed}: nondeterministic"
    )


@pytest.mark.parametrize("name", ORACLE_PAIRS)
def test_oracle_pair_on_random_warehouse(spark, random_dir, name):
    seed, d = random_dir
    q = REGISTRY[name]
    sdf = q.fn(spark, d)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    res = con.execute(q.oracle)
    dcols = [x[0] for x in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name} seed={seed}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name} seed={seed}: rows {len(srows)} vs {len(drows)}"
    # sig=6: tolerate cross-engine summation-order ulp in aggregates
    # (var_samp etc.) — semantic divergences (membership, NULLs, ties,
    # signs) still differ at 6 significant digits.
    sm = rows_to_multiset(scols, srows, sig=6)
    dm = rows_to_multiset(dcols, drows, sig=6)
    if sm != dm:
        only_s = {k: c for k, c in sm.items() if dm.get(k) != c}
        only_d = {k: c for k, c in dm.items() if sm.get(k) != c}
        raise AssertionError(
            f"{name} seed={seed}: value mismatch on random warehouse; "
            f"spark-only sample {list(only_s.items())[:3]}; "
            f"duck-only sample {list(only_d.items())[:3]}"
        )
