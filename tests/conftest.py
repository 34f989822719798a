"""Shared test fixtures: one SparkSession per test session, DuckDB oracle
connection, and the Spark↔DuckDB comparison helper that mirrors the
driver's t2 check (row count + column names + order-insensitive values).
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

SF_DIR = "/root/testdata/sf0.001"
FIXTURES = REPO_ROOT / "tests" / "fixtures"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from rws_data_ingester_spark.session import get_spark

    import tempfile

    s = get_spark(app_name="tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "4",
        # warehouse.dir is a static conf — point it at a throwaway dir at
        # session build time so bucketize() tests can saveAsTable safely.
        "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v, sig: int = 9):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float noise the same way on both sides
        return f"{v:.{sig}g}"
    return v


def rows_to_multiset(cols: list[str], rows: list[tuple], sig: int = 9) -> dict:
    """Order-insensitive canonical form: sort columns by name, then build
    a multiset of row tuples — mirrors the driver's value-hash. `sig` is
    the float canonicalization width: 9 significant digits mirrors the
    driver; the randomized fuzz compares at 6 so cross-engine aggregate
    summation-order ulp (var_samp & friends partial-agg in a different
    order on each engine) doesn't read as a semantic divergence."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for row in rows:
        key = tuple(_norm(row[i], sig) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare_query(spark, duck, name: str) -> None:
    """Run a registered query on Spark and its oracle on DuckDB; assert
    row-count, column-name, and value-multiset equality."""
    from rws_data_ingester_spark.plans import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
    if sm != dm:
        only_s = {k: c for k, c in sm.items() if dm.get(k) != c}
        only_d = {k: c for k, c in dm.items() if sm.get(k) != c}
        sample_s = list(only_s.items())[:5]
        sample_d = list(only_d.items())[:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only sample {sample_s}; duck-only sample {sample_d}"
        )
