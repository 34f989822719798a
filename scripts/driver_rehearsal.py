"""Dress rehearsal of the driver's t2 check: run every queries() entry via
__spark_entry__ at a given SF and compare to oracle_sql() through DuckDB
with the same row-count/columns/value-multiset rules as tests/conftest.

Usage: python scripts/driver_rehearsal.py [sf_dir] [--vanilla] [--only n1,n2,...]

--vanilla builds a plain SparkSession (no session.py confs) to mimic the
driver's environment; --only restricts to a comma-separated name list.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

args = sys.argv[1:]
VANILLA = "--vanilla" in args
ONLY: set[str] | None = None
if "--only" in args:
    ONLY = set(args[args.index("--only") + 1].split(","))
positional = [a for a in args if a.startswith("/")]
SF_DIR = positional[0] if positional else "/root/testdata/sf0.01"

import __spark_entry__ as e  # noqa: E402
from rws_data_ingester_spark.session import get_spark  # noqa: E402
from conftest import rows_to_multiset, TABLES  # noqa: E402


def main() -> int:
    if VANILLA:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[16]").appName("rehearsal-vanilla").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark(app_name="rehearsal")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    if ONLY is not None:
        unknown = ONLY - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        qs = {n: f for n, f in qs.items() if n in ONLY}
    n_fail = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:
            print(f"FAIL {name}: spark error {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
        status = "ok  "
        if sorted(scols) != sorted(dcols):
            status = f"FAIL cols {scols} vs {dcols}"
        elif len(srows) != len(drows):
            status = f"FAIL rowcount {len(srows)} vs {len(drows)}"
        elif rows_to_multiset(scols, srows) != rows_to_multiset(dcols, drows):
            sm = rows_to_multiset(scols, srows)
            dm = rows_to_multiset(dcols, drows)
            diff = [k for k in sm if dm.get(k) != sm[k]][:2]
            status = f"FAIL values e.g. {diff}"
        if status.startswith("FAIL"):
            n_fail += 1
        print(f"{status} {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'} at {SF_DIR}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
