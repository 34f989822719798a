"""Join-tier skew measurement at ~sf10 (the inversion probe): at sf1 the
hot custkey's extra reducer work (~0.5M rows) is smaller than the fixed
join overhead, so salted and unsalted read the same and the salt's value
is invisible. At sf10 with a 33% Zipf head the hot task alone carries
~5M probe rows — the regime the salt exists for. Measures the four join
variants (salted/unsalted x AQE-skew-split on/off, broadcast disabled
throughout) on the orders+customer-only pair built by:

    SPARK_GRAFT_SKEW_ORDER_FRAC=3 SPARK_GRAFT_SKEW_TABLES=orders,customer \
      python scripts/make_skew_fixtures.py /tmp/spark_graft_scaled/sf10 \
      /tmp/spark_graft_skew/sf10-joins

Appends a "sf10_joins" section into SKEW_r09.json (same pair-controlled
protocol as skew_stress.py)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from rws_data_ingester_spark.session import get_spark  # noqa: E402
from scripts.skew_stress import _adaptive_twin, _conf, _unsalted_twin  # noqa: E402

N_RUNS = 3
PAIR = os.environ.get("SPARK_GRAFT_SKEW10_DIR", "/tmp/spark_graft_skew/sf10-joins")
OUT = REPO / os.environ.get("SPARK_GRAFT_SKEW_OUT", "SKEW_r09.json")


def main() -> None:
    from rws_data_ingester_spark.plans import REGISTRY

    uniform, skewed = os.path.join(PAIR, "uniform"), os.path.join(PAIR, "skewed")
    cores = 8
    # per-partition bytes constant at the sf10 point (scaling protocol):
    # AQE initial partition count scaled 100x over the sf0.1 base
    spark = get_spark(
        app_name="skew_join_sf10",
        master=f"local[{cores}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cores * 100)},
    )

    no_bhj = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    no_skewfix = {
        **no_bhj,
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled": "false",
    }
    cases = [
        ("join_salted_skew_nobhj", REGISTRY["join_salted_skew"].fn, no_bhj),
        ("join_unsalted_twin_nobhj", _unsalted_twin, no_bhj),
        ("join_salted_skew_noaqeskew", REGISTRY["join_salted_skew"].fn, no_skewfix),
        ("join_unsalted_twin_noaqeskew", _unsalted_twin, no_skewfix),
        # the round-9 answer to the premium-vs-penalty standoff: salt
        # ONLY the sampled-detected hot keys, plain join for the rest
        ("join_salted_adaptive_nobhj", _adaptive_twin, no_bhj),
        ("join_salted_adaptive_noaqeskew", _adaptive_twin, no_skewfix),
    ]

    def run_once(fn, d, extra) -> float:
        t0 = time.perf_counter()
        with _conf(spark, extra):
            fn(spark, d).count()
        return round(time.perf_counter() - t0, 3)

    # control: the unsalted join itself on the UNIFORM side at base conf —
    # pair-local band legibility
    def control() -> float:
        return run_once(_unsalted_twin, uniform, no_bhj)

    control()
    prev = sorted(control() for _ in range(3))[1]
    for _ in range(4):
        cur = sorted(control() for _ in range(3))[1]
        if abs(cur - prev) / max(prev, 1e-3) <= 0.15:
            break
        print(f"settling: {prev} -> {cur}", flush=True)
        prev = cur

    rows = {}
    for name, fn, extra in cases:
        out = {}
        for side, d in (("uniform", uniform), ("skewed", skewed)):
            run_once(fn, d, extra)
            samples = sorted(run_once(fn, d, extra) for _ in range(N_RUNS))
            out[side] = samples[len(samples) // 2]
            print(f"  {name}/{side}: {out[side]}s {samples}", flush=True)
        rows[name] = {
            "uniform_sec": out["uniform"],
            "skewed_sec": out["skewed"],
            "ratio": round(out["skewed"] / max(out["uniform"], 1e-3), 3),
            "n_runs": N_RUNS,
        }

    art = json.loads(OUT.read_text())
    art["sf10_joins"] = {
        "pair_root": PAIR,
        "order_frac": 1 / 3,
        "control_unsalted_uniform": prev,
        "queries": rows,
    }
    OUT.write_text(json.dumps(art, indent=1) + "\n")
    print(json.dumps({"sf10_ratios": {k: v["ratio"] for k, v in rows.items()},
                      "sf10_sec": {k: (v["uniform_sec"], v["skewed_sec"]) for k, v in rows.items()}}))


if __name__ == "__main__":
    main()
