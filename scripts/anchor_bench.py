"""Protocol-v2.2 re-measurement of the NON-headline perf anchors.

VERDICT r6 task 3: the heavy non-headline queries carry anchors measured
in round 2 under the old warm-up-in-median protocol (and three of them
changed since: dedup_clusters / pipeline_near_dedup_remove got the r5
driver fast path + r6 null-edge filter; sink_zorder_pruning got the r7
conservation-oracle reshape). This runner IMPORTS bench.py's measurement
machinery — global warm-up, median-of-3 settle probes on the same fixed
3-query control set, median-of-3 timed runs, drift endpoints, and the
round-7 drift-breach auto-retry — so the anchor artifact stays
protocol-identical to BENCH_rN by construction, and records the control
probe VALUES so a later reader can normalize an anchor row to the box
state it was measured under (drift measures within-run change, not
absolute box speed).

Usage: python scripts/anchor_bench.py   # sf0.1 via $SPARK_GRAFT_SF_DIR
Prints ONE JSON line mirroring bench.py's compact shape.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (shared protocol: measure_pass / retry / CONTROLS)
from rws_data_ingester_spark.plans import REGISTRY  # noqa: E402
from rws_data_ingester_spark.session import get_spark  # noqa: E402

ANCHORS = [
    "simsearch_topk_pq",
    "bpe_vocab_train",
    "dedup_clusters",
    "pipeline_near_dedup_remove",
    "sink_zorder_pruning",
    "stream_scheduled_refresh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="anchor-bench")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        if name == bench.CPU_CONTROL:
            bench.run_cpu_control(spark)
        else:
            REGISTRY[name].fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 3)

    # global warm-up: anchors AND controls (the controls are not in
    # ANCHORS, so without this their first settle probe would measure
    # codegen compile instead of box state)
    warmups = {n: run_once(n) for n in ANCHORS + bench.CONTROLS}

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    passes = bench.run_with_drift_retry(
        run_once, ANCHORS, bench.CONTROLS, n_runs, extra_runs={}
    )
    final = passes[-1]
    print(
        json.dumps(
            {
                "metric": "anchor_queries_protocol_v2",
                "queries": final["timings"],
                "samples": final["raw"],
                "warmups": warmups,
                "sf": sf,
                "controls": {
                    "first": final["ctrl_first"],
                    "last": final["ctrl_last"],
                    "drift_pct": final["drift_pct"],
                    "mean_drift_pct": final["mean_drift_pct"],
                    "settle_probes": len(final["settle_history"]),
                    "settled": final["settled"],
                    "drift_retries": len(passes) - 1,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
