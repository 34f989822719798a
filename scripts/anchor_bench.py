"""Protocol-v2 re-measurement of the NON-headline perf anchors.

VERDICT r6 task 3: the heavy non-headline queries carry anchors measured
in round 2 under the old warm-up-in-median protocol (and two of them —
dedup_clusters / pipeline_near_dedup_remove — changed in round 6 with the
CC null-edge filter + driver fast path; sink_zorder_pruning changed in
round 7 with the conservation-oracle reshape). This runner applies the
same protocol as bench.py — one untimed global warm-up over every anchor,
median-of-3 settle probes on the fixed 3-query control set, median-of-3
timed runs, first/last control drift — so these anchors become comparable
to the re-baselined headline medians and regressions in this tier stop
being invisible.

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
CONTROLS = ["q1_pricing_summary", "join_inner_customer_orders", "window_running"]
SETTLE_MAX_PROBES = 5
SETTLE_TOLERANCE = 0.10


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="anchor-bench")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 3)

    warmups = {n: run_once(n) for n in ANCHORS + CONTROLS}

    def probe_median3() -> dict[str, float]:
        ps = [{n: run_once(n) for n in CONTROLS} for _ in range(3)]
        return {n: sorted(p[n] for p in ps)[1] for n in CONTROLS}

    settle_history = [probe_median3()]
    settled = False
    while len(settle_history) < SETTLE_MAX_PROBES:
        nxt = probe_median3()
        prev_total = sum(settle_history[-1].values())
        settle_history.append(nxt)
        if prev_total > 0 and abs(sum(nxt.values()) - prev_total) / prev_total <= SETTLE_TOLERANCE:
            settled = True
            break
    ctrl_first = settle_history[-1]

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    raw = {n: [run_once(n) for _ in range(n_runs)] for n in ANCHORS}
    timings = {n: sorted(s)[len(s) // 2] for n, s in raw.items()}

    ctrl_last = probe_median3()
    drift = {
        n: (
            None
            if ctrl_first[n] == 0.0
            else round((ctrl_last[n] - ctrl_first[n]) / ctrl_first[n] * 100.0, 1)
        )
        for n in CONTROLS
    }
    finite = [d for d in drift.values() if d is not None]
    print(
        json.dumps(
            {
                "metric": "anchor_queries_protocol_v2",
                "queries": timings,
                "samples": raw,
                "sf": sf,
                "controls": {
                    # first/last probe VALUES, not just drift: anchors are
                    # compared across rounds on a box whose absolute speed
                    # wanders (the r5 −43.7% episode) — the control
                    # medians let a later reader normalize an anchor row
                    # to the box state it was measured under.
                    "first": ctrl_first,
                    "last": ctrl_last,
                    "drift_pct": drift,
                    "mean_drift_pct": round(sum(finite) / len(finite), 1)
                    if finite
                    else None,
                    "settle_probes": len(settle_history),
                    "settled": settled,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
