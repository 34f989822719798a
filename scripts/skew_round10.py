"""Round-10 skew measurements (VERDICT r9, tasks 5 & 6): extend the skew
dimension to the tiers SKEW_r09 left at sf1 —

1. **sf10 dedup/CC** on a documents-only pair built from the sf10 clone
   (500k docs → the planted boilerplate cluster is ~25k members, past
   the new `max_bucket_size=10_000` guard): `dedup_clusters` (star-edge
   CC must stay linear at the bigger hot bucket), the guarded candidate
   path in both modes (error mode must FAIL FAST on the mega-bucket;
   star mode must stay bounded), and the structural ledger (bucket size,
   star edges vs what cliques would have been).
2. **sharded sessionization** on the sf1 pair: the new
   `session_window_sharded` vs the plain islands form, uniform vs the
   planted hot user (10% of events) — the sharded form's phase-1 tasks
   are bounded by one user-day, so its skewed/uniform ratio should hold
   where the single-partition islands sort degrades.
3. **stateful streaming** on the sf1 pair (first skew measurement of the
   state-store path): availableNow replay of `stateful_running_totals`
   (applyInPandasWithState) and the session-window stream twin against
   the hot user.

    python scripts/make_scaled_fixtures.py              # if /tmp was wiped
    python scripts/make_skew_fixtures.py                # sf1 pair
    SPARK_GRAFT_SKEW_TABLES=documents \
      python scripts/make_skew_fixtures.py /tmp/spark_graft_scaled/sf10 \
      /tmp/spark_graft_skew/sf10-dedup
    python scripts/skew_round10.py                      # writes SKEW_r10.json

Protocol: same paired uniform/skewed measurement as skew_stress.py
(warm-up + median of N per side, pair-local control probe before each
pair, settle phase first, per-pair retry on control breach, whole-pass
refusal if a pair still breaches) — the ratio is only meaningful when
both sides saw the same box.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from rws_data_ingester_spark.session import get_spark  # noqa: E402
from scripts.skew_stress import _conf  # noqa: E402

N_RUNS = int(os.environ.get("SPARK_GRAFT_SKEW_RUNS", "3"))
CONTROL_GATE = float(os.environ.get("SPARK_GRAFT_SKEW_CONTROL_GATE", "1.4"))
SF1_PAIR = os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_skew/sf1")
SF10_DEDUP_PAIR = os.environ.get(
    "SPARK_GRAFT_SKEW10_DEDUP_DIR", "/tmp/spark_graft_skew/sf10-dedup"
)
OUT = REPO / os.environ.get("SPARK_GRAFT_SKEW_OUT", "SKEW_r10.json")


def _minhash_star_routed(spark, sf_dir):
    """The guarded candidate path with oversized buckets routed to star
    edges — the form the removal pipelines would run at 100 TB."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    d = Catalog(spark, sf_dir).documents
    sigs = minhash_signature(d.select("doc_id", "text"), "doc_id", "text")
    return lsh_candidate_pairs(sigs, "doc_id", on_oversize="star")


def main() -> None:
    from rws_data_ingester_spark.plans import REGISTRY

    for root in (SF1_PAIR, SF10_DEDUP_PAIR):
        if not os.path.isdir(os.path.join(root, "skewed")):
            raise SystemExit(f"skew pair missing under {root} — see module docstring")
    manifest_sf1 = json.loads(Path(SF1_PAIR, "skew_manifest.json").read_text())

    cores = int(os.environ.get("SPARK_GRAFT_SKEW_CORES", "8"))
    parts = int(os.environ.get("SPARK_GRAFT_SKEW_PARTS", str(cores * 10)))
    spark = get_spark(
        app_name="skew_round10",
        master=f"local[{cores}]",
        extra_conf={"spark.sql.shuffle.partitions": str(parts)},
    )

    def run_once(fn, d, extra=None) -> float:
        t0 = time.perf_counter()
        if extra:
            with _conf(spark, extra):
                fn(spark, d).count()
        else:
            fn(spark, d).count()
        return round(time.perf_counter() - t0, 3)

    # pair-local control: a scan-bound docs aggregate on the sf1 uniform
    # side — present in both fixture pairs' source and cheap enough to
    # probe before every pair
    from rws_data_ingester_spark.catalog import load_table

    def control_fn(spark_, d):
        return load_table(spark_, d, "documents").agg(F.sum("n_chars"))

    def control_median() -> float:
        return sorted(
            run_once(control_fn, os.path.join(SF1_PAIR, "uniform"))
            for _ in range(3)
        )[1]

    run_once(control_fn, os.path.join(SF1_PAIR, "uniform"))
    prev = control_median()
    for _ in range(5):
        cur = control_median()
        if abs(cur - prev) / max(prev, 1e-3) <= 0.15:
            break
        print(f"settling: control {prev}s -> {cur}s", flush=True)
        prev = cur

    controls: dict[str, float] = {}
    rows: dict[str, dict] = {}

    # (name, fn, extra-conf, pair_root, section)
    cases = [
        (
            "dedup_clusters_sf10",
            REGISTRY["dedup_clusters"].fn,
            None,
            SF10_DEDUP_PAIR,
            "sf10_dedup",
        ),
        (
            "dedup_minhash_star_routed_sf10",
            _minhash_star_routed,
            None,
            SF10_DEDUP_PAIR,
            "sf10_dedup",
        ),
        (
            "session_window_islands_sf1",
            REGISTRY["session_window_islands"].fn,
            None,
            SF1_PAIR,
            "sessionization",
        ),
        (
            "session_window_sharded_sf1",
            REGISTRY["session_window_sharded"].fn,
            None,
            SF1_PAIR,
            "sessionization",
        ),
        (
            "stream_stateful_running_totals_sf1",
            REGISTRY["stream_stateful_running_totals"].fn,
            None,
            SF1_PAIR,
            "streaming",
        ),
        (
            "stream_session_windows_sf1",
            REGISTRY["stream_session_windows"].fn,
            None,
            SF1_PAIR,
            "streaming",
        ),
    ]

    def measure_pair(name, fn, extra, pair_root, section, attempt=1) -> None:
        ctrl = control_median()
        controls[name] = ctrl
        out = {}
        for side in ("uniform", "skewed"):
            d = os.path.join(pair_root, side)
            run_once(fn, d, extra)  # warm-up, untimed
            samples = sorted(run_once(fn, d, extra) for _ in range(N_RUNS))
            out[side] = samples[len(samples) // 2]
            print(f"  {name}/{side}: {out[side]}s {samples}", flush=True)
        rows[name] = {
            "section": section,
            "pair_root": pair_root,
            "uniform_sec": out["uniform"],
            "skewed_sec": out["skewed"],
            "ratio": round(out["skewed"] / max(out["uniform"], 1e-3), 3),
            "n_runs": N_RUNS,
            "control": ctrl,
            "attempt": attempt,
        }

    for name, fn, extra, pair_root, section in cases:
        print(f"== {name} ==", flush=True)
        measure_pair(name, fn, extra, pair_root, section)

    # per-pair contention retry + whole-pass refusal (drift protocol)
    med = sorted(controls.values())[len(controls) // 2]
    for name, fn, extra, pair_root, section in cases:
        r = controls[name] / max(med, 1e-3)
        if max(r, 1 / max(r, 1e-9)) > CONTROL_GATE:
            print(
                f"{name}: control {controls[name]}s deviates {r:.2f}x — "
                "retrying pair",
                flush=True,
            )
            measure_pair(name, fn, extra, pair_root, section, attempt=2)
    med = sorted(controls.values())[len(controls) // 2]
    bad = {
        k: v
        for k, v in controls.items()
        if max(v / max(med, 1e-3), med / max(v, 1e-3)) > CONTROL_GATE
    }
    if bad:
        raise SystemExit(
            f"contended pass refused: per-pair controls {controls} — pairs "
            f"{sorted(bad)} deviate past {CONTROL_GATE}x from the pass "
            f"median after one retry; artifact NOT written"
        )

    # ---- guard fail-fast proof (not a timed pair: the POINT is the
    # error) — the default clique path on the sf10 skewed corpus must
    # refuse the ~25k-member mega-bucket before emitting quadratic pairs
    from rws_data_ingester_spark.operators.dedup import (
        _banded,
        lsh_candidate_pairs,
        lsh_star_edges,
        minhash_signature,
    )

    skewed10 = os.path.join(SF10_DEDUP_PAIR, "skewed")
    d10 = load_table(spark, skewed10, "documents")
    sigs10 = minhash_signature(d10.select("doc_id", "text"), "doc_id", "text").cache()
    t0 = time.perf_counter()
    guard = {"fired": False, "elapsed_sec": None, "message": None}
    try:
        lsh_candidate_pairs(sigs10, "doc_id").count()
    except Exception as e:  # noqa: BLE001 — the guard surfaces as SparkException
        guard = {
            "fired": "max_bucket_size" in str(e),
            "elapsed_sec": round(time.perf_counter() - t0, 3),
            "message": str(e).split("\n")[0][:300],
        }
    assert guard["fired"], "guard did NOT fire on the sf10 mega-bucket"

    # ---- structural ledger at sf10: the linearity claim at the bigger
    # bucket (r9 measured it at 2,450 members; this pair plants ~25k)
    n_docs = d10.count()
    doc_frac = json.loads(
        Path(SF10_DEDUP_PAIR, "skew_manifest.json").read_text()
    )["doc_frac"]
    n_hot = d10.filter(F.col("doc_id") % round(1 / doc_frac) == 0).count()
    star_edges = lsh_star_edges(sigs10, "doc_id").count()
    routed_pairs = lsh_candidate_pairs(sigs10, "doc_id", on_oversize="star").count()
    hot_bucket = (
        _banded(sigs10, "doc_id", 16, 4)
        .groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    sigs10.unpersist()
    structure = {
        "n_docs": n_docs,
        "n_hot_docs": n_hot,
        "hot_lsh_bucket": hot_bucket,
        "star_edges": star_edges,
        "star_routed_pairs": routed_pairs,
        "clique_pairs_avoided_lower_bound": hot_bucket * (hot_bucket - 1) // 2,
        "star_edges_per_hot_doc": round(star_edges / max(n_hot, 1), 3),
    }
    # star edges stay linear at the 25k bucket: ≤ bands per hot doc plus
    # base-corpus slack — the same assertion SKEW_r09 pinned at 2,450
    assert star_edges <= 4 * n_hot + 0.01 * n_docs, structure
    assert routed_pairs <= star_edges + 0.01 * n_docs, structure

    # ---- sessionization structure on the sf1 skewed side: the shard
    # key's spread of the hot user (phase-1 task bound = one user-day)
    ev = load_table(spark, os.path.join(SF1_PAIR, "skewed"), "events").filter(
        F.col("ts").isNotNull()
    )
    hot_user = manifest_sf1["hot_user"]
    hot = ev.filter(F.col("user_id") == hot_user)
    per_day = (
        hot.groupBy(F.to_date("ts").alias("d"))
        .count()
        .agg(
            F.count("*").alias("n_days"),
            F.max("count").alias("max_user_day_rows"),
            F.sum("count").alias("hot_user_rows"),
        )
        .first()
    )
    session_structure = {
        "hot_user_rows": per_day["hot_user_rows"],
        "hot_user_days": per_day["n_days"],
        "max_user_day_rows": per_day["max_user_day_rows"],
        "islands_max_sort_partition_rows": per_day["hot_user_rows"],
        "sharded_max_sort_partition_rows": per_day["max_user_day_rows"],
    }

    out = {
        "protocol": "skew-v2-paired-controlled-r10",
        "sf1_pair": SF1_PAIR,
        "sf10_dedup_pair": SF10_DEDUP_PAIR,
        "cores": cores,
        "shuffle_partitions": parts,
        "control_query": "documents_nchars_sum_uniform_sf1",
        "controls": controls,
        "queries": rows,
        "guard_fail_fast": guard,
        "sf10_dedup_structure": structure,
        "sessionization_structure": session_structure,
    }
    OUT.write_text(json.dumps(out, indent=1) + "\n")
    print(
        json.dumps(
            {
                "file": OUT.name,
                "ratios": {k: v["ratio"] for k, v in rows.items()},
                "guard": guard,
                "structure": structure,
                "session": session_structure,
            }
        )
    )


if __name__ == "__main__":
    main()
