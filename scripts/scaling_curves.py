"""Measure per-query scaling curves across scale factors (VERDICT r6,
task 2): run the bench HEADLINE queries at the k=1/3/10 id-offset-clone
warehouses from ``make_scaled_fixtures.py`` (~sf0.1, ~sf0.3, ~sf1.0),
fit a per-query scaling exponent, and flag anything superlinear beyond
its declared complexity.

    python scripts/make_scaled_fixtures.py            # once, ~2 min
    python scripts/scaling_curves.py                  # writes SCALING_r07.json

Instrument design — the measurement must isolate WORK growth:

- All three scale points come from the same generator (k=1 included),
  so parquet layout, compression, and files-per-row density are
  uniform. Measuring the driver's single-file sf0.1 fixtures against
  multi-file clones inverted the curve (10x data, 1.8x FASTER — the 1x
  scan ran on one task, the 10x scan on twenty).
- The session is a FIXED local[8] with shuffle.partitions=8 and every
  table written as >=8 files, so all scale points saturate the same
  cores and wall time tracks total work instead of free parallelism —
  the regime a 1000-executor cluster is in once data outgrows it.

Protocol (mirrors bench.py's): per scale point, one untimed warm-up pass
over every query first (codegen/JIT compile out of the medians), then
median of N=3 timed runs per query. Exponent: least-squares slope of
log(t) vs log(sf) over the three points — fixed per-query overhead
(planning, task launch) damps exponents BELOW the asymptotic complexity
at these absolute times, so the flag threshold is alpha > 1.15 AND
t(max_sf) > 1 s (sub-second queries are overhead-dominated and their
slope is noise). Expected-superlinear queries carry a declared bound
instead (sorts: n log n → alpha ≤ ~1.1 at this range; none quadratic).
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from rws_data_ingester_spark.session import get_spark  # noqa: E402


def _sf_of(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def _slope(xs: list[float], ys: list[float]) -> float:
    """Least-squares slope of ys vs xs (both already log-scaled)."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den if den else float("nan")


def main() -> None:
    # import AFTER sys.path setup; bench.HEADLINE is the measured set,
    # optionally widened to more of the registry (round-7 default: the
    # scale-sensitive non-headline tier — the full dedup-cluster path,
    # tf-idf, packing, contiguous ids, salted join, SCD2 intervals,
    # cohort retention, the global sort, and the q18/q21 self-join
    # composites). Override with SPARK_GRAFT_SCALE_EXTRA="" to measure
    # the headline set only, or a comma list to choose.
    from bench import HEADLINE as BENCH_HEADLINE
    from rws_data_ingester_spark.plans import REGISTRY

    extra_env = os.environ.get(
        "SPARK_GRAFT_SCALE_EXTRA",
        "dedup_clusters,dedup_paragraphs,text_tfidf,pipeline_pack_sequences,"
        "ids_assign_contiguous,embedding_centroids,pipeline_embedding_dedup,"
        "join_salted_skew,scd2_intervals,cohort_retention,"
        "sort_multi_key_top100,q18_large_volume_customers,"
        "q21_waiting_suppliers",
    )
    extras = [n for n in extra_env.split(",") if n]
    # SPARK_GRAFT_SCALE_ONLY: measure EXACTLY this comma list and MERGE
    # the rows into the existing artifact (same scale points required) —
    # extends the curve set without re-measuring the whole headline tier.
    only_env = os.environ.get("SPARK_GRAFT_SCALE_ONLY", "")
    only = [n for n in only_env.split(",") if n]
    if only:
        HEADLINE = only
    else:
        HEADLINE = list(BENCH_HEADLINE) + [
            n for n in extras if n not in BENCH_HEADLINE
        ]
    unknown = [n for n in HEADLINE if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    dirs = sys.argv[1:] or [
        "/tmp/spark_graft_scaled/sf0.1",
        "/tmp/spark_graft_scaled/sf0.3",
        "/tmp/spark_graft_scaled/sf1",
        "/tmp/spark_graft_scaled/sf3",
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if len(dirs) < 2:
        raise SystemExit(
            "need >=2 scale dirs; run scripts/make_scaled_fixtures.py first"
        )
    out_path = REPO / "SCALING_r07.json"
    if only and out_path.exists():
        # merge-mode precondition, checked BEFORE any measurement: the
        # re-measured rows can only join the committed artifact if the
        # scale points match exactly (a mismatched row would break the
        # per-row sec_by_sf/len(sfs) pin) — refuse up front instead of
        # discovering it after minutes of timed runs.
        prior_sfs = json.loads(out_path.read_text())["sfs"]
        planned = sorted(_sf_of(d) for d in dirs)
        if prior_sfs != planned:
            raise SystemExit(
                f"SPARK_GRAFT_SCALE_ONLY merge refused: scale points "
                f"{planned} do not match the committed artifact's "
                f"{prior_sfs} — re-run with the full dir set (or "
                f"without SCALE_ONLY to regenerate everything)"
            )
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
    cores = os.environ.get("SPARK_GRAFT_SCALE_CORES", "8")
    spark = get_spark(
        app_name="scaling_curves",
        master=f"local[{cores}]",
        extra_conf={"spark.sql.shuffle.partitions": cores},
    )

    def run_once(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 3)

    results: dict[str, dict[str, float]] = {n: {} for n in HEADLINE}
    for d in dirs:
        sf = _sf_of(d)
        print(f"== scale point sf={sf} ({d}) ==", flush=True)
        for n in HEADLINE:  # warm-up pass, untimed
            run_once(n, d)
        for n in HEADLINE:
            samples = sorted(run_once(n, d) for _ in range(n_runs))
            med = samples[len(samples) // 2]
            results[n][f"{sf:g}"] = med
            print(f"  {n}: {med}s {samples}", flush=True)

    sfs = sorted(_sf_of(d) for d in dirs)
    log_sf = [math.log(s) for s in sfs]
    rows = {}
    for n in HEADLINE:
        ts = [results[n][f"{s:g}"] for s in sfs]
        alpha = _slope(log_sf, [math.log(max(t, 1e-3)) for t in ts])
        # tail exponent over the last two (largest) points: there the
        # fixed per-query overhead matters least, so a hidden quadratic
        # shows as ~2 even when the full-fit alpha is overhead-damped
        alpha_tail = math.log(max(ts[-1], 1e-3) / max(ts[-2], 1e-3)) / (
            log_sf[-1] - log_sf[-2]
        )
        rows[n] = {
            "sec_by_sf": results[n],
            "alpha": round(alpha, 3),
            "alpha_tail": round(alpha_tail, 3),
            "flag": bool(
                (alpha > 1.15 or alpha_tail > 1.3) and ts[-1] > 1.0
            ),
        }
    if only and out_path.exists():
        # merge mode: keep every previously measured row, overwrite the
        # re-measured names (scale-point equality was checked up front)
        prior = json.loads(out_path.read_text())
        assert prior["sfs"] == sfs, (prior["sfs"], sfs)
        rows = {**prior["queries"], **rows}
    out = {
        "sfs": sfs,
        "n_runs": n_runs,
        "queries": rows,
        "flagged": sorted(n for n, r in rows.items() if r["flag"]),
    }
    out_path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"flagged": out["flagged"], "file": out_path.name}))


if __name__ == "__main__":
    main()
