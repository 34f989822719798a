"""Measure per-query scaling curves across scale factors (VERDICT r6,
task 2; extended r8 per VERDICT r7, task 2): run the bench HEADLINE
queries at the k-id-offset-clone warehouses from
``make_scaled_fixtures.py``, fit a per-query scaling exponent, and flag
anything superlinear beyond its declared complexity.

    python scripts/make_scaled_fixtures.py            # once, ~2 min
    python scripts/scaling_curves.py                  # writes SCALING_r08.json

Instrument design — the measurement must isolate WORK growth:

- All scale points come from the same generator (k=1 included), so
  parquet layout, compression, and files-per-row density are uniform.
  Measuring the driver's single-file sf0.1 fixtures against multi-file
  clones inverted the curve (10x data, 1.8x FASTER — the 1x scan ran on
  one task, the 10x scan on twenty).
- The session is a FIXED local[8] and every table written as >=8 files,
  so all scale points saturate the same cores and wall time tracks total
  work instead of free parallelism — the regime a 1000-executor cluster
  is in once data outgrows it.
- shuffle.partitions scales with the scale point (8 x sf/base_sf —
  instrument v2.1, round 8). It is AQE's INITIAL partition count: pinned
  at 8 (the round-7 protocol) AQE can only coalesce, never split, so at
  sf10 every shuffle partition holds 12.5x the bytes a production job
  would allow and sort/agg-heavy rows cross the executor memory cliff —
  measured: q21 at sf10 logged TaskMemoryManager allocation failures and
  ran ~20% slower at 8 partitions than at 80, and the zorder rewrite ran
  2x slower. Scaling the initial count lets AQE size partitions to its
  byte target at every point (per-partition bytes CONSTANT across the
  sweep — exactly how a real cluster holds its regime as data grows),
  so the fitted exponent measures work growth, not spill onset. Cores
  stay fixed; task-scheduling overhead grows ~linearly and is part of
  the honest cost.
- A control probe (instrument v2.2) runs the SAME query on the SAME
  base-point data before every scale point; its per-point medians land
  in the artifact (band-legibility) and a spread past
  SPARK_GRAFT_SCALE_CONTROL_GATE (default 1.4x) refuses the whole pass
  — this sandbox's speed wanders 2-4x, and one sweep shipped sf3 > sf10
  rows before this existed.

Protocol (mirrors bench.py's): per scale point, one untimed warm-up pass
over every query first (codegen/JIT compile out of the medians), then
median of N=3 timed runs per query. Exponent: least-squares slope of
log(t) vs log(sf) over the row's points — fixed per-query overhead
(planning, task launch) damps exponents BELOW the asymptotic complexity
at these absolute times, so the flag threshold is alpha > 1.15 AND
t(max_sf) > 1 s (sub-second queries are overhead-dominated and their
slope is noise). Expected-superlinear queries carry a declared bound
instead (sorts: n log n → alpha ≤ ~1.1 at this range; none quadratic).

Round-8 extension (VERDICT r7, task 2): the 30x sweep topped out at sf3
where fact-fact queries were just entering the data-dominated regime
(q18 tail alpha 0.99 means fixed cost only stopped mattering at the
last leg), so the scale-critical tier — every round-7 row with tail
alpha > 0.6, plus q21 (its sf1 step was probed in r7) — gets a 5th
point at ~sf10 (k=100). The sf3→sf10 leg is the first honest asymptotic
read for that tier. Artifact schema v2: rows carry their OWN
``sec_by_sf`` point set (tier rows have 5 points, carried-over rows 4)
and their OWN ``n_runs`` (merged rows measured under a different
SPARK_GRAFT_SCALE_RUNS keep their true sample count — round-7 advice).

Env knobs:
- SPARK_GRAFT_SCALE_TIER      comma list measured at the extra tier dirs
  (default: the round-8 scale-critical tier). "" disables the extension.
- SPARK_GRAFT_SCALE_TIER_DIRS comma list of extra scale dirs for the
  tier (default /tmp/spark_graft_scaled/sf10).
- SPARK_GRAFT_SCALE_ONLY      measure EXACTLY this comma list and merge
  into the existing OUT artifact, seeding from CARRY when OUT does not
  exist yet (refused when NEITHER exists — a fresh clone must run the
  full sweep, not silently write a partial artifact).
- SPARK_GRAFT_SCALE_CARRY     prior artifact whose rows seed OUT
  (default SCALING_r07.json if present); re-measured names overwrite
  carried rows, everything else keeps its recorded points and n_runs.
- SPARK_GRAFT_SCALE_OUT       output artifact (default SCALING_r08.json).
- SPARK_GRAFT_SCALE_RUNS / SPARK_GRAFT_SCALE_CORES as in round 7.
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

# Round-8 scale-critical tier: every SCALING_r07 row with tail alpha
# > 0.6 (the queries whose last measured leg was still steepening —
# zorder sink 1.00, q18 0.99, salted join 0.96, minhash 0.77,
# join_inner 0.76, CC path 0.72, cohort 0.69, near-dedup remove 0.68,
# broadcast star 0.66, LSH 0.63, window topk 0.63, rollup 0.61,
# training funnel 0.60, q5 0.60) plus q21 (VERDICT r7: its sf1 step was
# probed and cleared — the sf10 point pins that read).
DEFAULT_TIER = (
    "sink_zorder_pruning,q18_large_volume_customers,join_salted_skew,"
    "dedup_minhash_candidates,join_inner_customer_orders,dedup_clusters,"
    "cohort_retention,pipeline_near_dedup_remove,join_broadcast_star,"
    "simsearch_topk_lsh,window_topk_per_group,agg_rollup,"
    "pipeline_training_data,q5_local_supplier_volume,q21_waiting_suppliers"
)


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


def _fit_row(sec_by_sf: dict[str, float], n_runs: int) -> dict:
    """Exponents + flag from a row's own (possibly extended) point set."""
    sfs = sorted(float(s) for s in sec_by_sf)
    ts = [sec_by_sf[f"{s:g}"] for s in sfs]
    log_sf = [math.log(s) for s in sfs]
    alpha = _slope(log_sf, [math.log(max(t, 1e-3)) for t in ts])
    # tail exponent over the last two (largest) points: there the fixed
    # per-query overhead matters least, so a hidden quadratic shows as
    # ~2 even when the full-fit alpha is overhead-damped
    alpha_tail = math.log(max(ts[-1], 1e-3) / max(ts[-2], 1e-3)) / (
        log_sf[-1] - log_sf[-2]
    )
    return {
        "sec_by_sf": {f"{s:g}": sec_by_sf[f"{s:g}"] for s in sfs},
        "n_runs": n_runs,
        "alpha": round(alpha, 3),
        "alpha_tail": round(alpha_tail, 3),
        "flag": bool((alpha > 1.15 or alpha_tail > 1.3) and ts[-1] > 1.0),
    }


def main() -> None:
    # import AFTER sys.path setup; bench.HEADLINE is the measured set,
    # optionally widened to more of the registry (round-7 default: the
    # scale-sensitive non-headline tier — the full dedup-cluster path,
    # tf-idf, packing, contiguous ids, salted join, SCD2 intervals,
    # cohort retention, the global sort, and the q18/q21 self-join
    # composites). Override with SPARK_GRAFT_SCALE_EXTRA="" to measure
    # the headline set only, or a comma list to choose.
    from bench import HEADLINE as _BENCH_HEADLINE, NOOP_TWINS
    from rws_data_ingester_spark.plans import REGISTRY

    # The noop-sink twins are bench-only re-timings of queries already in
    # the headline set (same registered fn, different action) — scaling
    # curves measure the registered queries, so the twins add nothing here.
    BENCH_HEADLINE = [n for n in _BENCH_HEADLINE if n not in NOOP_TWINS]

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
    tier_env = os.environ.get("SPARK_GRAFT_SCALE_TIER", DEFAULT_TIER)
    tier = [n for n in tier_env.split(",") if n and n in HEADLINE]
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
    tier_dirs = [
        d
        for d in os.environ.get(
            "SPARK_GRAFT_SCALE_TIER_DIRS", "/tmp/spark_graft_scaled/sf10"
        ).split(",")
        if d and os.path.isdir(d)
    ]
    if tier and not tier_dirs:
        print(
            "WARNING: tier extension requested but no tier dir exists "
            "(run make_scaled_fixtures.py with SPARK_GRAFT_SCALE_KS=100); "
            "tier rows will carry base points only",
            flush=True,
        )
    out_path = REPO / os.environ.get("SPARK_GRAFT_SCALE_OUT", "SCALING_r08.json")
    carry_name = os.environ.get("SPARK_GRAFT_SCALE_CARRY", "SCALING_r07.json")
    carry_path = REPO / carry_name if carry_name else None
    if only:
        # merge-mode preconditions, checked BEFORE any measurement:
        # (a) the seed artifact the 'only' rows merge into (OUT if it
        # exists, else the CARRY artifact) must exist — on a fresh clone
        # with both deleted/renamed, silently writing a partial artifact
        # containing only the 'only' rows would surface hours later in
        # test_scaling_artifact (round-7 advice); (b) the re-measured
        # rows' BASE points must match the seed's so per-row curves stay
        # comparable.
        seed_path = (
            out_path
            if out_path.exists()
            else carry_path
            if carry_path and carry_path.exists()
            else None
        )
        if seed_path is None:
            raise SystemExit(
                f"SPARK_GRAFT_SCALE_ONLY merge refused: neither "
                f"{out_path.name} nor the carry artifact "
                f"({carry_name or 'unset'}) exists — run the full sweep "
                f"first (unset SCALE_ONLY), then merge re-measured rows"
            )
        prior_sfs = json.loads(seed_path.read_text())["sfs"]
        planned = sorted(_sf_of(d) for d in dirs)
        if prior_sfs != planned:
            raise SystemExit(
                f"SPARK_GRAFT_SCALE_ONLY merge refused: scale points "
                f"{planned} do not match {seed_path.name}'s "
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
    all_sfs = sorted(_sf_of(d) for d in dirs + tier_dirs)
    base_sf = all_sfs[0]
    # Per-point control probe (instrument v2.2 — the bench.py lesson,
    # re-learned here the hard way: one sweep shipped sf3 > sf10 rows
    # because this sandbox's speed wandered 2-4x mid-pass). The SAME
    # fixed query on the SAME base-point data runs before every scale
    # point; any cross-point spread in its medians is the BOX, not the
    # engine, and a spread past the gate means the pass's exponents mix
    # contention into the curve — refuse to write the artifact.
    control_name = os.environ.get("SPARK_GRAFT_SCALE_CONTROL", "q1_pricing_summary")
    if control_name not in REGISTRY:
        raise SystemExit(f"unknown control query: {control_name}")
    control_gate = float(os.environ.get("SPARK_GRAFT_SCALE_CONTROL_GATE", "1.4"))
    controls: dict[str, float] = {}

    def control_median() -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(cores)))
        return sorted(run_once(control_name, dirs[0]) for _ in range(3))[1]

    # Settle phase (the bench.py protocol): the first minutes after a
    # fresh JVM + a just-killed predecessor read slow (observed: a first
    # control of 0.906 s against 0.35-0.42 s at every later point, which
    # tripped the gate on an otherwise-clean pass). Probe until two
    # consecutive control medians agree within 15% before measuring.
    run_once(control_name, dirs[0])  # untimed warm-up
    prev = control_median()
    for _ in range(5):
        cur = control_median()
        if abs(cur - prev) / max(prev, 1e-3) <= 0.15:
            break
        print(f"settling: control {prev}s -> {cur}s", flush=True)
        prev = cur

    def measure_point(d: str, attempt: int = 1) -> None:
        sf = _sf_of(d)
        # instrument v2.1: per-partition bytes constant across the sweep
        # (see module docstring) — AQE's initial partition count grows
        # with the data, cores stay fixed
        parts = max(int(cores), round(int(cores) * sf / base_sf))
        names = HEADLINE if d in dirs else [n for n in tier if n in HEADLINE]
        if not names:
            # e.g. SCALE_ONLY of non-tier names while the sf10 tier dir
            # exists: the point contributes zero measurements, so probing
            # its control (and letting it trigger a retry or refuse the
            # pass) would gate the artifact on a point that isn't in it
            # (round-8 ADVICE).
            print(f"== scale point sf={sf} ({d}): no queries, skipped ==",
                  flush=True)
            return
        # control probe: base data, base partitioning, before the point
        ctrl = control_median()
        controls[f"{sf:g}"] = ctrl
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        print(
            f"== scale point sf={sf} ({d}, {len(names)} queries, "
            f"shuffle.partitions={parts}, control={ctrl}s, "
            f"attempt={attempt}) ==",
            flush=True,
        )
        for n in names:  # warm-up pass, untimed
            run_once(n, d)
        for n in names:
            samples = sorted(run_once(n, d) for _ in range(n_runs))
            med = samples[len(samples) // 2]
            results[n][f"{sf:g}"] = med
            print(f"  {n}: {med}s {samples}", flush=True)

    for d in dirs + tier_dirs:
        measure_point(d)

    # Per-point contention retry (surgical version of bench.py's whole-
    # pass drift retry): a point whose control deviates past the gate
    # from the PASS MEDIAN control was measured on a wandering box — its
    # rows would bend the curve — so that point alone is re-measured
    # once. Still breaching after the retry → refuse the artifact.
    # No point probed (every scale dir skipped via the empty-names early
    # return) → nothing to gate; fall through and write the artifact
    # without control participation instead of IndexError (r9 ADVICE).
    if not controls:
        print("no scale point measured a control — gate skipped", flush=True)
    med_ctrl = (
        sorted(controls.values())[len(controls) // 2] if controls else 0.0
    )
    for d in dirs + tier_dirs:
        sf_key = f"{_sf_of(d):g}"
        if sf_key not in controls:  # point skipped (no queries)
            continue
        ratio = controls[sf_key] / max(med_ctrl, 1e-3)
        if max(ratio, 1 / max(ratio, 1e-9)) > control_gate:
            print(
                f"point sf={sf_key} control {controls[sf_key]}s deviates "
                f"{ratio:.2f}x from pass median {med_ctrl}s — re-measuring "
                f"that point once",
                flush=True,
            )
            measure_point(d, attempt=2)
    med_ctrl = (
        sorted(controls.values())[len(controls) // 2] if controls else 0.0
    )
    bad = {
        k: v
        for k, v in controls.items()
        if max(v / max(med_ctrl, 1e-3), med_ctrl / max(v, 1e-3)) > control_gate
    }
    if bad:
        raise SystemExit(
            f"contended pass refused: control query {control_name} medians "
            f"{controls} — points {sorted(bad)} still deviate past the "
            f"{control_gate}x gate from the pass median after one retry; "
            f"the box wandered mid-sweep, so the exponents would mix "
            f"contention into the curve; artifact NOT written, re-run when "
            f"the box settles"
        )

    PROTOCOL = "v2.2-pp-const-controlled"
    sfs = sorted(_sf_of(d) for d in dirs)
    # rows measured THIS run are stamped with the current protocol
    # per-row (round-8 ADVICE: a single top-level protocol misattributed
    # carried v1 rows to the new protocol with no way to tell which
    # rows mixed protocols)
    rows = {
        n: {**_fit_row(results[n], n_runs), "protocol": PROTOCOL}
        for n in HEADLINE
    }
    seed: dict[str, dict] = {}
    prior: dict = {}
    seed_src = (
        out_path
        if only and out_path.exists()
        else carry_path
        if carry_path and carry_path.exists()
        else None
    )
    if seed_src is not None:
        prior = json.loads(seed_src.read_text())
        prior_default_runs = prior.get("n_runs", n_runs)
        # v1 artifacts (schema 1, no protocol field) were measured under
        # the round-7 fixed-8-partition protocol
        prior_protocol = prior.get("protocol", "v1-fixed-parts")
        for n, row in prior["queries"].items():
            # v1 rows have no per-row n_runs: backfill the artifact-wide
            # value they were actually measured under (round-7 advice);
            # same for the per-row protocol + provenance marker
            seed[n] = {
                **row,
                "n_runs": row.get("n_runs", prior_default_runs),
                "protocol": row.get("protocol", prior_protocol),
                "carried_from": row.get("carried_from", seed_src.name),
            }
    # carried rows keep their recorded points/n_runs/protocol;
    # re-measured names overwrite
    rows = {**seed, **rows}
    # merge mode measures a SUBSET: top-level tier/tier_sfs/controls must
    # union with the seed artifact's, not replace them — SCALE_ONLY of
    # one non-tier name used to rewrite tier to near-empty and fail the
    # tier-extension pin on an otherwise-valid merged artifact
    # (round-8 ADVICE)
    out_tier = sorted(set(tier) | set(prior.get("tier", []))) if only else sorted(tier)
    run_tier_sfs = sorted(_sf_of(d) for d in tier_dirs)
    out_tier_sfs = (
        sorted(set(run_tier_sfs) | set(prior.get("tier_sfs", [])))
        if only
        else run_tier_sfs
    )
    out_controls = (
        {**prior.get("controls", {}), **controls} if only else controls
    )
    out = {
        "schema": 2,
        # the protocol rows measured THIS run used (v2.1 per-partition-
        # bytes-constant: shuffle.partitions = cores x sf/base_sf, AQE
        # sizes by bytes); per-row `protocol` is authoritative for
        # carried rows
        "protocol": PROTOCOL,
        # per-point control medians (same query, same base data, base
        # partitioning): band-legibility for the whole pass — a reader
        # can see the box was steady without trusting the gate. In merge
        # mode, points not re-probed this run keep the seed artifact's
        # control values.
        "controls": out_controls,
        "control_query": control_name,
        "sfs": sfs,
        "n_runs": n_runs,
        "tier": out_tier,
        "tier_sfs": out_tier_sfs,
        "queries": rows,
        "flagged": sorted(n for n, r in rows.items() if r["flag"]),
    }
    out_path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"flagged": out["flagged"], "file": out_path.name}))


if __name__ == "__main__":
    main()
