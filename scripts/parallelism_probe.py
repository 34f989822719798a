"""8-vs-32-core wall-clock probe at sf1 (VERDICT r10, item 6).

Every 8-vs-32 ratio in BENCH_r10's scaling block read ≈1 because at
sf0.1 each headline query is sub-second and scheduler/driver-bound —
"parallelism at scale" was argued from plan shape only. This probe
re-asks the question at a scale factor where compute dominates: the
heaviest headline queries run against the k=10 clone warehouse from
``make_scaled_fixtures.py`` (same generator for every table, multi-file
parquet so an 8-core session is saturated) under the DRIVER'S OWN core
contract — a fresh JVM per core count with ``SPARK_GRAFT_CPUS`` driving
both ``local[N]`` and ``spark.sql.shuffle.partitions``, exactly as
``session.get_spark`` wires the bench.

Box-wander control (this sandbox drifts ±15-40% across minutes): core
counts alternate A-B-A-B across ``PASSES`` fresh-JVM passes, so each
32-core pass is bracketed by 8-core passes minutes apart; per-query
medians pool all passes at that core count, and every pass also times
the bench's CPU control (hash16 probe) so cross-pass drift is on the
record next to the ratios.

Usage:
    python scripts/make_scaled_fixtures.py     # once (writes /tmp clones)
    python scripts/parallelism_probe.py        # writes PARALLELISM_r11.json

Env: SPARK_GRAFT_PAR_DIR (default /tmp/spark_graft_scaled/sf1),
SPARK_GRAFT_PAR_RUNS (timed runs per query per pass, default 3),
SPARK_GRAFT_PAR_QUERIES (comma list; default the 5 heaviest + 1
shuffle-heavy sessionization), SPARK_GRAFT_PAR_OUT.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

DEFAULT_QUERIES = (
    "pipeline_training_data",
    "dedup_minhash_candidates",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "simsearch_topk_exact",
    "session_window_islands",
)
PASSES = (32, 8, 32, 8)


def run_pass(cores: int, sf_dir: str, names: list[str], n_runs: int) -> dict:
    """One fresh-JVM pass at `cores`: warmup + n_runs per query, plus the
    CPU control. Executed as a subprocess so each core count gets the
    clean JVM the driver's own bench gives it."""
    code = f"""
import json, sys, time
sys.path.insert(0, {str(REPO)!r})
from rws_data_ingester_spark.plans import REGISTRY
from rws_data_ingester_spark.session import get_spark
from bench import run_cpu_control

spark = get_spark(app_name="parallelism_probe_c{cores}")
sf_dir = {sf_dir!r}
out = {{"cores": {cores}, "queries": {{}}, "cpu_control": []}}
spark.range(1).count()
for name in {names!r}:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).count()  # untimed warmup (codegen/JIT)
    ts = []
    for _ in range({n_runs}):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        ts.append(round(time.perf_counter() - t0, 3))
    out["queries"][name] = ts
    t0 = time.perf_counter()
    run_cpu_control(spark)
    out["cpu_control"].append(round(time.perf_counter() - t0, 3))
print("PROBE_JSON:" + json.dumps(out))
spark.stop()
"""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_JSON:"):
            return json.loads(line[len("PROBE_JSON:"):])
    raise RuntimeError(
        f"pass c{cores} produced no result:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_PAR_DIR", "/tmp/spark_graft_scaled/sf1")
    if not os.path.isdir(sf_dir):
        raise SystemExit(
            f"{sf_dir} missing — run scripts/make_scaled_fixtures.py first"
        )
    names = [
        n
        for n in os.environ.get(
            "SPARK_GRAFT_PAR_QUERIES", ",".join(DEFAULT_QUERIES)
        ).split(",")
        if n
    ]
    n_runs = int(os.environ.get("SPARK_GRAFT_PAR_RUNS", "3"))
    out_path = REPO / os.environ.get("SPARK_GRAFT_PAR_OUT", "PARALLELISM_r11.json")

    passes = []
    for i, cores in enumerate(PASSES):
        t0 = time.time()
        res = run_pass(cores, sf_dir, names, n_runs)
        res["wall"] = round(time.time() - t0, 1)
        passes.append(res)
        print(f"pass {i} c{cores}: {res['queries']} cpu={res['cpu_control']}", flush=True)

    by_cores: dict[int, dict[str, list[float]]] = {}
    cpu_by_cores: dict[int, list[float]] = {}
    for p in passes:
        q = by_cores.setdefault(p["cores"], {})
        for name, ts in p["queries"].items():
            q.setdefault(name, []).extend(ts)
        cpu_by_cores.setdefault(p["cores"], []).extend(p["cpu_control"])

    rows = {}
    for name in names:
        m32 = statistics.median(by_cores[32][name])
        m8 = statistics.median(by_cores[8][name])
        rows[name] = {
            "sec_c32": round(m32, 3),
            "sec_c8": round(m8, 3),
            "ratio_c8_over_c32": round(m8 / m32, 2),
        }
    artifact = {
        "schema": 1,
        "purpose": "8-vs-32-core wall ratio at a compute-dominated SF "
        "(VERDICT r10 item 6); ratios >> 1 show the plans actually use "
        "the extra cores, unlike the sf0.1 block where all ratios were ~1",
        "sf_dir": sf_dir,
        "protocol": {
            "passes": list(PASSES),
            "runs_per_pass": n_runs,
            "fresh_jvm_per_pass": True,
            "core_contract": "SPARK_GRAFT_CPUS -> local[N] + shuffle.partitions,"
            " via session.get_spark (the driver's own bench wiring)",
        },
        "cpu_control_hash16": {
            str(c): sorted(v) for c, v in cpu_by_cores.items()
        },
        "queries": rows,
        "raw_passes": passes,
    }
    out_path.write_text(json.dumps(artifact, indent=1))
    print(json.dumps({k: v for k, v in rows.items()}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
