"""Measure the skew-critical paths against a planted Zipfian hot key
(VERDICT r8, task 2): the sf10 sweep proved VOLUME scaling, but its
clone fixtures are uniform by construction — star edges, the salted
join, and the per-key window had never been measured against the
distribution they exist for.

    python scripts/make_scaled_fixtures.py      # if /tmp was wiped
    python scripts/make_skew_fixtures.py        # builds the sf1 twin pair
    python scripts/skew_stress.py               # writes SKEW_r09.json

Instrument design (inherits the scaling-curve lessons):

- The uniform and skewed warehouses come from the SAME writer with the
  SAME fan-out (make_skew_fixtures.py) — identical row counts, schemas,
  and file layout; the ONLY difference is the key distribution, so the
  skewed/uniform runtime ratio isolates skew.
- Each query is measured as a back-to-back PAIR (uniform then skewed,
  one warm-up + median of N=3 each) with a control probe before the
  pair; a control deviating >1.4x from the pass median re-measures that
  pair once, then refuses the artifact — the bench/scaling drift
  protocol, applied per-pair because the ratio is only meaningful when
  both sides saw the same box.
- The join tier is additionally measured with broadcast DISABLED
  (autoBroadcastJoinThreshold=-1): at sf1 the customer side broadcasts
  and no shuffle join exists to skew — but the 100 TB regime this
  engine targets is fact-fact, where both sides shuffle. AQE (including
  its skew-join splitting) stays ON in all variants: the question is
  what the engine's REAL config does with a hot key, with and without
  the explicit salt.

Structural counts recorded alongside wall times: the skewed corpus' hot
LSH bucket size, its star-edge count (must stay ~linear: <= bands x
hot + slack) and its clique-pair count (quadratic by design — recorded
to show what the CC path avoids).
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import contextmanager
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from rws_data_ingester_spark.session import get_spark  # noqa: E402

N_RUNS = int(os.environ.get("SPARK_GRAFT_SKEW_RUNS", "3"))
CONTROL_GATE = float(os.environ.get("SPARK_GRAFT_SKEW_CONTROL_GATE", "1.4"))
PAIR_ROOT = os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_skew/sf1")
OUT = REPO / os.environ.get("SPARK_GRAFT_SKEW_OUT", "SKEW_r09.json")


def _unsalted_twin(spark, sf_dir):
    """The plain-join twin of join_salted_skew: same output, no salt —
    the baseline the salt premium/benefit is read against."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.functions.rounding import pround

    c = Catalog(spark, sf_dir)
    joined = c.orders.join(
        c.customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        pround(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def _adaptive_twin(spark, sf_dir):
    """Same aggregate through salted_join_adaptive: sampled hot-key
    detection, salt only the detected head, plain join for the rest."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.functions.rounding import pround
    from rws_data_ingester_spark.operators.scale import salted_join_adaptive

    c = Catalog(spark, sf_dir)
    joined = salted_join_adaptive(
        c.orders,
        c.customer.select("c_custkey", "c_mktsegment"),
        "o_custkey",
        "c_custkey",
        n_salts=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        pround(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@contextmanager
def _conf(spark, confs: dict):
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def main() -> None:
    from rws_data_ingester_spark.plans import REGISTRY

    uniform = os.path.join(PAIR_ROOT, "uniform")
    skewed = os.path.join(PAIR_ROOT, "skewed")
    manifest_path = os.path.join(PAIR_ROOT, "skew_manifest.json")
    if not (os.path.isdir(uniform) and os.path.isdir(skewed)):
        raise SystemExit(
            f"skew pair missing under {PAIR_ROOT} — run "
            "scripts/make_skew_fixtures.py first"
        )
    manifest = json.loads(Path(manifest_path).read_text())

    # same regime the sf1 scaling point ran in: fixed local[8], AQE
    # initial partition count scaled to the SF (per-partition bytes
    # constant — instrument v2.1)
    cores = int(os.environ.get("SPARK_GRAFT_SKEW_CORES", "8"))
    parts = int(os.environ.get("SPARK_GRAFT_SKEW_PARTS", str(cores * 10)))
    spark = get_spark(
        app_name="skew_stress",
        master=f"local[{cores}]",
        extra_conf={"spark.sql.shuffle.partitions": str(parts)},
    )

    # measured set: (name, fn, extra-conf dict or None)
    no_bhj = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    no_bhj_no_skewfix = {
        **no_bhj,
        # the regime the explicit salt exists for: a shuffle join whose
        # skew AQE cannot (or is not allowed to) split — e.g. the skewed
        # side feeds a same-key aggregate, or the planner rules the
        # split out. Locally that's simulated by disabling the AQE
        # skew-join rewrite.
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled": "false",
    }
    cases = [
        # the linear-edges claim: star-edge CC over the hot bucket
        ("dedup_clusters", REGISTRY["dedup_clusters"].fn, None),
        # quadratic BY DESIGN (per-pair scoring surface) — recorded to
        # show the cost the CC path avoids, not flagged
        ("dedup_minhash_candidates", REGISTRY["dedup_minhash_candidates"].fn, None),
        # hot window partition (10% of orders on one custkey)
        ("window_topk_per_group", REGISTRY["window_topk_per_group"].fn, None),
        # hot USER windows with no rank-limit pruning: sessionization is
        # a lag+sum window over (user, ts) — the hot user's 10% of all
        # events land in ONE sorted window partition (round-9 addendum)
        ("session_window_islands", REGISTRY["session_window_islands"].fn, None),
        # hot TOKENS: the boilerplate cluster repeats ~110 words across
        # 5% of the corpus, so tf-idf's per-token document-frequency agg
        # gets ~110 hot token keys (partial aggs should absorb this)
        ("text_tfidf", REGISTRY["text_tfidf"].fn, None),
        # the salted join vs its plain twin, in the fact-fact (no
        # broadcast) regime; AQE skew splitting ON in both
        ("join_salted_skew_nobhj", REGISTRY["join_salted_skew"].fn, no_bhj),
        ("join_unsalted_twin_nobhj", _unsalted_twin, no_bhj),
        # same pair with AQE's skew-join rewrite OFF — what the salt
        # rescues when the runtime split is unavailable
        ("join_salted_skew_noaqeskew", REGISTRY["join_salted_skew"].fn, no_bhj_no_skewfix),
        ("join_unsalted_twin_noaqeskew", _unsalted_twin, no_bhj_no_skewfix),
    ]

    control_fn = REGISTRY["q1_pricing_summary"].fn

    def run_once(fn, d, extra=None) -> float:
        t0 = time.perf_counter()
        if extra:
            with _conf(spark, extra):
                fn(spark, d).count()
        else:
            fn(spark, d).count()
        return round(time.perf_counter() - t0, 3)

    def control_median() -> float:
        with _conf(spark, {"spark.sql.shuffle.partitions": str(cores)}):
            return sorted(run_once(control_fn, uniform) for _ in range(3))[1]

    # settle phase (bench protocol): probe until two consecutive control
    # medians agree within 15%
    run_once(control_fn, uniform)
    prev = control_median()
    for _ in range(5):
        cur = control_median()
        if abs(cur - prev) / max(prev, 1e-3) <= 0.15:
            break
        print(f"settling: control {prev}s -> {cur}s", flush=True)
        prev = cur

    controls: dict[str, float] = {}
    rows: dict[str, dict] = {}

    def measure_pair(name, fn, extra, attempt=1) -> None:
        ctrl = control_median()
        controls[name] = ctrl
        out = {}
        for side, d in (("uniform", uniform), ("skewed", skewed)):
            run_once(fn, d, extra)  # warm-up, untimed
            samples = sorted(run_once(fn, d, extra) for _ in range(N_RUNS))
            out[side] = samples[len(samples) // 2]
            print(f"  {name}/{side}: {out[side]}s {samples}", flush=True)
        rows[name] = {
            "uniform_sec": out["uniform"],
            "skewed_sec": out["skewed"],
            "ratio": round(out["skewed"] / max(out["uniform"], 1e-3), 3),
            "n_runs": N_RUNS,
            "control": ctrl,
            "attempt": attempt,
        }

    for name, fn, extra in cases:
        print(f"== {name} ==", flush=True)
        measure_pair(name, fn, extra)

    # Pathological tier (optional): a second pair with a much heavier
    # Zipf head (built with SPARK_GRAFT_SKEW_ORDER_FRAC=3 → 33% of
    # orders on one custkey) measures the join variants where a 10%
    # head is too mild to separate the strategies at local scale.
    patho_root = os.environ.get(
        "SPARK_GRAFT_SKEW_PATHO_DIR", "/tmp/spark_graft_skew/sf1-patho"
    )
    patho_rows: dict[str, dict] = {}
    if os.path.isdir(os.path.join(patho_root, "skewed")):
        p_uniform = os.path.join(patho_root, "uniform")
        p_skewed = os.path.join(patho_root, "skewed")

        def measure_patho(name, fn, extra) -> None:
            ctrl = control_median()
            controls[f"patho:{name}"] = ctrl
            out = {}
            for side, d in (("uniform", p_uniform), ("skewed", p_skewed)):
                run_once(fn, d, extra)
                samples = sorted(run_once(fn, d, extra) for _ in range(N_RUNS))
                out[side] = samples[len(samples) // 2]
                print(f"  patho:{name}/{side}: {out[side]}s {samples}", flush=True)
            patho_rows[name] = {
                "uniform_sec": out["uniform"],
                "skewed_sec": out["skewed"],
                "ratio": round(out["skewed"] / max(out["uniform"], 1e-3), 3),
                "n_runs": N_RUNS,
                "control": ctrl,
            }

        for name, fn, extra in cases:
            if not name.startswith("join_"):
                continue
            print(f"== patho:{name} ==", flush=True)
            measure_patho(name, fn, extra)

    # per-pair contention retry + whole-pass refusal (drift protocol)
    med = sorted(controls.values())[len(controls) // 2]
    for name, fn, extra in cases:
        r = controls[name] / max(med, 1e-3)
        if max(r, 1 / max(r, 1e-9)) > CONTROL_GATE:
            print(f"{name}: control {controls[name]}s deviates {r:.2f}x — retrying pair", flush=True)
            measure_pair(name, fn, extra, attempt=2)
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

    # structural counts on the skewed corpus: the linear-vs-quadratic
    # ledger the ratios are explained by
    from rws_data_ingester_spark.catalog import load_table
    from rws_data_ingester_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_star_edges,
        minhash_signature,
    )

    d = load_table(spark, skewed, "documents")
    n_docs = d.count()
    n_hot = d.filter(F.col("doc_id") % round(1 / manifest["doc_frac"]) == 0).count()
    sigs = minhash_signature(d, "doc_id", "text").cache()
    star_edges = lsh_star_edges(sigs, "doc_id").count()
    clique_pairs = lsh_candidate_pairs(sigs, "doc_id").count()
    # biggest LSH bucket (band-level), for the record
    from rws_data_ingester_spark.operators.dedup import _banded

    hot_bucket = (
        _banded(sigs, "doc_id", 16, 4)
        .groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    sigs.unpersist()
    ev = load_table(spark, skewed, "events")
    hot_user_rows = ev.filter(F.col("user_id") == manifest["hot_user"]).count()
    o = load_table(spark, skewed, "orders")
    hot_cust_rows = o.filter(F.col("o_custkey") == manifest["hot_cust"]).count()

    structure = {
        "n_docs": n_docs,
        "n_hot_docs": n_hot,
        "hot_lsh_bucket": hot_bucket,
        "star_edges": star_edges,
        "clique_pairs": clique_pairs,
        "star_edges_per_hot_doc": round(star_edges / max(n_hot, 1), 3),
        "hot_user_rows": hot_user_rows,
        "hot_cust_rows": hot_cust_rows,
    }
    # the linear claim, asserted in the artifact writer itself: a hot
    # bucket of k members must emit O(k) star edges (≤ bands per doc,
    # plus base-corpus slack), never the quadratic clique count
    assert star_edges <= 4 * n_hot + 0.01 * n_docs, structure
    assert clique_pairs > 10 * star_edges, structure

    # a full re-run must not drop the sf10 join section measured by
    # scripts/skew_join_sf10.py — carry it forward from the existing
    # artifact
    prior_sf10 = None
    if OUT.exists():
        prior_sf10 = json.loads(OUT.read_text()).get("sf10_joins")
    out = {
        "protocol": "skew-v1-paired-controlled",
        "sf10_joins": prior_sf10,
        "pair_root": PAIR_ROOT,
        "manifest": manifest,
        "cores": cores,
        "shuffle_partitions": parts,
        "control_query": "q1_pricing_summary",
        "controls": controls,
        "queries": rows,
        "pathological": patho_rows or None,
        "pathological_pair_root": patho_root if patho_rows else None,
        "structure": structure,
    }
    OUT.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"file": OUT.name, "ratios": {k: v["ratio"] for k, v in rows.items()}, "structure": structure}))


if __name__ == "__main__":
    main()
