"""End-to-end smoke of the scaling instrument (VERDICT r7, task 7): the
curves in SCALING_r*.json are only as trustworthy as the harness that
writes them, and that harness normally runs OUTSIDE the suite (on /tmp
fixtures the sandbox wipes). This exercises scripts/scaling_curves.py
whole — fixture build at sf0.001, base sweep at two points, tier
extension at a third, artifact write, merge refusal — in about a
minute, so the instrument itself can't rot between rounds.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

from tests.conftest import SF_DIR

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def scale_dirs(spark, tmp_path_factory):
    """Three clone warehouses off the sf0.001 fixture: k=1/3 as the base
    sweep, k=10 as the tier-extension point."""
    from scripts.make_scaled_fixtures import build_scaled_dir

    root = tmp_path_factory.mktemp("scale_smoke")
    dirs = {}
    for k in (1, 3, 10):
        out = str(root / f"sf{0.001 * k:g}")
        build_scaled_dir(spark, SF_DIR, out, k=k)
        dirs[k] = out
    return dirs


def _run_main(monkeypatch, argv_dirs, **env):
    import sys

    import bench
    import scripts.scaling_curves as sc

    # keep the smoke to two cheap queries: one headline-only, one tier
    monkeypatch.setattr(bench, "HEADLINE", ["q1_pricing_summary"])
    monkeypatch.setattr(sys, "argv", ["scaling_curves.py", *argv_dirs])
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    sc.main()


def test_harness_end_to_end_with_tier_extension(
    spark, scale_dirs, tmp_path, monkeypatch
):
    out = tmp_path / "SCALING_smoke.json"
    _run_main(
        monkeypatch,
        [scale_dirs[1], scale_dirs[3]],
        SPARK_GRAFT_SCALE_EXTRA="agg_rollup",
        SPARK_GRAFT_SCALE_TIER="agg_rollup",
        SPARK_GRAFT_SCALE_TIER_DIRS=scale_dirs[10],
        SPARK_GRAFT_SCALE_OUT=str(out),
        SPARK_GRAFT_SCALE_CARRY="",
        SPARK_GRAFT_SCALE_RUNS="1",
        SPARK_GRAFT_SCALE_CORES="4",
        # the smoke tests PLUMBING; sub-second sf0.001 control medians
        # jitter far past the real sweep's 1.4x gate on a contended box,
        # so the gate is opened wide here (the refusal path has its own
        # dedicated test below via the artifact-seed guard)
        SPARK_GRAFT_SCALE_CONTROL_GATE="1000",
    )
    data = json.loads(out.read_text())
    assert data["schema"] == 2
    assert data["sfs"] == [0.001, 0.003]
    assert data["tier"] == ["agg_rollup"]
    assert data["tier_sfs"] == [0.01]
    # v2.2: one steady-box control median per scale point, all positive
    assert set(data["controls"]) == {"0.001", "0.003", "0.01"}
    assert all(v > 0 for v in data["controls"].values())
    assert data["control_query"] == "q1_pricing_summary"
    # headline-only row: base points only; tier row: base + extension
    assert set(data["queries"]["q1_pricing_summary"]["sec_by_sf"]) == {
        "0.001",
        "0.003",
    }
    assert set(data["queries"]["agg_rollup"]["sec_by_sf"]) == {
        "0.001",
        "0.003",
        "0.01",
    }
    for row in data["queries"].values():
        assert row["n_runs"] == 1
        assert all(t > 0 for t in row["sec_by_sf"].values())
        assert "alpha" in row and "alpha_tail" in row and "flag" in row


def test_merge_refused_without_seed_artifact(tmp_path, monkeypatch):
    """SCALE_ONLY with neither OUT nor CARRY present must refuse up
    front (round-7 advice: a fresh clone must not silently write a
    partial artifact), BEFORE any Spark work — so this needs no
    fixtures and must fail fast."""
    import sys

    import scripts.scaling_curves as sc

    monkeypatch.setenv("SPARK_GRAFT_SCALE_ONLY", "q1_pricing_summary")
    monkeypatch.setenv("SPARK_GRAFT_SCALE_OUT", str(tmp_path / "absent.json"))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_CARRY", "")
    # two dirs must exist for the dir check to pass so the refusal under
    # test is the SEED one, not the dir-count one
    d1, d2 = tmp_path / "sf0.001", tmp_path / "sf0.003"
    d1.mkdir(), d2.mkdir()
    monkeypatch.setattr(sys, "argv", ["scaling_curves.py", str(d1), str(d2)])
    with pytest.raises(SystemExit, match="merge refused"):
        sc.main()
