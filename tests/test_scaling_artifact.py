"""CI pin for the multi-scale-factor scaling evidence (VERDICT r6,
task 2): the latest SCALING_r*.json must exist, cover every bench
HEADLINE query, span >=3 scale points, and carry zero superlinear
flags. If a future round regenerates the curves and a query regresses
into a flag, the suite fails until the plan is fixed — the same
maintenance-proof pattern as the evidence-freshness gate.

No Spark needed: this reads the committed artifact only. The glob and
round parse survive two-digit rounds (round-6 trap: a 'r0*' glob
freezes exactly when the build reaches round 10)."""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _latest_scaling_artifact() -> Path:
    best = None
    best_round = -1
    for path in REPO.glob("SCALING_r*.json"):
        m = re.search(r"_r(\d+)$", path.stem)
        if m is None:
            raise AssertionError(
                f"file matches SCALING_r*.json but not _r<digits>: {path.name}"
            )
        rnd = int(m.group(1))
        if rnd > best_round:
            best, best_round = path, rnd
    assert best is not None, "no SCALING_r*.json artifact committed"
    return best


def test_scaling_curves_cover_headline_set_with_no_superlinear_flags():
    import sys

    sys.path.insert(0, str(REPO))
    from bench import HEADLINE as _HEADLINE, NOOP_TWINS

    # noop-sink twins are bench-only re-timings (same registered query,
    # noop action) — the scaling artifact covers the registered queries
    HEADLINE = [n for n in _HEADLINE if n not in NOOP_TWINS]

    data = json.loads(_latest_scaling_artifact().read_text())
    assert len(data["sfs"]) >= 3, data["sfs"]
    assert data["sfs"] == sorted(data["sfs"])
    # the measured span must be wide enough for the tail exponent to
    # mean anything: >=10x between smallest and largest point
    assert data["sfs"][-1] / data["sfs"][0] >= 10
    missing = [n for n in HEADLINE if n not in data["queries"]]
    assert not missing, f"headline queries with no scaling curve: {missing}"
    base = {f"{s:g}" for s in data["sfs"]}
    schema = data.get("schema", 1)
    for name, row in data["queries"].items():
        if schema >= 2:
            # v2: rows carry their OWN point set — every row covers at
            # least the base points; tier rows may extend beyond them
            assert base <= set(row["sec_by_sf"]), name
            assert row.get("n_runs", 0) >= 3, name
        else:
            assert len(row["sec_by_sf"]) == len(data["sfs"]), name
        assert all(t > 0 for t in row["sec_by_sf"].values()), name
    assert data["flagged"] == [], (
        f"superlinear queries flagged in {_latest_scaling_artifact().name}: "
        f"{data['flagged']} — fix the plan (or its declared complexity) "
        f"before re-recording the artifact"
    )


def test_scaling_v2_tier_extends_one_decade():
    """Round-8 pin (VERDICT r7, task 2): the scale-critical tier — every
    round-7 row with tail alpha > 0.6, plus q21 — must carry a scale
    point at least 3x beyond the base sweep's largest (the sf3→sf10 leg
    is the first honest asymptotic read: at sf3 the fact-fact tier was
    just entering the data-dominated regime)."""
    data = json.loads(_latest_scaling_artifact().read_text())
    if data.get("schema", 1) < 2:
        import pytest

        pytest.skip("pre-v2 artifact (round 7); pin applies from round 8 on")
    tier = data["tier"]
    assert len(tier) >= 10, tier
    base_max = data["sfs"][-1]
    assert data["tier_sfs"], "tier extension ran with no extra scale dir"
    assert max(data["tier_sfs"]) >= 3 * base_max, data["tier_sfs"]
    for name in tier:
        row = data["queries"][name]
        pts = sorted(float(s) for s in row["sec_by_sf"])
        assert pts[-1] >= 3 * base_max, (name, pts)
        # the tier's whole point is the asymptotic read: its tail
        # exponent must sit under the superlinear flag threshold
        assert row["alpha_tail"] <= 1.3, (name, row["alpha_tail"])
