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
    from bench import HEADLINE

    data = json.loads(_latest_scaling_artifact().read_text())
    assert len(data["sfs"]) >= 3, data["sfs"]
    assert data["sfs"] == sorted(data["sfs"])
    # the measured span must be wide enough for the tail exponent to
    # mean anything: >=10x between smallest and largest point
    assert data["sfs"][-1] / data["sfs"][0] >= 10
    missing = [n for n in HEADLINE if n not in data["queries"]]
    assert not missing, f"headline queries with no scaling curve: {missing}"
    for name, row in data["queries"].items():
        assert len(row["sec_by_sf"]) == len(data["sfs"]), name
        assert all(t > 0 for t in row["sec_by_sf"].values()), name
    assert data["flagged"] == [], (
        f"superlinear queries flagged in {_latest_scaling_artifact().name}: "
        f"{data['flagged']} — fix the plan (or its declared complexity) "
        f"before re-recording the artifact"
    )
