"""Unit pins for bench.py's measurement protocol (no Spark, no fixtures).

The driver parses bench.py's single stdout line into BENCH_r{N}.json, so
the protocol's two moving parts — the compact-line contract and the
round-7 drift-breach auto-retry — get deterministic pins here. Query
time is driven by a VIRTUAL clock (bench's ``time.perf_counter`` is
monkeypatched and the fake DataFrames advance it exactly), not real
sleeps: this box's speed wanders 2-4x (BENCH protocol exists BECAUSE of
that), so a pin built on real sub-second sleeps would flake on the very
contention it's testing for (round-7 advice). The mid-run contention
step is keyed off the TIMED phase having run (not call indices), so the
pin holds no matter how many settle probes the protocol spends.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


class _VirtualClock:
    """Deterministic stand-in for bench's ``time`` module: fake queries
    advance it by their exact duration, ``perf_counter`` reads it."""

    def __init__(self) -> None:
        self.now = 0.0

    def perf_counter(self) -> float:
        return self.now

    def advance(self, seconds: float) -> None:
        self.now += seconds


class _FakeDF:
    def __init__(self, clock: _VirtualClock, seconds: float):
        self._clock = clock
        self._seconds = seconds

    def count(self) -> int:
        self._clock.advance(self._seconds)
        return 1


class _FakeQuery:
    """Registry stand-in whose runtime is a callable of global state."""

    def __init__(self, clock: _VirtualClock, duration_fn):
        self._clock = clock
        self._duration_fn = duration_fn

    def fn(self, spark, sf_dir) -> _FakeDF:
        return _FakeDF(self._clock, self._duration_fn())


def _run_bench(monkeypatch, tmp_path, clock, registry, headline, controls):
    monkeypatch.setattr(bench, "time", clock)  # virtual perf_counter
    monkeypatch.setattr(bench, "REGISTRY", registry)
    monkeypatch.setattr(bench, "HEADLINE", headline)
    monkeypatch.setattr(bench, "CONTROLS", controls)
    monkeypatch.setattr(bench, "REPO", tmp_path)  # samples blob → tmp
    monkeypatch.setattr(bench, "get_spark", lambda app_name: None)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", str(tmp_path / "sf0.5"))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "1")
    bench.main()


def test_drift_breach_triggers_exactly_one_retry(monkeypatch, tmp_path, capsys):
    """Contention arriving AFTER the settle phase (controls read 2× slower
    at the drift endpoint than at settle time) must re-run the whole pass
    once; the emitted pass sees the slow-but-steady box (≈0 drift) and
    discloses drift_retries=1 plus the discarded pass's evidence."""
    clock = _VirtualClock()
    h1_calls = {"n": 0}

    def headline_duration():
        h1_calls["n"] += 1
        return 0.01

    def control_duration():
        # slow step fires once the pass-1 TIMED phase has run: warmup is
        # h1 call 1, pass-1 timed is call 2 — so pass-1's settle reads
        # fast, its drift endpoint reads slow (breach), and the retry
        # pass reads slow consistently (settled).
        return 0.16 if h1_calls["n"] >= 2 else 0.08

    registry = {
        "c1": _FakeQuery(clock, control_duration),
        "h1": _FakeQuery(clock, headline_duration),
    }
    _run_bench(monkeypatch, tmp_path, clock, registry, ["c1", "h1"], ["c1"])

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["controls"]["drift_retries"] == 1
    # the emitted pass is the steady one: both endpoints on the slow box
    # read identical virtual durations, so drift is exactly 0
    assert abs(out["controls"]["mean_drift_pct"]) <= 1e-9
    assert out["sf"] == 0.5
    assert set(out["queries"]) == {"c1", "h1"}

    blob = json.loads((tmp_path / "bench_samples.json").read_text())
    assert len(blob["discarded_passes"]) == 1
    discarded = blob["discarded_passes"][0]
    # the discarded pass must carry the breach that triggered the retry
    # (0.08 → 0.16 is exactly +100% on the virtual clock)
    assert discarded["mean_drift_pct"] > 90.0
    assert set(discarded["samples"]) == {"c1", "h1"}


def test_steady_box_emits_single_pass(monkeypatch, tmp_path, capsys):
    """Constant-duration queries: no breach, no retry, settled=True, and
    the compact line carries every field the driver's capture parses."""
    clock = _VirtualClock()
    registry = {
        "c1": _FakeQuery(clock, lambda: 0.08),
        "h1": _FakeQuery(clock, lambda: 0.01),
    }
    _run_bench(monkeypatch, tmp_path, clock, registry, ["c1", "h1"], ["c1"])

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["controls"]["drift_retries"] == 0
    assert out["controls"]["settled"] is True
    # band-legibility: the compact line must carry the control VALUES
    # (first/last probe medians), not just their drift — a uniformly
    # slow box emits settled low-drift passes whose inflation only the
    # absolute control values reveal
    assert set(out["controls"]["first"]) == {"c1"}
    assert set(out["controls"]["last"]) == {"c1"}
    assert out["controls"]["first"]["c1"] > 0
    assert out["metric"] == "headline_queries_total_wall"
    assert out["unit"] == "sec"
    assert out["value"] > 0
    assert out["samples_file"] == "bench_samples.json"
    blob = json.loads((tmp_path / "bench_samples.json").read_text())
    assert blob["discarded_passes"] == []
