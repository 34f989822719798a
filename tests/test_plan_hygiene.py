"""Plan hygiene across the WHOLE registry: every query's physical plan is
checked for scale red flags. The per-query plan tests in
test_scale_plans.py assert chosen queries have the *right* plan; this
sweep asserts no query has a *disqualifying* one — the difference between
'the flagship is tuned' and 'nothing in the surface falls over at 100 TB'.

Red flags:
- CartesianProduct: a non-broadcast cartesian joins every partition pair —
  O(n²) shuffle traffic. Broadcast NLJ (small side) is acceptable and is
  what the similarity/range queries compile to.
- BatchEvalPython: row-at-a-time Python UDF. Allowed only where declared
  (the deliberate F.udf demo on the 25-row nation table); everything else
  must be Arrow-batched (ArrowEvalPython / mapInPandas stages) or JVM.
- Window over Exchange SinglePartition: an unpartitioned window funnels
  the whole input through ONE task — the classic global-row_number scale
  killer. Allowed only where the window's input is a bounded aggregate
  (cardinality fixed by construction, not by data volume); each allowance
  documents that bound.
- Duplicate window expressions: WindowExec (unlike HashAggregate) does
  NOT deduplicate identical (function, spec) pairs — building the same
  window expression into several output columns (or referencing it
  multiple times inside one, e.g. an unbound pround operand) computes and
  buffers it once PER copy. Any exact duplicate inside a Window node is
  an unintended plan.
"""

from __future__ import annotations

import re

import pytest

from rws_data_ingester_spark.plans import REGISTRY

from tests.conftest import SF_DIR

# Queries allowed to carry a row-at-a-time Python UDF (deliberate demos
# on tiny tables, documented in their docstrings).
ROW_UDF_ALLOWED = {"udf_scalar_vowels", "udf_sql_registered"}

# Queries allowed a CartesianProduct node (none today; broadcast NLJ does
# not produce this node, so any appearance is an unintended plan).
CARTESIAN_ALLOWED: set[str] = set()

# Queries allowed a Window whose child is Exchange SinglePartition. Only
# windows over BOUNDED aggregates qualify — the single task sees a row
# count fixed by construction, independent of corpus size:
# - ids_assign_contiguous: prefix-sum window over the per-bucket COUNTS
#   (one row per bucket, #buckets ≈ shuffle parallelism — the whole point
#   of the design is that the fact-level rank is per-bucket, never global)
# - trend_wow_revenue: lag over the WEEKLY revenue aggregate (one row per
#   calendar week in the data's time span, never the order facts)
SINGLE_PARTITION_WINDOW_ALLOWED = {"ids_assign_contiguous", "trend_wow_revenue"}

ALL_QUERIES = sorted(REGISTRY)


_WIN_ALIAS_SPLIT = re.compile(r" AS [A-Za-z_][\w.]*#\d+L?(?:, )?")


def _duplicate_window_exprs(plan: str) -> list[str]:
    """Exact-duplicate window expressions within any single Window node:
    the bracket's entries are `<expr> AS <name>#id` — split on the alias
    anchors and compare the expr strings verbatim (attribute ids make
    identical computations print identically within one plan)."""
    dups: list[str] = []
    for ln in plan.splitlines():
        marker = "Window ["
        if marker not in ln:
            continue
        body = ln.split(marker, 1)[1].rsplit("]", 1)[0]
        exprs = [e for e in _WIN_ALIAS_SPLIT.split(body) if "windowspecdefinition" in e]
        seen: set[str] = set()
        for e in exprs:
            if e in seen:
                dups.append(e[:120])
            seen.add(e)
    return dups


def _has_single_partition_window(plan: str) -> bool:
    """True if any Window node sits (within its subtree header) directly
    above an Exchange SinglePartition — i.e. an unpartitioned window."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window [" in ln and "SinglePartition" in "\n".join(lines[i : i + 4]):
            return True
    return False


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_plan_has_no_scale_red_flags(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name}: non-broadcast cartesian"
    if name not in ROW_UDF_ALLOWED:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in plan — use pandas_udf/mapInPandas"
        )
    if name not in SINGLE_PARTITION_WINDOW_ALLOWED:
        assert not _has_single_partition_window(plan), (
            f"{name}: unpartitioned Window (Exchange SinglePartition child) — "
            "partition the window or aggregate first"
        )
    dups = _duplicate_window_exprs(plan)
    assert not dups, (
        f"{name}: duplicate window expression(s) in one Window node — "
        f"WindowExec computes each copy separately; bind the window output "
        f"to a column before reusing it: {dups[:2]}"
    )
