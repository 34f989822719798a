"""Plan-shape invariance: a query's RESULT must not depend on physical-plan
knobs that vary between environments — `spark.sql.shuffle.partitions` and
AQE. The test session runs 4 shuffle partitions; the driver's vanilla
session runs Spark's default 200 with AQE on; a production cluster would
run thousands. A result that silently depends on partition count (merge
order, first-row arbitration, accumulator traversal) would pass every
same-config differential suite AND the driver's oracle check, then drift
the day the config changes.

Every registered BATCH query runs four times at sf0.001 — session default,
shuffle.partitions=1 (the no-parallelism degenerate),
shuffle.partitions=13 with AQE off (a prime that divides nothing, no
runtime coalescing), and autoBroadcastJoinThreshold=-1 (every un-hinted
join demoted to sort-merge/shuffled-hash) — and the value-multisets must
be identical.
Floats are canonicalized at 6 significant digits (the random-fuzz rule):
partial-aggregation order legitimately changes double summation by ulps
across partition counts; anything beyond ulp noise is a real dependence.

Streaming queries are exercised by their own replay suites and excluded
here (micro-batch planning, not shuffle partitioning, shapes their
execution; each replay costs seconds and would triple the suite's wall).

Known, documented plan-shape dependences (excluded with rationale):
- none yet — additions require a comment explaining why the dependence is
  inherent to the operator's contract, not a bug.
"""

from __future__ import annotations

import pytest

from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import SF_DIR, rows_to_multiset

# Inherently plan-shape-dependent queries would be listed here with a
# rationale; an empty set is the assertion that there are none.
EXCLUDED: dict[str, str] = {}

BATCH_NAMES = sorted(
    n for n in REGISTRY if not n.startswith("stream_") and n not in EXCLUDED
)

VARIANTS = [
    ("shuffle1", {"spark.sql.shuffle.partitions": "1"}),
    (
        "shuffle13_noaqe",
        {
            "spark.sql.shuffle.partitions": "13",
            "spark.sql.adaptive.enabled": "false",
        },
    ),
    # Broadcast disabled: every un-hinted join falls back to sort-merge /
    # shuffled-hash. Production clusters tune autoBroadcastJoinThreshold
    # (and AQE re-arbitrates it at runtime); a result that depends on the
    # join STRATEGY — not the join semantics — is a correctness bug that
    # same-threshold suites can never see. Explicit F.broadcast() hints
    # are unaffected (hints outrank the threshold), which is itself part
    # of the contract being pinned: hinted plans keep their shape, values
    # stay identical either way.
    ("nobroadcast", {"spark.sql.autoBroadcastJoinThreshold": "-1"}),
]


def _canon(df) -> dict:
    rows = [tuple(r) for r in df.collect()]
    return rows_to_multiset(df.columns, rows, sig=6)


@pytest.mark.parametrize("name", BATCH_NAMES)
def test_result_invariant_under_plan_shape(spark, name):
    base = _canon(REGISTRY[name].fn(spark, SF_DIR))
    for label, conf in VARIANTS:
        saved = {k: spark.conf.get(k) for k in conf}
        try:
            for k, v in conf.items():
                spark.conf.set(k, v)
            got = _canon(REGISTRY[name].fn(spark, SF_DIR))
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
        if got != base:
            only_b = {k: c for k, c in base.items() if got.get(k) != c}
            only_g = {k: c for k, c in got.items() if base.get(k) != c}
            raise AssertionError(
                f"{name}@{label}: result depends on plan shape; "
                f"base-only sample {list(only_b.items())[:3]}; "
                f"variant-only sample {list(only_g.items())[:3]}"
            )
