"""File-layout invariance: a query's RESULT must not depend on how the
input warehouse is physically laid out on disk. Tests and the driver read
ONE parquet file per table; a production 100 TB warehouse is tens of
thousands of files per table, sliced into scan partitions by size — so a
result that depends on file count, file order, or row order within files
(first-row arbitration without a tiebreak key, per-scan-partition seeding,
kernels that misbehave on empty or tiny scan splits) passes every suite
here and drifts the day the data is re-laid-out or compacted upstream.

Every registered BATCH query runs twice at sf0.001 — against the pristine
single-file warehouse and against a fragmented twin (each table rewritten
as 7 shuffled parquet files via round-robin repartition, destroying both
the file count and the within-file row order) — and the two
value-multisets must be identical. Floats are canonicalized at 6
significant digits (the plan-shape-suite rule): aggregation merge order
legitimately moves double sums by ulps across layouts.

Streaming queries are exercised by their own replay suites and excluded
here (micro-batch file grouping, not scan partitioning, shapes their
execution).

Known, documented layout dependences (excluded with rationale) live in
EXCLUDED below; an empty set is the assertion that there are none.
"""

from __future__ import annotations

import pytest

from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import SF_DIR, TABLES, rows_to_multiset

# Queries whose CONTRACT is about the physical layout itself (they report
# file-level facts of their own sink output, not warehouse-derived values)
# would be listed here with a rationale. Additions require a comment
# explaining why the dependence is inherent, not a bug.
EXCLUDED: dict[str, str] = {}

BATCH_NAMES = sorted(
    n for n in REGISTRY if not n.startswith("stream_") and n not in EXCLUDED
)

N_FRAGMENTS = 7


@pytest.fixture(scope="module")
def frag_dir(spark, tmp_path_factory) -> str:
    """The same sf0.001 warehouse, each table rewritten as N_FRAGMENTS
    shuffled parquet files (directory named <table>.parquet so the
    catalog's path convention is unchanged)."""
    root = tmp_path_factory.mktemp("frag_warehouse")
    for t in TABLES:
        (
            spark.read.parquet(f"{SF_DIR}/{t}.parquet")
            .repartition(N_FRAGMENTS)
            .write.mode("overwrite")
            .parquet(str(root / f"{t}.parquet"))
        )
    return str(root)


def _canon(df) -> dict:
    rows = [tuple(r) for r in df.collect()]
    return rows_to_multiset(df.columns, rows, sig=6)


@pytest.mark.parametrize("name", BATCH_NAMES)
def test_result_invariant_under_file_layout(spark, frag_dir, name):
    base = _canon(REGISTRY[name].fn(spark, SF_DIR))
    got = _canon(REGISTRY[name].fn(spark, frag_dir))
    if got != base:
        only_b = {k: c for k, c in base.items() if got.get(k) != c}
        only_g = {k: c for k, c in got.items() if base.get(k) != c}
        raise AssertionError(
            f"{name}: result depends on warehouse file layout; "
            f"single-file-only sample {list(only_b.items())[:3]}; "
            f"fragmented-only sample {list(only_g.items())[:3]}"
        )
