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
"""

from __future__ import annotations

import pytest

from rws_data_ingester_spark.plans import REGISTRY

from tests.conftest import SF_DIR

# Queries allowed to carry a row-at-a-time Python UDF (deliberate demos
# on tiny tables, documented in their docstrings).
ROW_UDF_ALLOWED = {"udf_scalar_vowels", "udf_sql_registered"}

# Queries allowed a CartesianProduct node (none today; broadcast NLJ does
# not produce this node, so any appearance is an unintended plan).
CARTESIAN_ALLOWED: set[str] = set()

ALL_QUERIES = sorted(REGISTRY)


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
