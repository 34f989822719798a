"""A/B: old (per-branch union) vs new (flag-cascade) pipeline_training_data.

Loads the previous committed version of training.py with the registry
decorator stubbed out, runs both at the given sf_dir, asserts identical
output rows, and prints wall times. Scratch tool — not part of the suite.
"""

import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from rws_data_ingester_spark.plans import REGISTRY  # noqa: E402
from rws_data_ingester_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
rev = sys.argv[2] if len(sys.argv) > 2 else "HEAD"

src = subprocess.run(
    ["git", "show", f"{rev}:rws_data_ingester_spark/operators/training.py"],
    cwd=REPO, capture_output=True, text=True, check=True,
).stdout
# stub the registry decorator so the old version doesn't re-register
src = re.sub(r"from .*registry import query.*$", "", src, flags=re.M)
ns: dict = {"query": lambda *a, **k: (lambda f: f)}
exec(compile(src, "<old_training>", "exec"), ns)
old_fn = ns["pipeline_training_data"]
new_fn = REGISTRY["pipeline_training_data"].fn

spark = get_spark()
# warm up
spark.range(1).count()

results = {}
for name, fn in [("old", old_fn), ("new", new_fn), ("old2", old_fn), ("new2", new_fn)]:
    t0 = time.time()
    rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    results[name] = rows
    print(f"{name}: {time.time()-t0:.2f}s  ({len(rows)} rows)", flush=True)

assert results["old"] == results["new"], (
    "MISMATCH:\nold=" + repr(results["old"]) + "\nnew=" + repr(results["new"])
)
print("IDENTICAL OUTPUT")
for r in results["new"]:
    print(r)
