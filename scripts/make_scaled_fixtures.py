"""Build PERF-ONLY scaled clones of a fixture warehouse (sf0.1 → ~sf0.3,
~sf1.0) for multi-scale-factor scaling curves (VERDICT r6, task 2).

The 100×-scale argument was previously plan-shape-only (SCALE.md); these
clones give it measured scaling exponents. Usage:

    python scripts/make_scaled_fixtures.py [SRC_SF_DIR] [OUT_ROOT]

writes ``{OUT_ROOT}/sf{K*src_sf}/{table}.parquet`` for K in (1, 3, 10)
(override with SPARK_GRAFT_SCALE_KS="1,3,10"). Defaults: src
/root/testdata/sf0.1, out /tmp/spark_graft_scaled. /root/testdata is
read-only and never touched.

K=1 is deliberately part of the set: the 1x scale point must go through
the SAME writer (same compression, same timestamp normalization, same
files-per-row density) as the scaled points, or the curve's smallest
point measures generation artifacts — the driver's sf0.1 fixtures are
single-file parquet, so a scan there runs on ONE task while a clone
warehouse scans 8+ tasks, and wall-clock comparisons invert (observed:
q1 at 10x the data ran 1.8x FASTER than the single-file 1x point).
Every table gets >=SPARK_GRAFT_SCALE_MIN_FILES files (default 8) so a
fixed-core measurement session (scaling_curves.py uses local[8]) is
saturated at every scale point and wall time tracks total work.

Scaling model — K id-offset clones of the source warehouse, foreign keys
kept consistent so every join hits exactly as it does at 1×:

- ``region``/``nation`` stay single-copy (fixed dims, as in TPC-H: dims
  that a 100 TB fact still broadcasts do not grow with SF).
- Every entity id column (``*_custkey  *_orderkey  *_partkey  *_suppkey
  event_id  user_id  doc_id  vec_id``) gets ``+ clone*OFFSET`` with one
  global OFFSET (1e9 > any source key), so id-equality joins across any
  table pair still match within a clone and never across clones.
- ``documents.text`` is letter-permuted per clone (``translate`` with a
  seeded per-clone derangement of a-z/A-Z — pure codegen; round 7 used
  rot-i, which has period 26 and collides at k>26). This preserves every
  per-row cost driver (lengths, token counts, whitespace/punctuation
  structure, n_chars) and the WITHIN-clone near-dup structure exactly
  (two permuted near-dups share exactly the shingles their originals
  shared), while making cross-clone shingle sets disjoint at ANY k.
  Without it, K identical text clones turn every MinHash band bucket
  into a ≥K-member bucket and the candidate-edge count explodes
  combinatorially — a data-duplication artifact that would drown the
  engine's own scaling in the curve. With it, the LSH candidate set
  scales exactly K×.
- ``embeddings.embedding`` gets a per-clone SIGNED circular shift (a
  signed coordinate permutation = orthogonal transform; round 7 used the
  plain shift, period 64, colliding at k>64): all WITHIN-clone inner
  products / cosines are preserved exactly, so per-clone ANN and
  semantic-dedup workload shape is exactly the 1× workload, K times —
  while cross-clone vectors decorrelate instead of forming K-deep ties
  (identical clones would land in one quantizer cell and make cell-local
  pairwise work quadratic in K, again a duplication artifact).
- ``events.ts`` / ``orders.o_orderdate`` are kept as-is: K× events in
  the same time range models more users over the same period, so date
  predicates keep their selectivity and per-user sessionization work is
  unchanged per clone.

Outputs are written as multi-file parquet directories (``repartition``
scaled with K) so scan parallelism grows with data like a real warehouse,
and are NEVER used for correctness — oracle runs stay on the driver's
read-only fixtures.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from rws_data_ingester_spark.catalog import TABLES, load_table  # noqa: E402
from rws_data_ingester_spark.session import get_spark  # noqa: E402

# One global id offset per clone: larger than any source key (sf0.1 max
# key ≈ 6e5), 10 clones stay < 1e10, comfortably int64.
OFFSET = 1_000_000_000

# Tables cloned with id offsets; dims stay single-copy.
FIXED_DIMS = ("region", "nation")
ID_COLUMNS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()


def _clone_permutation(i: int) -> str:
    """Deterministic letter DERANGEMENT for clone i (>=1): a seeded
    shuffle of a-z, re-drawn (seed stepped) until no letter maps to
    itself. Rotation (rot-i, the round-7 transform) has period 26, so at
    k>26 clone i and clone i-26 carried IDENTICAL text — every such doc
    pair lands in the same MinHash band buckets and the cross-clone
    duplicate pairs grow ~quadratically in k/26, a data-duplication
    artifact that would drown the engine's own scaling at k=100. Two
    distinct random permutations agree on a whole shingle only if every
    letter in it maps identically under both — never in practice — so
    cross-clone shingle sets stay disjoint at any k, while any letter
    bijection preserves WITHIN-clone equality structure exactly (same
    guarantee rotation gave). The derangement requirement keeps the
    existing decorrelation pin exact: clone text differs from base
    whenever the base contains any letter."""
    import random

    rng_seed = i
    while True:
        perm = list(range(26))
        random.Random(rng_seed).shuffle(perm)
        if all(p != j for j, p in enumerate(perm)):
            lo = "".join(_LOWER[p] for p in perm)
            return lo + lo.upper()
        rng_seed += 1_000_003


def _rot_text(col: F.Column, i: int) -> F.Column:
    """Per-clone letter permutation — one codegen ``translate``, no UDF.
    Clone 0 is the identity; clones >=1 get a seeded derangement (see
    ``_clone_permutation`` for why rotation stops working past k=26)."""
    if i == 0:
        return col
    return F.translate(col, _LOWER + _UPPER, _clone_permutation(i))


def _shift_embedding(col: F.Column, i: int, dim: int) -> F.Column:
    """Per-clone signed circular coordinate shift — a signed permutation
    matrix, i.e. orthogonal, so every within-clone inner product is
    preserved exactly (products ±x_j·±y_j == x_j·y_j term-for-term; only
    summation order moves). The plain shift (round-7 transform) has
    period dim/gcd(7,dim) = 64, so at k>64 clone i and clone i-64 carried
    bit-identical vectors — K-deep exact ties that make cell-local
    pairwise work quadratic in k, a duplication artifact. Composing a
    seeded per-clone sign pattern makes a cross-clone collision require
    identical shift AND identical 64-bit sign vector (~2^-64). Clone 0
    is the identity."""
    import random

    if i == 0:
        return col
    s = (i * 7) % dim
    shifted = (
        F.concat(F.slice(col, s + 1, dim - s), F.slice(col, 1, s))
        if s
        else col
    )
    signs = [random.Random((i << 20) + j).choice((1.0, -1.0)) for j in range(dim)]
    if all(x > 0 for x in signs):  # pragma: no cover - 2^-64
        signs[0] = -1.0
    return F.zip_with(
        shifted,
        F.array(*[F.lit(x) for x in signs]),
        lambda v, sg: v * sg,
    )


def _match_element_type(col: F.Column, source_type) -> F.Column:
    """Cast a derived array column back to the source's exact array type.
    The ±1.0 sign literals in ``_shift_embedding`` are Python floats →
    DoubleType, so zip_with's product widens array<float> to
    array<double> for every clone i>=1 while clone 0 keeps the source
    type — unionByName then coerces the whole column to double for k>=2,
    a 2x per-row byte skew vs the k=1 warehouse that violates the
    same-generator premise of the scaling instrument (round-8 ADVICE,
    medium)."""
    return col.cast(source_type)


def clone_table(df: DataFrame, name: str, k: int, emb_dim: int | None) -> DataFrame:
    """Union of k id-offset clones of one source table."""
    parts = []
    for i in range(k):
        cur = df
        for c in ID_COLUMNS.get(name, ()):
            cur = cur.withColumn(c, F.col(c) + F.lit(i * OFFSET))
        if name == "documents":
            cur = cur.withColumn("text", _rot_text(F.col("text"), i))
        if name == "embeddings" and emb_dim:
            cur = cur.withColumn(
                "embedding",
                _match_element_type(
                    _shift_embedding(F.col("embedding"), i, emb_dim),
                    df.schema["embedding"].dataType,
                ),
            )
        parts.append(cur)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_scaled_dir(spark, src_dir: str, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    emb_dim = len(
        load_table(spark, src_dir, "embeddings").select("embedding").first()[0]
    )
    for name in TABLES:
        dest = os.path.join(out_dir, f"{name}.parquet")
        src = load_table(spark, src_dir, name)
        if name in FIXED_DIMS:
            src.coalesce(1).write.mode("overwrite").parquet(dest)
            continue
        scaled = clone_table(src, name, k, emb_dim)
        # constant files-per-row density across scale points (file count
        # grows with k), floored at MIN_FILES so a local[8] measurement
        # session is fully parallel even at the 1x point
        min_files = int(os.environ.get("SPARK_GRAFT_SCALE_MIN_FILES", "8"))
        n_files = max(min_files, 8 * k) if name in ("lineitem", "orders", "events") else max(min_files, k)
        scaled.repartition(n_files).write.mode("overwrite").parquet(dest)
        print(f"  {name}: x{k} -> {dest}", flush=True)


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scaled"
    ks = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_KS", "1,3,10").split(",")]
    import re

    m = re.search(r"sf([0-9.]+)", src_dir)
    src_sf = float(m.group(1)) if m else 1.0
    spark = get_spark(app_name="make_scaled_fixtures")
    for k in ks:
        sf = src_sf * k
        out_dir = os.path.join(out_root, f"sf{sf:g}")
        print(f"building {out_dir} (k={k}) from {src_dir}", flush=True)
        build_scaled_dir(spark, src_dir, out_dir, k)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
