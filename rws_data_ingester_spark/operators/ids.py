"""Scalable global row-id assignment (SURVEY.md §2.10 [EXT] — the
"stable example ids" pass every training-data pipeline runs before
sharding).

The naive form — ``row_number() OVER (ORDER BY key)`` with no partition —
collapses the whole dataset into ONE window partition: a single task
sorts 100 TB. The scale shape used here is the classic two-pass layout:

1. sample the key to pick B-1 range boundaries (driver-side, B doubles —
   index metadata, same contract as LSH hyperplane / PQ codebook
   literals);
2. map-side: assign each row a bucket by binary-search-free monotonic
   comparison against the boundary array (pure Catalyst ``filter`` over
   a 16-element literal — codegen, no shuffle);
3. count rows per bucket (tiny agg), prefix-sum the counts into bucket
   offsets (window over B rows);
4. rank rows *within* their bucket (window partitioned by bucket — B
   independent sorts, each 1/B of the data) and add the bucket offset.

Result ids are identical to the single-partition ``row_number`` for ANY
choice of boundaries (bucketing is monotonic in the key), so boundary
sampling needs no exactness — only balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.plans.registry import query

N_BUCKETS = 16


def assign_contiguous_ids(df: DataFrame, key: str, n_buckets: int = N_BUCKETS) -> DataFrame:
    """Add ``global_id`` = 0-based dense rank of ``key`` (must be unique)
    without a single-partition global window."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # Boundary sample: one tiny agg collected to the driver so the
    # boundary array is a deterministic literal in BOTH downstream
    # branches (a shared percentile_approx subplan could be evaluated
    # twice with different partial-merge orders).
    # empty input → percentile_approx yields NULL → no boundaries: every
    # row (none) lands in bucket 0 and the plan still builds
    bnds = df.agg(F.percentile_approx(key, probs).alias("b")).head()["b"] or []
    if bnds:
        bucket = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bnds]),
                lambda b: b <= F.col(key),
            )
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_bucket", bucket)
    offsets = (
        bucketed.groupBy("_bucket")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_n")
    )
    wb = W.partitionBy("_bucket").orderBy(key)
    return (
        bucketed.withColumn("_rn", F.row_number().over(wb))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("global_id", (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .drop("_bucket", "_rn", "_offset")
    )


@query(
    "ids_assign_contiguous",
    oracle="""
    SELECT doc_id,
           (ROW_NUMBER() OVER (ORDER BY doc_id) - 1)::BIGINT AS global_id
    FROM documents
    """,
)
def ids_assign_contiguous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0-based ids over documents ordered by doc_id — bucketed
    two-pass plan, oracle'd against the single-window ROW_NUMBER form."""
    d = Catalog(spark, sf_dir).documents
    return assign_contiguous_ids(d.select("doc_id"), "doc_id")
