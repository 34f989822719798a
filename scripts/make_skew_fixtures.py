"""Build a SKEWED twin of a uniform warehouse for the skew stress harness
(VERDICT r8, task 2: the sf10 volume sweep proved work growth but its
clone fixtures are uniform by construction — real web corpora are
Zipfian, and the paths whose WORST case is skew had never been measured
against a hot key).

    python scripts/make_skew_fixtures.py                   # sf1 pair, ~1 min
    python scripts/make_skew_fixtures.py /tmp/spark_graft_scaled/sf0.3

Writes TWO warehouses under /tmp/spark_graft_skew/:

    <out>/uniform/   — the source tables passed through the writer verbatim
    <out>/skewed/    — same rows, three planted hot keys:

- **documents**: DOC_FRAC (5%) of docs become one boilerplate cluster —
  the SAME ~template text with a single varying token. Near-identical
  text collides in every MinHash band, so LSH gets ONE hot bucket
  holding 5% of the corpus (templated spam / boilerplate — the
  guaranteed case at 100 TB). ``n_chars`` is recomputed so the fixture
  contract length(text) == n_chars still holds.
- **events**: EVENT_FRAC (10%) of events are reassigned to one hot
  ``user_id`` (Zipf head user).
- **orders**: ORDER_FRAC (10%) of orders are reassigned to one hot
  ``o_custkey`` (must be an EXISTING customer so FK integrity holds —
  the window/topk and salted-join paths key on it).

Everything else about a row is untouched, so the skewed warehouse has
IDENTICAL row counts, schemas, and per-table file counts to the uniform
twin — both sides go through the same writer with the same fan-out, and
the only difference a query can see is the key distribution. The
uniform/skewed runtime ratio therefore isolates skew, with no layout or
generator confound.

A ``skew_manifest.json`` in the output root records the hot ids,
fractions, and row counts for the measuring script and the tests.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import os as _os

DOC_FRAC = int(_os.environ.get("SPARK_GRAFT_SKEW_DOC_FRAC", "20"))      # 1-in-20 docs → 5% hot boilerplate cluster
EVENT_FRAC = int(_os.environ.get("SPARK_GRAFT_SKEW_EVENT_FRAC", "10"))  # 1-in-10 events → 10% hot user
ORDER_FRAC = int(_os.environ.get("SPARK_GRAFT_SKEW_ORDER_FRAC", "10"))  # 1-in-10 orders → 10% hot custkey

# ~110 words of fixed boilerplate: long enough that the varying token at
# the end is <1% of the shingle set, so all 16 minhash seeds agree across
# cluster members and every band lands in the same LSH bucket.
BOILERPLATE = (
    "subscribe to our newsletter for the latest updates and offers "
    "this page is provided for informational purposes only and does not "
    "constitute professional advice all trademarks are the property of "
    "their respective owners by continuing to browse this site you agree "
    "to our use of cookies and our privacy policy terms of service apply "
    "contact our support team for assistance with your account or orders "
    "copyright all rights reserved unauthorized reproduction is "
    "prohibited see our frequently asked questions for common issues "
    "shipping and returns are handled within thirty days of purchase "
    "sign in to manage your preferences and notification settings"
)


def _n_files(path: str) -> int:
    """Part-file count of a parquet table (file OR directory form)."""
    if os.path.isfile(path):
        return 1
    return max(
        1, sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    )


def skew_documents(df: DataFrame) -> DataFrame:
    hot = F.col("doc_id") % DOC_FRAC == 0
    text = F.when(
        hot, F.concat(F.lit(BOILERPLATE + " unit "), F.col("doc_id").cast("string"))
    ).otherwise(F.col("text"))
    return df.withColumn("text", text).withColumn(
        # cast preserves the source column type (bigint) — length() is int
        "n_chars",
        F.length("text").cast(df.schema["n_chars"].dataType),
    )


def skew_events(df: DataFrame, hot_user: int) -> DataFrame:
    return df.withColumn(
        "user_id",
        F.when(F.col("event_id") % EVENT_FRAC == 0, F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    )


def skew_orders(df: DataFrame, hot_cust: int) -> DataFrame:
    return df.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % ORDER_FRAC == 0, F.lit(hot_cust)).otherwise(
            F.col("o_custkey")
        ),
    )


def build_skew_pair(
    spark: SparkSession,
    src_dir: str,
    out_root: str,
    tables: tuple[str, ...] | None = None,
) -> dict:
    """``tables`` restricts the pair to a subset (e.g. orders+customer
    for a join-tier-only pair at a big SF, where writing the full
    warehouse twice would be 4 GB of untouched fact tables)."""
    from rws_data_ingester_spark.catalog import TABLES, load_table

    if tables is None:
        tables = tuple(TABLES)
    hot_user = (
        load_table(spark, src_dir, "events").agg(F.min("user_id")).first()[0]
        if "events" in tables
        else 0
    )
    hot_cust = (
        load_table(spark, src_dir, "customer").agg(F.min("c_custkey")).first()[0]
        if "customer" in tables
        else 0
    )

    manifest = {
        "source": src_dir,
        "doc_frac": 1.0 / DOC_FRAC,
        "event_frac": 1.0 / EVENT_FRAC,
        "order_frac": 1.0 / ORDER_FRAC,
        "hot_user": int(hot_user),
        "hot_cust": int(hot_cust),
        "rows": {},
    }
    for variant in ("uniform", "skewed"):
        for name in tables:
            df = load_table(spark, src_dir, name)
            if variant == "skewed":
                if name == "documents":
                    df = skew_documents(df)
                elif name == "events":
                    df = skew_events(df, hot_user)
                elif name == "orders":
                    df = skew_orders(df, hot_cust)
            out = os.path.join(out_root, variant, f"{name}.parquet")
            fan = _n_files(os.path.join(src_dir, f"{name}.parquet"))
            # same writer, same fan-out on BOTH sides: the only difference
            # between the twins is the key distribution
            df.repartition(fan).write.mode("overwrite").parquet(out)
            if variant == "uniform":
                manifest["rows"][name] = df.count()
    os.makedirs(out_root, exist_ok=True)
    with open(os.path.join(out_root, "skew_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main() -> None:
    from rws_data_ingester_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scaled/sf1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join("/tmp/spark_graft_skew", os.path.basename(src.rstrip("/")))
    )
    if not os.path.isdir(src):
        raise SystemExit(
            f"source warehouse {src} missing — run scripts/make_scaled_fixtures.py"
        )
    spark = get_spark(app_name="make_skew_fixtures", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    tables_env = os.environ.get("SPARK_GRAFT_SKEW_TABLES", "")
    tables = tuple(t for t in tables_env.split(",") if t) or None
    manifest = build_skew_pair(spark, src, out, tables=tables)
    print(json.dumps({"out": out, **{k: v for k, v in manifest.items() if k != "rows"}}))


if __name__ == "__main__":
    main()
