"""Connector round-trip queries (SURVEY.md §2.1 [EXT]: JSON-lines / CSV
scan & sink). Each query writes a fixture table through the sink under
test into a scratch dir, reads it back with the original schema, and
returns a projection — the oracle reads the same rows straight from
parquet, so any fidelity loss in the connector (quoting, type coercion,
null encoding) fails the hash check.

Scale note: both sinks write partitioned directories (one file per task),
and both scans are splittable on read — the 100 TB path is unchanged from
parquet, only the codec differs. Parquet remains the recommendation; these
exist because a complete engine must interoperate.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.plans.registry import query
from rws_data_ingester_spark.sources.readers import read_csv, read_jsonl
from rws_data_ingester_spark.sources.sinks import write_csv, write_jsonl


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV sink → CSV scan (explicit schema — no inference pass)
    → identical rows."""
    n = Catalog(spark, sf_dir).nation
    out = tempfile.mkdtemp(prefix="rws_csv_")
    write_csv(n, out)
    return read_csv(spark, out, schema=n.schema).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → JSON-lines sink → scan with explicit schema → identical
    rows. Doubles round-trip exactly through Spark's JSON writer."""
    from pyspark.sql import functions as F

    s = Catalog(spark, sf_dir).supplier
    out = tempfile.mkdtemp(prefix="rws_jsonl_")
    write_jsonl(s, out)
    return read_jsonl(spark, out, schema=s.schema).select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("acctbal")
    )


@query(
    "sink_partitioned_pruning",
    oracle="""
    SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 2) AS total_price
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by o_orderpriority → filtered scan.
    The read-back filter hits only the 1-URGENT directory (PartitionFilters
    in the plan — asserted in tests/test_scale_plans.py); at 100 TB this is
    the difference between scanning one partition and scanning the table."""
    from pyspark.sql import functions as F

    from rws_data_ingester_spark.sources.sinks import write_partitioned_parquet

    o = Catalog(spark, sf_dir).orders
    out = tempfile.mkdtemp(prefix="rws_part_")
    write_partitioned_parquet(o, out, ["o_orderpriority"])
    return (
        spark.read.parquet(out)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("total_price"))
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region → ORC sink → ORC scan. ORC is the second splittable columnar
    format Spark ships natively (predicate pushdown and column pruning
    both work); the oracle reads the same rows from parquet."""
    r = Catalog(spark, sf_dir).region
    out = tempfile.mkdtemp(prefix="rws_orc_")
    r.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select("r_regionkey", "r_name")
