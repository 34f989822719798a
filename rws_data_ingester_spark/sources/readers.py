"""Batch scan connectors (SURVEY.md §2.1): parquet / CSV / JSON-lines.

Thin, schema-explicit wrappers: at 100 TB schema inference is a full
extra pass over the data, so every reader takes (or derives) an explicit
schema. Parquet is the default columnar path (pushdown + pruning free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """JSON-lines with PERMISSIVE mode: malformed rows land in
    _corrupt_record instead of failing the scan — the columnar analog of
    the reference's defensive decode (:138-141)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    schema = T.StructType(schema.fields + [T.StructField("_corrupt_record", T.StringType())])
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
