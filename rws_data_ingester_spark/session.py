"""SparkSession factory.

Single place that owns Spark configuration so every entry point (driver
contract, tests, bench) runs with the same scale-oriented settings:

- AQE on (runtime join-strategy switching, skew-join splitting, shuffle
  coalescing) — the knob that makes one logical plan survive 100× data.
- shuffle partitions sized to cores for local mode; on a real cluster this
  would be overridden to ~2-3× total cores via ``extra_conf``.
- Arrow enabled so pandas UDF / createDataFrame paths are vectorized.
- session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are naive-UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "rws_data_ingester_spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[N]`` with N from ``$SPARK_GRAFT_CPUS``
    (falling back to ``local[*]``). On a real cluster, pass ``master=None``
    with spark-submit owning the master and override partitioning via
    ``extra_conf``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle_parts = cpus if cpus else str(os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI semantics are part of the engine contract (all oracle
        # parity was proven under ANSI on — Spark 4's default); pin it so
        # a cluster-level ansi=false override can't flip CAST/arithmetic
        # errors into silent NULL drift.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local_frame() falls back to the verifying tuple path on ANY
        # Arrow/pandas failure; with the default convertToArrowArraySafely
        # =false a mistyped driver-side literal (int64 overflow into an
        # int column, float truncation) would be silently coerced instead
        # of raising into that fallback (r10 ADVICE). Safe conversion
        # costs nothing at our LocalRelation sizes.
        .config("spark.sql.execution.pandas.convertToArrowArraySafely", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type,
        # so read as long and convert in the catalog (ns → µs truncation,
        # which is exactly what DuckDB does reading the same file).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_partitions(spark: SparkSession) -> int:
    """The session's shuffle-partition count as an int — the scale knob
    operators use when they pin an EXPLICIT partition count into a
    repartition() (an explicit count is exempt from AQE coalescing,
    which is the point: a deliberately tiny local shuffle that exists to
    spread heavy downstream compute would otherwise be coalesced back
    onto one core). local[N] sessions set it to the core count
    ($SPARK_GRAFT_CPUS); production overrides it via extra_conf."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" or unset on exotic builds
        return spark.sparkContext.defaultParallelism


def local_frame(spark: SparkSession, rows, schema):
    """Small driver-side row list → DataFrame planned as a LocalRelation.

    ``createDataFrame(list_of_tuples)`` plans as a Python-RDD-backed
    ``LogicalRDD``: every CONSUMPTION of the result (each broadcast
    build, each action) spawns a Python-worker scan job — ~0.3 s of
    scheduler+fork overhead per use on the r10 box, paid even for a
    4-row rate table. Routing the rows through pandas takes the Arrow
    path, which plans as a true ``LocalRelation``: consumers read
    plan-embedded rows, no job, no Python workers (measured 0.52 s →
    0.13 s per consuming join; see OPTIMIZATION_r10.md §5). Falls back
    to the tuple path for row shapes pandas/Arrow rejects — identical
    rows either way, only the plan node differs.

    Only for driver-materialized lists KNOWN to be small (rate tables,
    centroids, gate-bounded CC labels): the rows embed in the plan."""
    rows = list(rows)
    try:
        import pandas as pd

        if hasattr(schema, "fieldNames"):  # StructType
            names = list(schema.fieldNames())
        elif isinstance(schema, (list, tuple)):  # bare column names
            names = list(schema)
        else:  # DDL string: let Spark parse, then name the frame
            names = spark.createDataFrame([], schema).schema.fieldNames()
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=names), schema
        )
    except Exception:  # pragma: no cover - exotic value types / no pandas
        return spark.createDataFrame(rows, schema)
