"""Per-stage profile of sink_zorder_pruning at a scale point (VERDICT
r8, task 4: the sf10 row read tail alpha 1.27 / 113 s — the closest row
to the flag line; this breaks the query into its five stages so the
superlinear residue can be attributed before it's called benign).

    python scripts/profile_zorder.py /tmp/spark_graft_scaled/sf3 /tmp/spark_graft_scaled/sf10

Stages:
  1. stats        — bounds+count agg for the linear layout's bucketing
  2. write_linear — fixed-width bucket + sortWithinPartitions + parquet
  3. write_zorder — write_zordered (its own stats pass included)
  4. audit_exceptall — BOTH exceptAll directions between the read-backs
     (the multiset-identity audit as shipped through round 8)
  5. audit_fingerprint — the candidate replacement: per-side
     order-independent (count, sum(xxhash64(row)), bit_xor(xxhash64(row)))
     fingerprint — map-side partial agg, no wide shuffle
  6. final_agg    — the one-row conditional agg over the tagged union

Prints one JSON line per scale dir with per-stage medians (N=3 after one
warm-up) plus the stage shares, and a q1 control value so a reader can
band-check the box.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from rws_data_ingester_spark.session import get_spark  # noqa: E402

N_RUNS = 3


def fingerprint(df):
    """Order-independent multiset fingerprint: one narrow agg, fully
    map-side-combinable. sum+xor of the 64-bit row hash (plus the count)
    make a cancellation collision require engineered hash values."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: exact and overflow-free under the engine's
        # pinned ANSI mode (full-range 64-bit hashes overflow a long sum)
        F.sum(h.cast("decimal(38,0)")).alias("hsum"),
        F.expr(
            "bit_xor(" + "xxhash64(" + ",".join(df.columns) + "))"
        ).alias("hxor"),
    ).first()


def profile_dir(spark, sf_dir: str) -> dict:
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.operators.layout import (
        _adaptive_n_files,
        _bucket,
        write_zordered,
    )
    from pyspark.sql import types as T

    li = Catalog(spark, sf_dir).lineitem.select(
        "l_orderkey",
        "l_partkey",
        F.datediff("l_shipdate", F.lit("1992-01-01")).alias("ship_day"),
    )

    def timed(fn):
        samples = []
        fn()  # warm-up
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn()
            samples.append(round(time.perf_counter() - t0, 3))
        return sorted(samples)[len(samples) // 2], samples

    stages: dict[str, float] = {}
    samples: dict[str, list] = {}

    # 1. stats
    def run_stats():
        li.agg(
            F.min("ship_day").cast("double"),
            F.max("ship_day").cast("double"),
            F.count("*"),
        ).first()

    stages["stats"], samples["stats"] = timed(run_stats)

    lb = li.agg(
        F.min("ship_day").cast("double").alias("lo"),
        F.max("ship_day").cast("double").alias("hi"),
        F.count("*").alias("n_rows"),
    ).first()
    n_files = _adaptive_n_files(lb["n_rows"])
    lo, hi = float(lb["lo"]), float(lb["hi"])
    lin = tempfile.mkdtemp(prefix="rws_prof_lin_")
    zo = tempfile.mkdtemp(prefix="rws_prof_zo_")

    # 2. linear write
    def run_linear():
        (
            li.withColumn(
                "_lbucket",
                _bucket(
                    F.col("ship_day").cast("double"),
                    F.lit(lo),
                    F.lit(hi),
                    bits=n_files.bit_length() - 1,
                ),
            )
            .repartition(n_files, "_lbucket")
            .sortWithinPartitions("ship_day")
            .write.mode("overwrite")
            .partitionBy("_lbucket")
            .parquet(lin)
        )

    stages["write_linear"], samples["write_linear"] = timed(run_linear)

    # 3. zorder write
    def run_zorder():
        write_zordered(li, zo, "ship_day", "l_partkey", n_files=n_files)

    stages["write_zorder"], samples["write_zorder"] = timed(run_zorder)

    lin_schema = T.StructType(
        li.schema.fields + [T.StructField("_lbucket", T.LongType())]
    )
    zo_schema = T.StructType(
        li.schema.fields + [T.StructField("_zbucket", T.LongType())]
    )
    base_cols = [f.name for f in li.schema.fields]
    lin_read = spark.read.schema(lin_schema).parquet(lin).select(*base_cols)
    zo_read = spark.read.schema(zo_schema).parquet(zo).select(*base_cols)

    # 4. exceptAll audit (both directions — as shipped through r8)
    def run_exceptall():
        assert zo_read.exceptAll(lin_read).count() == 0
        assert lin_read.exceptAll(zo_read).count() == 0

    stages["audit_exceptall"], samples["audit_exceptall"] = timed(run_exceptall)

    # 5. fingerprint audit (candidate replacement)
    def run_fingerprint():
        assert fingerprint(zo_read) == fingerprint(lin_read)

    stages["audit_fingerprint"], samples["audit_fingerprint"] = timed(
        run_fingerprint
    )

    # 6. final one-row conditional agg
    is_lin = F.col("_layout") == "linear"
    tagged = lin_read.withColumn("_layout", F.lit("linear")).unionByName(
        zo_read.withColumn("_layout", F.lit("zorder"))
    )

    def run_final():
        tagged.agg(
            F.count(F.when(is_lin, F.lit(1))),
            F.count(F.when(~is_lin, F.lit(1))),
            F.sum(F.when(~is_lin, F.col("l_orderkey"))),
            F.sum(F.when(~is_lin, F.col("l_partkey"))),
            F.sum(F.when(~is_lin, F.col("ship_day"))),
            F.countDistinct(F.when(~is_lin, F.col("l_partkey"))),
        ).first()

    stages["final_agg"], samples["final_agg"] = timed(run_final)

    shutil.rmtree(lin, ignore_errors=True)
    shutil.rmtree(zo, ignore_errors=True)

    total = sum(stages.values())
    return {
        "sf_dir": sf_dir,
        "n_rows": int(lb["n_rows"]),
        "n_files": n_files,
        "stages_sec": stages,
        "stage_share": {k: round(v / total, 3) for k, v in stages.items()},
        "samples": samples,
        "total_sec": round(total, 3),
    }


def main() -> None:
    dirs = sys.argv[1:] or [
        "/tmp/spark_graft_scaled/sf3",
        "/tmp/spark_graft_scaled/sf10",
    ]
    cores = 8
    spark = get_spark(
        app_name="profile_zorder",
        master=f"local[{cores}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cores)},
    )
    from rws_data_ingester_spark.plans import REGISTRY

    base = "/tmp/spark_graft_scaled/sf0.1"

    def control() -> float:
        t0 = time.perf_counter()
        REGISTRY["q1_pricing_summary"].fn(spark, base).count()
        return round(time.perf_counter() - t0, 3)

    control()  # warm-up
    out = []
    for d in dirs:
        sf = d.rstrip("/").rsplit("sf", 1)[-1]
        # per-point AQE initial partition count, as in the scaling sweep
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(cores, round(cores * float(sf) / 0.1))),
        )
        ctrl = sorted(control() for _ in range(3))[1]
        prof = profile_dir(spark, d)
        prof["control_q1_base"] = ctrl
        print(json.dumps(prof), flush=True)
        out.append(prof)
    Path("/tmp/zorder_profile.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
