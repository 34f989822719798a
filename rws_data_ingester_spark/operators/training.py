"""End-to-end training-data curation pipeline — the whole §2.10 [EXT]
surface composed into one funnel, the way a corpus team actually runs
it. Stages: exact dedup → near-dup cluster removal → quality gate →
contamination screen → per-language contribution cap → sequence packing.

Output is the funnel summary (one row per stage with surviving counts)
plus final packing stats — the numbers a pipeline owner monitors.

Scale design: every stage is one of the already-scale-audited operators
(hash-key dedup shuffle, LSH banding + connected components, map-side
quality predicates, broadcast benchmark grams, WindowGroupLimit cap,
range-partitioned greedy packing); composing them adds no new shuffles
beyond each stage's own. The funnel counts come from ONE pass per stage
boundary (cheap count aggregates over id-only frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.operators.cluster import connected_components
from rws_data_ingester_spark.operators.dedup import (
    lsh_star_edges,
    minhash_signature,
)
from rws_data_ingester_spark.operators.packing import pack_sequences
from rws_data_ingester_spark.plans.registry import query


@query("pipeline_training_data", oracle=None)  # minhash/packing inside → rows-only
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-stage curation funnel over `documents`, returning one row per
    stage: (stage_order, stage, n_docs surviving, n_tokens surviving) and
    a final `packed` row where n_docs = sequence count. Deterministic end
    to end (content-hash keepers, min-id cluster roots, md5-ranked caps,
    id-ordered packing) — a re-run reproduces the same corpus."""
    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", "text", "lang", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    # 1. exact dedup: keep min doc_id per content hash (bodies never shuffle)
    keepers = d.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    s1 = d.join(keepers, "doc_id", "left_semi")

    # 2. near-dup removal: MinHash → LSH star edges (linear in bucket
    #    size, vs quadratic clique pairs) → connected components, keep
    #    each cluster root
    sigs = minhash_signature(s1.select("doc_id", "text"), "doc_id", "text")
    edges = lsh_star_edges(sigs, "doc_id")
    comp = connected_components(edges, vertices=s1.select("doc_id"))
    roots = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    s2 = s1.join(roots, "doc_id", "left_semi")

    # 3. quality gate: enough tokens, reasonable mean token length
    s3 = s2.filter(
        (F.col("n_tokens") >= 10)
        & ((F.length("text") / F.col("n_tokens")).between(2.0, 12.0))
    )

    # 4. contamination screen: drop docs sharing any 4-gram with the
    #    benchmark set (docs 0-9), benchmark grams broadcast
    toks = F.split("text", " ")
    grams = s3.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= 4,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 3),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 4)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    bench = grams.filter(F.col("doc_id") < 10).select("gram").distinct()
    dirty = (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    s4 = s3.filter(F.col("doc_id") >= 10).join(dirty, "doc_id", "left_anti")

    # 5. per-language contribution cap (deterministic md5 rank)
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")))
    s5 = (
        s4.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .drop("rn")
    )

    # 6. pack into 256-token sequences
    packed = pack_sequences(s5.select("doc_id", "n_tokens"), budget=256)

    def stage_row(order: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        )

    funnel = (
        stage_row(0, "raw", d)
        .unionAll(stage_row(1, "exact_dedup", s1))
        .unionAll(stage_row(2, "near_dedup", s2))
        .unionAll(stage_row(3, "quality_gate", s3))
        .unionAll(stage_row(4, "decontaminated", s4))
        .unionAll(stage_row(5, "lang_capped", s5))
        .unionAll(
            packed.agg(
                F.lit(6).alias("stage_order"),
                F.lit("packed").alias("stage"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum("total_tokens").cast("long").alias("n_tokens"),
            )
        )
    )
    return funnel.orderBy("stage_order")
