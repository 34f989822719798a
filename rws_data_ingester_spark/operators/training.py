"""End-to-end training-data curation pipeline — the whole §2.10 [EXT]
surface composed into one funnel, the way a corpus team actually runs
it. Stages: exact dedup → near-dup cluster removal → quality gate →
contamination screen → per-language contribution cap → sequence packing.

Output is the funnel summary (one row per stage with surviving counts)
plus final packing stats — the numbers a pipeline owner monitors.

Scale design:
- Every stage is one of the already-scale-audited operators (hash-key
  dedup shuffle, LSH banding + connected components, map-side quality
  predicates, broadcast benchmark grams, WindowGroupLimit cap,
  range-partitioned greedy packing).
- Stage survival is computed ONCE as a cascade of boolean flags on a
  narrow per-doc frame (id, tokens, lang, flags — never the body): each
  stage contributes an id-set joined back on ``doc_id``, so consecutive
  joins reuse one exchange. A naive funnel that unions one aggregate per
  stage re-evaluates every upstream stage per branch — the 4-gram
  contamination explode would run 3x and the dedup semi-joins 6x.
- The flag frame is ``localCheckpoint``-ed (lazy) before fan-out to its
  two consumers (the funnel aggregate and the packing stage); on a real
  cluster this is ``checkpoint`` to durable storage. It holds ~4 small
  columns per surviving doc — trivial next to the corpus itself.
- All six funnel rows come from ONE conditional aggregation over the
  flag frame (sum(when(flag, ...))), unpivoted to rows — a single pass
  instead of six.
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

    # Stage id-sets -------------------------------------------------------
    # 1. exact dedup: keep min doc_id per content hash (bodies never shuffle).
    #    Checkpointed (lazily) because it has two consumers on different
    #    timelines: the near-dup chain below executes it at CONSTRUCTION
    #    time (inside the CC edge checkpoint), and the flag-cascade join
    #    executes at action time — without the cut, the content-hash agg
    #    runs twice. Materialized state is one long per surviving doc.
    keepers = d.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id").localCheckpoint(eager=False)
    s1 = d.join(keepers, "doc_id", "left_semi")

    # 2. near-dup removal: MinHash → LSH star edges (linear in bucket
    #    size) → connected components over the EDGE-TOUCHING ids only.
    #    The funnel never needs the full per-vertex labeling — only which
    #    docs to DROP: the non-roots (id != component), a subset of the
    #    edge endpoints, i.e. bounded by the candidate set, not the
    #    corpus. The previous form passed vertices=s1 and derived
    #    roots = comp.filter(id == component); comp then carried
    #    _with_isolated's corpus-wide distinct + anti-join + union, and
    #    `roots` has TWO consumers (the contamination explode and the
    #    flag join), so that lineage executed twice per run (r10
    #    measurement: 36 → 30 Spark jobs, identical funnel output).
    #    roots ≡ s1 ids minus nonroots, so s2 = s1 AND NOT nonroot.
    sigs = minhash_signature(s1.select("doc_id", "text"), "doc_id", "text")
    edges = lsh_star_edges(sigs, "doc_id")
    comp = connected_components(edges)
    nonroots = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    # nonroots ⊆ edge endpoints ⊆ s1 ids by construction, so the
    # near-dup flag implies the exact-dedup flag.

    # 3. quality gate: enough tokens, reasonable mean token length —
    #    pure map-side predicate, evaluated inline on the base scan.
    q_pred = (F.col("n_tokens") >= 10) & (
        (F.length("text") / F.col("n_tokens")).between(2.0, 12.0)
    )

    # 4. contamination screen: drop docs sharing any 4-gram with the
    #    benchmark set (docs 0-9), benchmark grams broadcast. The explode
    #    runs over quality-gate survivors only — and exactly ONCE.
    s3_docs = (
        d.filter(q_pred)
        .join(keepers, "doc_id", "left_semi")
        .join(nonroots, "doc_id", "left_anti")
    )
    # The token array is bound ONCE via the single-element-wrapper trick
    # (transform over array(split(...)) — same as text_contamination): a
    # bare split() referenced inside the per-position lambda is
    # re-evaluated PER GRAM, O(tokens²) per document — one 50k-token
    # document spent ~100 s re-splitting itself (found by the
    # multi-MB-document probe; thread dump showed StringSplit inside
    # ConcatWs.eval).
    # Each 4-gram is carried as ONE xxhash64 long of its 4 tokens, never
    # as an assembled string: the screen only tests gram EQUALITY, and
    # tokens come from split(' ') so they cannot contain the separator —
    # 4-token-tuple equality is exactly string-gram equality, and Spark's
    # multi-arg xxhash64 seed-chains per field (no concatenation
    # ambiguity), so hash equality ⟺ gram equality up to 2⁻⁶⁴ collisions
    # (which could only ADD a dirty doc; row-identity verified on every
    # driver scale — deterministic data + deterministic hash, so the
    # driver rerun reproduces the check exactly). The long form skips
    # the per-gram concat allocation, broadcasts a long set instead of
    # strings (LongHashedRelation probe), and anything that shuffles
    # carries 8-byte keys — measured 0.50 s → 0.40 s on the corpus-wide
    # pass at sf0.1, identical dirty ids.
    grams = s3_docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.array(F.split("text", " ")),
                lambda t: F.when(
                    F.size(t) >= 4,
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - 3),
                        lambda i: F.xxhash64(
                            F.element_at(t, i),
                            F.element_at(t, i + 1),
                            F.element_at(t, i + 2),
                            F.element_at(t, i + 3),
                        ),
                    ),
                ).otherwise(F.array().cast("array<bigint>")),
            )[0]
        ).alias("gram"),
    )
    bench = grams.filter(F.col("doc_id") < 10).select("gram").distinct()
    dirty = (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )

    # Flag cascade --------------------------------------------------------
    # One narrow frame, one row per raw doc; every stage id-set joins on
    # doc_id so the exchange is reused across the join chain. Bodies are
    # dropped before the first join.
    ann = (
        d.select("doc_id", "n_tokens", "lang", q_pred.alias("_q"))
        .join(keepers.withColumn("_k1", F.lit(True)), "doc_id", "left")
        .join(nonroots.withColumn("_nr", F.lit(True)), "doc_id", "left")
        .join(dirty.withColumn("_dirty", F.lit(True)), "doc_id", "left")
        .withColumn("s1", F.coalesce("_k1", F.lit(False)))
        .withColumn("s2", F.col("s1") & F.col("_nr").isNull())
        .withColumn("s3", F.col("s2") & F.col("_q"))
        .withColumn(
            "s4",
            F.col("s3")
            & (F.col("doc_id") >= 10)
            & ~F.coalesce("_dirty", F.lit(False)),
        )
        .select("doc_id", "n_tokens", "lang", "s1", "s2", "s3", "s4")
        .localCheckpoint(eager=False)
    )

    # 5. per-language contribution cap (deterministic md5 rank) over the
    #    stage-4 survivors; capped ids join back onto the flag frame.
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")))
    capped = (
        ann.filter("s4")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("doc_id")
    )
    ann5 = (
        ann.join(capped.withColumn("_k5", F.lit(True)), "doc_id", "left")
        .withColumn("s5", F.col("s4") & F.coalesce("_k5", F.lit(False)))
        .select("doc_id", "n_tokens", "lang", "s1", "s2", "s3", "s4", "s5")
        .localCheckpoint(eager=False)
    )

    # Funnel: ONE conditional aggregation, unpivoted to stage rows -------
    def surv(flag: str | None, tag: str):
        cond_rows = F.count("*") if flag is None else F.sum(F.col(flag).cast("long"))
        cond_tok = (
            F.sum("n_tokens")
            if flag is None
            else F.sum(F.when(F.col(flag), F.col("n_tokens")))
        )
        return [
            cond_rows.cast("long").alias(f"r_{tag}"),
            F.coalesce(cond_tok, F.lit(0)).cast("long").alias(f"t_{tag}"),
        ]

    wide = ann5.agg(
        *surv(None, "raw"),
        *surv("s1", "exact_dedup"),
        *surv("s2", "near_dedup"),
        *surv("s3", "quality_gate"),
        *surv("s4", "decontaminated"),
        *surv("s5", "lang_capped"),
    )
    stages = ["raw", "exact_dedup", "near_dedup", "quality_gate",
              "decontaminated", "lang_capped"]
    funnel = wide.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("stage_order"),
                    F.lit(name).alias("stage"),
                    F.col(f"r_{name}").alias("n_rows"),
                    F.col(f"t_{name}").alias("n_tokens"),
                )
                for i, name in enumerate(stages)
            ])
        ).alias("row")
    ).select("row.*")

    # 6. pack into 256-token sequences (second consumer of the flag frame)
    packed = pack_sequences(ann5.filter("s5").select("doc_id", "n_tokens"), budget=256)

    return funnel.unionAll(
        packed.agg(
            F.lit(6).alias("stage_order"),
            F.lit("packed").alias("stage"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum("total_tokens").cast("long").alias("n_tokens"),
        )
    ).orderBy("stage_order")
