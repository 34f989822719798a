"""BPE tokenizer training over the corpus (SURVEY.md §2.10 [EXT] —
tokenizer prep is the step between corpus curation and training; the
reference has no analog).

Scale design — the standard vocabulary trick (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016): BPE
never iterates over the corpus. ONE corpus-scale pass builds the
distinct-word frequency table (explode + groupBy, all JVM, map-side
combine); every merge round after that operates on the vocab table,
whose size is corpus-size-INDEPENDENT (~10^5-10^6 rows at any corpus
scale). Per round:

1. adjacent-pair counts: zip each word's symbol array with its own tail,
   explode, sum word frequencies per pair (vocab-sized shuffle);
2. argmax pair — a 1-row driver collect (bounded by construction, ties
   broken lexicographically so training is deterministic);
3. apply the merge to every word's symbol array with a row-local
   ``aggregate`` accumulator (greedy left-to-right, same semantics as
   the reference BPE algorithm) — no shuffle, stays in codegen;
4. ``localCheckpoint`` the small vocab frame so lineage doesn't stack
   one join-free round on another (same pattern as dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.plans.registry import query

N_MERGES = 10


def word_freq_table(docs: DataFrame) -> DataFrame:
    """The single corpus-scale pass: lowercase, split on non-alphanumeric,
    count distinct words. Everything downstream is vocab-sized."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_pair(symbols: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a+b inside one
    symbol array — a row-local aggregate accumulator, no Python."""
    return F.aggregate(
        symbols,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the ranked merge table
    (merge_rank, left, right, merged, pair_freq) — the artifact a
    tokenizer ships. Deterministic: ties on pair frequency break
    lexicographically."""
    spark = docs.sparkSession
    vocab = word_freq_table(docs).withColumn(
        "symbols", F.split(F.col("word"), "(?!^)")
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("symbols"), F.lit(1), F.size("symbols") - 1).alias("left"),
                        F.slice(F.col("symbols"), F.lit(2), F.size("symbols") - 1).alias("right"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("pair_freq"))
        )
        top = pairs.orderBy(F.col("pair_freq").desc(), "left", "right").head(1)
        if not top:
            break
        a, b, freq = top[0]["left"], top[0]["right"], top[0]["pair_freq"]
        merges.append((rank, a, b, a + b, int(freq)))
        vocab = vocab.withColumn("symbols", _merge_pair(F.col("symbols"), a, b))
        vocab = vocab.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, merged string, pair_freq long"
    )


@query("bpe_vocab_train", oracle=None)  # iterative trained artifact → rows-only
def bpe_vocab_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 10 BPE merges on the documents corpus. Rows-only under the
    driver; tests pin the merge table against a pure-Python reference BPE
    on a handmade corpus and assert re-run determinism."""
    d = Catalog(spark, sf_dir).documents
    return bpe_train(d, N_MERGES)
