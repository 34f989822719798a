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
from rws_data_ingester_spark.session import local_frame
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
    symbol array — row-local, no Python, and LINEAR in the word length:
    join the symbols on spaces, replace ``a b`` (space-delimited via
    zero-width lookarounds, so consecutive merge sites keep their shared
    delimiter) and split back. The previous form — an ``aggregate``
    accumulator appending to an array column — copied the whole
    accumulator per element, O(n²) per word: a single 300 KB
    run-on token (minified JS) hung the merge round for minutes (found
    by the multi-MB-document probe). Java regex leftmost non-overlapping
    replacement is exactly the greedy BPE merge order; symbols only ever
    contain [a-z0-9] (see word_freq_table's split), so the pair needs no
    regex quoting."""
    joined = F.concat(F.lit(" "), F.array_join(symbols, " "), F.lit(" "))
    merged = F.regexp_replace(joined, f"(?<= ){a} {b}(?= )", a + b)
    # split("", " ") yields [""] — preserve the empty-array identity the
    # old aggregate-accumulator form had for zero-symbol words
    return F.when(F.size(symbols) == 0, symbols).otherwise(
        F.split(F.trim(merged), " ")
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
    return local_frame(
        spark, merges,
        "merge_rank long, left string, right string, merged string, pair_freq long",
    )


@query("bpe_vocab_train", oracle=None)  # iterative trained artifact → rows-only
def bpe_vocab_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 10 BPE merges on the documents corpus. Rows-only under the
    driver; tests pin the merge table against a pure-Python reference BPE
    on a handmade corpus and assert re-run determinism."""
    d = Catalog(spark, sf_dir).documents
    return bpe_train(d, N_MERGES)


CHUNK_TOKS, CHUNK_STRIDE = 100, 80


@query(
    "text_chunk_overlap",
    oracle=f"""
    -- Linear form: zipped parallel UNNESTs emit (pos, tok) pairs once,
    -- then each token fans out to the <=2 overlapping chunks that
    -- contain it. The naive "carry the token list through a
    -- generate_series UNNEST and slice per start" form is accidentally
    -- quadratic (DuckDB materializes the full list per start row) and
    -- melts on multi-MB documents.
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), tok AS (
      SELECT doc_id,
             unnest(generate_series(0, len(toks) - 1)) AS pos,
             unnest(toks) AS tok
      FROM t
    ), cand AS (
      SELECT doc_id, pos, tok,
             unnest(generate_series(
               GREATEST(CAST(ceil((pos - {CHUNK_TOKS} + 1) / {CHUNK_STRIDE}.0)
                             AS BIGINT), 0),
               pos // {CHUNK_STRIDE})) AS chunk_id
      FROM tok
    )
    SELECT doc_id,
           chunk_id::BIGINT AS chunk_id,
           (chunk_id * {CHUNK_STRIDE})::BIGINT AS start_tok,
           COUNT(*)::BIGINT AS n_chunk_toks,
           string_agg(tok, ' ' ORDER BY pos) AS chunk_text
    FROM cand
    GROUP BY doc_id, chunk_id
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (window {CHUNK}=100 tokens,
    stride 80 → 20-token overlap) with provenance (doc_id, chunk_id,
    start offset) — the RAG-indexing / long-document training prep pass.
    Entirely row-local: split once, generate starts with ``sequence``,
    slice per start — higher-order functions in codegen, zero Python,
    zero shuffle (the plan is scan→generate→project). Rows explode by
    ~n_tokens/stride, the unavoidable output factor."""
    d = Catalog(spark, sf_dir).documents
    # NULL text -> no chunks on both engines (the oracle's zipped unnest
    # over a NULL list emits nothing; without the filter, greatest()
    # skipping the NULL size would fabricate one empty chunk here)
    toks = d.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.col("toks").isNotNull()
    )
    starts = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("toks") - 1, F.lit(0)),
                F.lit(CHUNK_STRIDE),
            )
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, CHUNK_TOKS)
    return starts.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_chunk_toks"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


SPAN_TOKS = 3


@query("text_span_corruption", oracle=None)  # sentinel renumbering → rows-only
def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption prep: tokens are grouped into spans of 3;
    a span is masked iff the first hex digit of md5(doc_id, '-', span_idx)
    is < '2' (12.5% expected mask rate — deterministic, engine- and
    re-run-stable like every sampling rule here). The corrupted sequence
    replaces each masked span with a numbered sentinel <extra_id_k>; the
    target sequence lists sentinel + original span — exactly the
    encoder/decoder pair a denoising objective trains on.

    All row-local higher-order functions (slice/transform/aggregate/
    filter/flatten) in codegen: no Python, no shuffle. The sentinel
    running count is a prefix sum over the span-flag array — O(spans²)
    per row, bounded by document length, never by corpus size. Tests pin
    reconstruction (corrupted + targets re-assemble the original text)
    and the mask-rate envelope."""
    d = Catalog(spark, sf_dir).documents
    expr = f"""
    named_struct(
      'n_tokens', size(toks),
      'n_masked_spans', aggregate(flags, 0, (a, x) -> a + x),
      'corrupted_text', array_join(flatten(transform(idxs, i ->
         IF(element_at(flags, i + 1) = 1,
            array(concat('<extra_id_',
                  aggregate(slice(flags, 1, i), 0, (a, x) -> a + x), '>')),
            slice(toks, i * {SPAN_TOKS} + 1, {SPAN_TOKS})))), ' '),
      'target_text', array_join(flatten(transform(idxs, i ->
         IF(element_at(flags, i + 1) = 1,
            concat(array(concat('<extra_id_',
                  aggregate(slice(flags, 1, i), 0, (a, x) -> a + x), '>')),
                  slice(toks, i * {SPAN_TOKS} + 1, {SPAN_TOKS})),
            cast(array() as array<string>)))), ' ')
    )
    """
    prepared = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
    ).select(
        "doc_id",
        "toks",
        F.expr(
            f"sequence(0, cast(ceil(size(toks) / {SPAN_TOKS}.0) as int) - 1)"
        ).alias("idxs"),
    ).select(
        "doc_id",
        "toks",
        "idxs",
        F.expr(
            "transform(idxs, i -> IF(substring(md5(concat(cast(doc_id as string),"
            " '-', cast(i as string))), 1, 1) < '2', 1, 0))"
        ).alias("flags"),
    )
    return prepared.select("doc_id", F.expr(expr).alias("s")).select(
        "doc_id",
        F.col("s.n_tokens").cast("long").alias("n_tokens"),
        F.col("s.n_masked_spans").cast("long").alias("n_masked_spans"),
        F.col("s.corrupted_text").alias("corrupted_text"),
        F.col("s.target_text").alias("target_text"),
    )
