"""Text-analysis operators over the documents table (SURVEY.md §2.10
[EXT]): corpus statistics, token frequencies, quality scoring, language-ID
heuristic, regex token counting, document fingerprinting.

All the hot paths are built-in string/array functions (split, explode,
higher-order lambdas) — JVM-side, whole-stage codegen. No Python UDF in
anything that touches every token at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query


@query(
    "text_stats_by_lang",
    oracle="""
    SELECT lang,
           COUNT(*)::BIGINT AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens,
           MIN(n_chars)::BIGINT AS min_chars,
           MAX(n_chars)::BIGINT AS max_chars,
           COUNT(DISTINCT source)::BIGINT AS n_sources
    FROM documents GROUP BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        pround(F.avg("n_chars"), 4).alias("avg_chars"),
        pround(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "text_token_topk",
    oracle="""
    WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
    SELECT token, COUNT(*)::BIGINT AS n
    FROM toks GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """,
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency top-k. explode → two-phase hash agg
    (partial per partition, final after one shuffle on token) → global
    top-k via TakeOrderedAndProject. The classic word-count shape; at
    100 TB the partial agg collapses each partition to its vocabulary."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@query(
    "text_quality_scores",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_tokens,
           ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
                 / len(string_split(text, ' ')), 6) AS distinct_ratio,
           ROUND((length(text) - length(replace(text, ' ', '')))::DOUBLE
                 / nullif(length(text), 0), 6) AS space_ratio,
           ROUND(length(replace(text, ' ', ''))::DOUBLE
                 / len(string_split(text, ' ')), 4) AS avg_token_len,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+'))::BIGINT AS n_regex_tokens
    FROM documents
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, lexical diversity
    (distinct-token ratio), whitespace ratio, mean token length, and a
    BPE-ish regex token count — the standard cheap quality filters for a
    pretraining-data pipeline.

    The split-based denominators are safe without guards (split('', ' ')
    yields [''] — size 1 — in both engines); space_ratio's length(text)
    is the one true zero for empty documents, where Spark's x/0 → NULL
    but DuckDB's → nan — nullif on both sides makes the engines agree."""
    d = Catalog(spark, sf_dir).documents
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    no_space = F.replace(F.col("text"), F.lit(" "), F.lit(""))
    # Two-phase select: bind each raw ratio once, round the bound column —
    # pround references its operand 4×, and these operands re-split /
    # re-scan the document body per reference (the SCALE.md per-row
    # linearity rule; CollapseProject never inlines a non-cheap
    # multi-referenced expression, so the bind is stable).
    raw = d.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n_toks).alias("_distinct"),
        (
            (F.length("text") - F.length(no_space)).cast("double")
            / F.nullif(F.length("text"), F.lit(0))
        ).alias("_space"),
        (F.length(no_space).cast("double") / n_toks).alias("_tok_len"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast("long").alias(
            "n_regex_tokens"
        ),
    )
    return raw.select(
        "doc_id",
        "n_tokens",
        pround("_distinct", 6).alias("distinct_ratio"),
        pround("_space", 6).alias("space_ratio"),
        pround("_tok_len", 4).alias("avg_token_len"),
        "n_regex_tokens",
    )


# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible so the oracle can replay it.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "de", "que", "los", "las"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3"),
}


def _marker_hits_spark(lang: str) -> F.Column:
    lst = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return F.expr(f"size(filter(array_distinct(split(text, ' ')), t -> t in ({lst})))")


@query(
    "text_langid_heuristic",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(list_distinct(string_split(text, ' ')),
                 t -> t IN ('the','and','of','to','in')))  AS hits_en,
             len(list_filter(list_distinct(string_split(text, ' ')),
                 t -> t IN ('le','la','et','les','des')))  AS hits_fr,
             len(list_filter(list_distinct(string_split(text, ' ')),
                 t -> t IN ('el','de','que','los','las'))) AS hits_es,
             len(list_filter(list_distinct(string_split(text, ' ')),
                 t -> t IN ('der','die','und','das','ist'))) AS hits_de,
             len(list_filter(list_distinct(string_split(text, ' ')),
                 t -> t IN ('de5','shi4','le5','zai4','you3'))) AS hits_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_de
                  AND hits_en >= hits_zh THEN 'en'
             WHEN hits_fr >= hits_es AND hits_fr >= hits_de AND hits_fr >= hits_zh THEN 'fr'
             WHEN hits_es >= hits_de AND hits_es >= hits_zh THEN 'es'
             WHEN hits_de >= hits_zh THEN 'de'
             ELSE 'zh'
           END AS predicted_lang
    FROM scored
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID with a deterministic preference order on
    ties (en > fr > es > de > zh) so both engines agree exactly."""
    d = Catalog(spark, sf_dir).documents
    hits = {lang: _marker_hits_spark(lang) for lang in _LANG_MARKERS}
    pred = (
        F.when(
            (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]) & (hits["en"] >= hits["zh"]),
            "en",
        )
        .when((hits["fr"] >= hits["es"]) & (hits["fr"] >= hits["de"]) & (hits["fr"] >= hits["zh"]), "fr")
        .when((hits["es"] >= hits["de"]) & (hits["es"] >= hits["zh"]), "es")
        .when(hits["de"] >= hits["zh"], "de")
        .otherwise("zh")
    )
    return d.select("doc_id", "lang", pred.alias("predicted_lang"))


@query("text_fingerprint", oracle=None)  # xxhash64 engine-specific → rows-only
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min/max/count over the rolling
    5-gram character hash sequence. xxhash64 keeps it JVM-side; the
    rolling windows come from zipped shifted slices (no Python).

    Structure matters here: the obvious ``transform(sequence(1, n-4),
    i -> xxhash64(substring(text, i, 5)))`` is O(n²) per document TWICE
    over — character-addressed substring rescans the string per window,
    and (the dominant cost) an OUTER column referenced inside a
    higher-order-function lambda is re-read from the row PER ELEMENT,
    and UnsafeRow.getUTF8String/getBinary copy the whole payload each
    time: one 300 KB document = 600k × 300 KB ≈ 180 GB of memcopy,
    ~1 min/row (found by the multi-MB-document probe). The linear form
    feeds ALL per-element data through the transform's input array,
    which a HOF evaluates once per row: zip five shifted slices of the
    split-to-chars array and hash the reassembled 5-gram from the zip
    struct. ~1 s for a 2× 300 KB corpus vs 55-58 s before."""
    d = Catalog(spark, sf_dir).documents
    with_chars = d.select(
        "doc_id", F.split(F.col("text"), "(?!^)").alias("_c")
    )
    zipped = F.arrays_zip(
        *[
            F.slice(
                F.col("_c"), F.lit(j + 1), F.greatest(F.size("_c") - 4, F.lit(1))
            ).alias(f"c{j}")
            for j in range(5)
        ]
    )
    # concat_ws, not concat: docs shorter than 5 chars produce shifted
    # slices of unequal length, which arrays_zip NULL-pads — concat of any
    # NULL is NULL and xxhash64(NULL) is the constant seed, collapsing
    # EVERY short doc to the identical fingerprint. concat_ws skips NULLs,
    # reproducing the truncated-actual-text gram (identical to concat for
    # docs of >= 5 chars, where no slice is padded).
    grams_col = F.transform(
        zipped,
        lambda s: F.xxhash64(
            F.concat_ws("", s["c0"], s["c1"], s["c2"], s["c3"], s["c4"])
        ),
    )
    with_grams = with_chars.select("doc_id", grams_col.alias("_grams"))
    return with_grams.select(
        "doc_id",
        F.array_min("_grams").alias("fp_min"),
        F.array_max("_grams").alias("fp_max"),
        F.size("_grams").cast("long").alias("fp_len"),
        F.xxhash64(
            F.concat_ws("|", F.transform("_grams", lambda x: x.cast("string")))
        ).alias("fingerprint"),
    )


@query(
    "text_tfidf",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 100
    ),
    tf AS (
      SELECT doc_id, UNNEST(toks) AS token, len(toks) AS n_toks
      FROM docs
    ),
    counts AS (
      SELECT doc_id, token, COUNT(*) AS cnt, ANY_VALUE(n_toks) AS n_toks
      FROM tf GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS doc_freq FROM counts GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM docs)
    SELECT c.doc_id, c.token,
           ROUND((c.cnt::DOUBLE / c.n_toks)
                 * (ln((n.n_docs + 1)::DOUBLE / (d.doc_freq + 1)) + 1), 6) AS tfidf
    FROM counts c JOIN df d ON c.token = d.token CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, DataFrame-native (no MLlib hashing — exact terms so the
    oracle can replay it): tf = cnt/doc_len, idf = ln((N+1)/(df+1)) + 1.

    Scale shape: two hash aggs (per-doc-term, per-term) + one broadcast of
    the tiny doc-count scalar + a shuffle join on token. The doc-frequency
    table is vocabulary-sized — orders smaller than the corpus."""
    d = Catalog(spark, sf_dir).documents
    docs = d.filter(F.col("doc_id") < 100).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    # doc count as a broadcast one-row aggregate (same pattern as
    # agg_share_of_total) — keeps the whole query a single job instead of
    # an extra driver-side count() action per invocation.
    n = docs.agg(F.count("*").alias("n_docs"))
    counts = (
        docs.select("doc_id", F.size("toks").alias("n_toks"), F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"), F.first("n_toks").alias("n_toks"))
    )
    doc_freq = counts.groupBy("token").agg(F.countDistinct("doc_id").alias("doc_freq"))
    return counts.join(doc_freq, "token").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "token",
        pround(
            (F.col("cnt").cast("double") / F.col("n_toks"))
            * (F.log((F.col("n_docs") + 1) / (F.col("doc_freq") + 1)) + 1),
            6,
        ).alias("tfidf"),
    )


@query(
    "data_profile_documents",
    oracle="""
    SELECT 'doc_id' AS col, COUNT(*)::BIGINT AS n_rows,
           COUNT(doc_id)::BIGINT AS n_nonnull,
           COUNT(DISTINCT doc_id)::BIGINT AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*)::BIGINT, COUNT(lang)::BIGINT,
           COUNT(DISTINCT lang)::BIGINT FROM documents
    UNION ALL
    SELECT 'source', COUNT(*)::BIGINT, COUNT(source)::BIGINT,
           COUNT(DISTINCT source)::BIGINT FROM documents
    UNION ALL
    SELECT 'text', COUNT(*)::BIGINT, COUNT(text)::BIGINT,
           COUNT(DISTINCT text)::BIGINT FROM documents
    """,
)
def data_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling: per-column row/non-null/distinct counts in ONE
    aggregation pass (all counters computed together, then unpivoted) —
    the first thing a 100 TB ingest runs, and it must not scan per-column.
    Exact distincts here for the oracle; the scale variant swaps in
    approx_count_distinct."""
    d = Catalog(spark, sf_dir).documents
    cols = ["doc_id", "lang", "source", "text"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__nonnull"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    wide = d.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__nonnull, {c}__distinct" for c in cols
    )
    return wide.select(
        "n_rows",
        F.expr(f"stack({len(cols)}, {stacked}) AS (col, n_nonnull, n_distinct)"),
    ).select("col", "n_rows", "n_nonnull", "n_distinct")


_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


@query(
    "text_stopword_ratio",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           len(list_filter(toks, t -> list_contains({list(_STOPWORDS)}, t)))::BIGINT
             AS n_stopwords,
           ROUND(len(list_filter(toks, t -> list_contains({list(_STOPWORDS)}, t)))::DOUBLE
                 / len(toks), 6) AS stopword_ratio
    FROM d
    """,
)
def text_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density quality signal (high ratio ≈ natural prose, low ≈
    boilerplate/code). The stopword list ships as an array literal inside
    the lambda — evaluated JVM-side, no broadcast needed at this size; a
    real 100 TB run with a large lexicon would broadcast-join a lexicon
    table instead."""
    d = Catalog(spark, sf_dir).documents
    toks = F.split("text", " ")
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    # bind the ratio once: pround's 4 operand references would otherwise
    # re-run the split+filter HOF chain per reference (see text stats)
    return d.select(
        "doc_id",
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop.cast("double") / F.size(toks)).alias("_ratio"),
    ).select(
        "doc_id",
        "n_stopwords",
        pround("_ratio", 6).alias("stopword_ratio"),
    )


@query(
    "pipeline_corpus_clean",
    oracle="""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id, text
      FROM documents GROUP BY text          -- exact dedup, keep lowest id
    ),
    scored AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))::DOUBLE
               / len(string_split(text, ' ')) AS sw_ratio
      FROM keepers
    )
    SELECT d.lang,
           COUNT(*)::BIGINT AS n_docs,
           ROUND(AVG(s.n_tokens), 4) AS avg_tokens,
           ROUND(AVG(s.sw_ratio), 6) AS avg_sw_ratio
    FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    WHERE s.n_tokens BETWEEN 5 AND 500 AND s.sw_ratio >= 0.05
    GROUP BY d.lang
    """,
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline end-to-end in one plan: exact dedup
    (groupBy text, keep lowest doc_id) → quality gate (token-count bounds
    + stopword-density floor) → per-language corpus stats.

    Scale shape: dedup shuffles once on the content (at 100 TB: on its
    sha256 — see dedup_exact_hash), the quality gate is a pure projection,
    and the final join back to metadata is on doc_id. This is the query a
    user of this engine actually runs before tokenizing a crawl."""
    d = Catalog(spark, sf_dir).documents
    keepers = d.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    toks = F.split("text", " ")
    sw = F.array(*[F.lit(w) for w in ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")])
    scored = keepers.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
            / F.size(toks)
        ).alias("sw_ratio"),
    )
    return (
        scored.filter(
            (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 500) & (F.col("sw_ratio") >= 0.05)
        )
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            pround(F.avg("n_tokens"), 4).alias("avg_tokens"),
            pround(F.avg("sw_ratio"), 6).alias("avg_sw_ratio"),
        )
    )


@query(
    "text_length_outliers",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), bounds AS (
      SELECT quantile_cont(n_tokens, 0.05) AS lo,
             quantile_cont(n_tokens, 0.95) AS hi
      FROM tok
    )
    SELECT lang,
           ROUND(ANY_VALUE(b.lo), 6) AS p5_tokens,
           ROUND(ANY_VALUE(b.hi), 6) AS p95_tokens,
           SUM(CASE WHEN n_tokens BETWEEN b.lo AND b.hi THEN 1 ELSE 0 END)::BIGINT
             AS n_kept,
           SUM(CASE WHEN n_tokens < b.lo OR n_tokens > b.hi THEN 1 ELSE 0 END)::BIGINT
             AS n_dropped
    FROM tok, bounds b GROUP BY lang
    """,
)
def text_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-adaptive length filtering — the data-driven cousin of the
    fixed-threshold Gopher gates: compute the corpus p5/p95 token counts,
    broadcast them as a one-row scalar, and gate every document against
    them, reporting per-language keep/drop counts.

    Two passes by necessity (the threshold depends on the whole corpus),
    but each is one partial→final aggregation; the bounds travel back as
    a broadcast crossJoin (the `agg_share_of_total` pattern), never an
    unpartitioned window. Exact interpolated percentiles here for the
    oracle; at 100 TB swap `F.percentile` for `percentile_approx` (fixed
    ~KB sketch per partition) — one function name, same plan shape.
    Spark's percentile and DuckDB's quantile_cont share linear
    interpolation, so the bounds agree bit-for-bit on integer inputs."""
    d = Catalog(spark, sf_dir).documents
    tok = d.select(
        "lang", F.size(F.split("text", " ")).cast("double").alias("n_tokens")
    )
    bounds = tok.agg(
        F.percentile("n_tokens", F.lit(0.05)).alias("lo"),
        F.percentile("n_tokens", F.lit(0.95)).alias("hi"),
    )
    return (
        tok.crossJoin(F.broadcast(bounds))
        .groupBy("lang")
        .agg(
            pround(F.first("lo"), 6).alias("p5_tokens"),
            pround(F.first("hi"), 6).alias("p95_tokens"),
            F.sum(
                F.when(F.col("n_tokens").between(F.col("lo"), F.col("hi")), 1).otherwise(0)
            ).alias("n_kept"),
            F.sum(
                F.when((F.col("n_tokens") < F.col("lo")) | (F.col("n_tokens") > F.col("hi")), 1).otherwise(0)
            ).alias("n_dropped"),
        )
    )


@query(
    "text_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS ws_tokens,
           len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+'))::BIGINT
             AS bpe_tokens,
           ROUND(length(text)::DOUBLE
                 / nullif(len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+')), 0), 4)
             AS chars_per_token
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-style pretokenizer regex (the GPT-2
    pattern's RE2-safe core: leading-space word / number / punctuation
    runs) alongside the whitespace count — the budget signal a training
    pipeline uses before the real tokenizer runs. Pure regexp in
    whole-stage codegen on both engines; the pattern deliberately avoids
    lookahead so Java regex (Spark) and RE2 (DuckDB) agree token-for-
    token. chars_per_token is the standard compression-ratio proxy;
    a whitespace-only document has zero BPE tokens, so the ratio is
    NULL via nullif in both engines (Spark x/0 → NULL, DuckDB → inf —
    the guard keeps the oracle comparable on degenerate data)."""
    d = Catalog(spark, sf_dir).documents
    bpe = F.size(
        F.expr(r"regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+', 0)")
    ).cast("long")
    # bind bpe_tokens once, then ratio off the bound column — otherwise
    # pround's 4 operand references re-run the regex scan per reference
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length("text").cast("double").alias("_chars"),
    ).select(
        "doc_id",
        "ws_tokens",
        "bpe_tokens",
        pround(F.col("_chars") / F.nullif(F.col("bpe_tokens"), F.lit(0)), 4).alias(
            "chars_per_token"
        ),
    )
