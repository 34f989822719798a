"""Corpus sampling, mixing, PII redaction, and benchmark-contamination
screening — the remaining data-curation passes of an LLM training-data
pipeline (SURVEY.md §2.10 [EXT] surface; the reference has no analog).

Scale design:
- Sampling is *deterministic and stateless*: a row is kept iff a hex
  prefix of md5(id) falls under the rate threshold. No RNG state, no
  seed plumbing, reproducible across engines and re-runs, embarrassingly
  parallel (pure map, no shuffle), and composable — the same row set is
  sampled on every cluster size. This is how big corpus pipelines pin
  their subsets.
- Mixing = broadcast-join the tiny per-source rate table against the
  fact; the filter stays a map-side predicate.
- PII redaction is regexp_replace in whole-stage codegen — no Python in
  the scan path.
- Contamination screening broadcasts the benchmark n-gram set (small by
  construction) against the exploded corpus n-grams: the corpus side
  never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.plans.registry import query
from rws_data_ingester_spark.session import local_frame

# (source, 2-hex-digit threshold): P(keep) = int(threshold,16)/256.
_MIX_RATES = [
    ("src0", "80"),  # ≈50%
    ("src1", "40"),  # ≈25%
    ("src2", "20"),  # ≈12.5%
    ("src3", "10"),  # ≈6.25%
]


def _md5_prefix(id_col: F.Column) -> F.Column:
    return F.substring(F.md5(id_col.cast("string")), 1, 2)


@query(
    "sample_deterministic",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(doc_id::VARCHAR), 1, 2) < '1a'
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ≈10% systematic sample: keep iff the first hex byte
    of md5(doc_id) < 0x1a (26/256). Engine-independent (md5 hex is
    identical everywhere), re-run-stable, pure map-side."""
    d = Catalog(spark, sf_dir).documents
    return d.filter(_md5_prefix(F.col("doc_id")) < "1a").select(
        "doc_id", "lang", "source"
    )


@query(
    "pipeline_data_mix",
    oracle="""
    WITH rates(source, rate_hex) AS (
      VALUES ('src0', '80'), ('src1', '40'), ('src2', '20'), ('src3', '10')
    )
    SELECT d.source, COUNT(*)::BIGINT AS n_sampled
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE substr(md5(d.doc_id::VARCHAR), 1, 2) < r.rate_hex
    GROUP BY d.source
    """,
)
def pipeline_data_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing: each source is down-sampled at its own
    deterministic rate (the md5-prefix rule above), then counted. The
    rate table is broadcast; the filter is map-side."""
    d = Catalog(spark, sf_dir).documents
    # local_frame: plan-embedded LocalRelation, no Python-RDD scan job
    # per consumption (OPTIMIZATION_r10.md section 5)
    rates = local_frame(spark, _MIX_RATES, ["source", "rate_hex"])
    return (
        d.join(F.broadcast(rates), "source")
        .filter(_md5_prefix(F.col("doc_id")) < F.col("rate_hex"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )


@query(
    "text_pii_redact",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com or 555-0199 at 192.168.1.' || (doc_id % 255) AS text
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))::BIGINT
             AS n_emails,
           len(regexp_extract_all(text, '\\d{3}-\\d{4}'))::BIGINT AS n_phones,
           len(regexp_extract_all(text, '\\d+\\.\\d+\\.\\d+\\.\\d+'))::BIGINT AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
               '\\d+\\.\\d+\\.\\d+\\.\\d+', '<IP>', 'g'),
             '\\d{3}-\\d{4}', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact emails / phone fragments / IPv4
    addresses. The corpus text is synthetic, so PII is injected
    deterministically from doc_id before redaction — the redaction
    expressions themselves are the product operator (all JVM regexp,
    whole-stage codegen). Order matters: IPs before phones, since
    '555-0199' must not eat dotted quads."""
    d = Catalog(spark, sf_dir).documents
    # The unbounded-prefix patterns carry a negative lookbehind guard:
    # java.util.regex restarts the greedy class consume at EVERY position
    # of a long token, so the plain email pattern is O(n^2) on a 300 KB
    # alphanumeric run with no '@' (one 10 MB minified-JS row would pin
    # an executor core for hours at corpus scale). The guard makes every
    # interior-of-run start fail in O(1); it provably never changes the
    # match set, because any match whose previous char is in the class
    # implies a longer match from the run start, which leftmost-first
    # would have produced instead. The DuckDB oracle keeps the guardless
    # pattern: RE2 has no lookbehind and is linear-time regardless —
    # result identity is what the big-doc differential suite pins.
    email = r"(?<![A-Za-z0-9._%+-])[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    phone = r"\d{3}-\d{4}"  # bounded quantifiers: linear, no guard needed
    ip = r"(?<!\d)\d+\.\d+\.\d+\.\d+"
    aug = d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-0199 at 192.168.1."),
            (F.col("doc_id") % 255).cast("string"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("text", F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(phone)).cast("long").alias("n_phones"),
        F.regexp_count("text", F.lit(ip)).cast("long").alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", email, "<EMAIL>"), ip, "<IP>"
            ),
            phone,
            "<PHONE>",
        ).alias("redacted"),
    )


@query(
    "text_contamination",
    oracle="""
    -- Linear form: zipped parallel UNNESTs emit (i, tok) once and LEAD
    -- assembles the 4-gram; carrying the token list through the UNNEST
    -- and slicing per i is accidentally quadratic (the list is
    -- materialized per gram row) and melts on multi-MB documents.
    WITH tok AS (
      SELECT doc_id,
             UNNEST(generate_series(1, len(toks))) AS i,
             UNNEST(toks) AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    g AS (
      SELECT doc_id,
             concat_ws(' ', tok,
                       lead(tok, 1) OVER w,
                       lead(tok, 2) OVER w,
                       lead(tok, 3) OVER w) AS gram,
             lead(tok, 3) OVER w AS t3
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ),
    grams AS (SELECT doc_id, gram FROM g WHERE t3 IS NOT NULL),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 10),
    corpus AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id >= 10)
    SELECT c.doc_id, COUNT(*)::BIGINT AS n_hits
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: count distinct n-gram collisions
    between each corpus document and a benchmark set (stand-in: docs
    0-9; n=4 here for test-signal density on the synthetic corpus — a
    production screen uses n in 8-13, same plan). The benchmark gram set
    is broadcast — at 100 TB the corpus grams are filtered where they
    are produced and never shuffle; only per-doc hit counts aggregate."""
    d = Catalog(spark, sf_dir).documents
    toks = F.split("text", " ")
    # Grams are carried as xxhash64 longs of the 4 tokens, never as
    # assembled strings: the screen only tests gram EQUALITY, tokens
    # cannot contain the split separator, and Spark's multi-arg xxhash64
    # seed-chains per field — so hash equality ⟺ string-gram equality up
    # to 2⁻⁶⁴ collisions (a collision could only inflate one n_hits by
    # 1; the string-based DuckDB oracle above re-proves exactness on
    # every driver run). No per-gram concat allocation, and everything
    # downstream carries 8-byte keys.
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.array(toks),
                # Guard: sequence(1, n) DESCENDS when n < 1 (DuckDB's
                # generate_series is empty there) — short docs get no grams.
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
    # Join FIRST, deduplicate after: n_hits counts DISTINCT shared grams,
    # and count_distinct over the (rare) matched rows equals the old
    # distinct-the-whole-corpus-then-join form — but the corpus-wide
    # Exchange of every (doc_id, gram) pair is gone; only benchmark
    # collisions leave the scan (r10 A/B: 0.71 s → 0.46 s at sf0.1,
    # identical rows; at 100 TB the removed shuffle is the corpus's
    # entire gram stream).
    return (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hits"))
    )


@query(
    "sample_stratified_capped",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY md5(doc_id::VARCHAR)
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source
    FROM ranked WHERE rn <= 30
    """,
)
def sample_stratified_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group contribution cap: at most 30 docs per language, chosen
    deterministically (ranked by md5(doc_id) — an unbiased, RNG-free,
    engine-independent order). The standard curation move for capping an
    over-represented source/language in the mix. Executes as
    WindowGroupLimit: the rank-filter is pushed into the window operator,
    so each partition keeps a 30-row heap instead of fully sorting —
    per-group cost is O(n log k), and only survivors leave the exchange
    on lang."""
    from pyspark.sql import Window

    d = Catalog(spark, sf_dir).documents
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .select("doc_id", "lang", "source")
    )


@query(
    "text_vocab_oov",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (
      SELECT token FROM toks
      GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT 32
    )
    SELECT t.doc_id,
           COUNT(*)::BIGINT AS n_tokens,
           COUNT(*) FILTER (WHERE v.token IS NULL)::BIGINT AS n_oov,
           ROUND(COUNT(*) FILTER (WHERE v.token IS NULL)::DOUBLE / COUNT(*), 6)
             AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.doc_id
    """,
)
def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep pass: build the top-32 corpus vocabulary, then score
    every document's out-of-vocabulary rate against it. Two-phase: the
    vocab is a corpus-wide aggregate (tiny by construction — top-k), then
    BROADCAST back against the exploded token stream, so the second pass
    adds no shuffle beyond the per-doc re-aggregation. At 100 TB the
    vocab build is the only corpus-wide exchange (partial counts
    map-side); the OOV join never moves the corpus."""
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(32)
        .select("token")
    )
    return (
        toks.join(F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_if(F.col("in_vocab").isNull()).alias("n_oov"),
            pround(
                F.count_if(F.col("in_vocab").isNull()) / F.count("*"), 6
            ).alias("oov_rate"),
        )
    )


@query(
    "pipeline_mix_temperature",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY source
    ), rates AS (
      SELECT source, n_docs,
             least(floor(least(1.0, sqrt(100.0 / n_docs)) * 16777216),
                   16777215)::BIGINT AS thr
      FROM counts
    ), sampled AS (
      SELECT d.source, COUNT(*)::BIGINT AS n_sampled
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE substr(md5(d.doc_id::VARCHAR), 1, 6) < printf('%06x', r.thr)
      GROUP BY d.source
    )
    SELECT r.source, r.n_docs,
           COALESCE(s.n_sampled, 0)::BIGINT AS n_sampled,
           ROUND(r.thr / 16777216.0, 6) AS samp_rate
    FROM rates r LEFT JOIN sampled s ON r.source = s.source
    """,
)
def pipeline_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (the multilingual-LLM sampling rule
    of XLM-R / mT5: keep probability proportional to count^(alpha-1),
    alpha=0.5, so small sources are up-weighted relative to their share).
    Rates are UNNORMALIZED against a fixed reference count — p_s =
    min(1, sqrt(ref / n_s)) — deliberately: each rate is then a chain of
    single correctly-rounded IEEE ops on one source's count, so Spark and
    DuckDB compute bit-identical thresholds (a cross-source SUM of
    doubles would be summation-order-dependent and could flip a floor()).
    The threshold becomes a 6-hex-digit md5-prefix cutoff — the same
    deterministic, engine-independent, map-side rule as
    sample_deterministic. The rate table is tiny and broadcast; the
    corpus-side filter never shuffles."""
    d = Catalog(spark, sf_dir).documents
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    rates = (
        counts.withColumn(
            "thr",
            F.least(
                F.floor(
                    F.least(F.lit(1.0), F.sqrt(F.lit(100.0) / F.col("n_docs")))
                    * 16777216
                ),
                F.lit(16777215),
            ),
        )
        .withColumn("hex6", F.format_string("%06x", F.col("thr")))
    )
    sampled = (
        d.join(F.broadcast(rates), "source")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6) < F.col("hex6")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        rates.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            pround(F.col("thr") / F.lit(16777216.0), 6).alias("samp_rate"),
        )
    )


@query("sample_weighted_reservoir", oracle=None)  # pow() is libm-dependent → rows-only
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement, k=5 per
    language, weight = document length (Efraimidis-Spirakis A-ES: rank by
    u^(1/w) with u drawn per row, keep the top k per group). The draw is
    derived from md5(doc_id) — no RNG state, reproducible on any cluster
    size and across re-runs, same contract as sample_deterministic. The
    per-group top-k is a rank-limited window (WindowGroupLimit pushes k
    into the sort), so the shuffle per group carries k rows, not the
    corpus. Registered rows-only: u^(1/w) goes through pow(), whose
    last-ulp behavior is libm-specific, so a DuckDB oracle could flip a
    borderline rank; determinism and bias are pinned in tests instead."""
    d = Catalog(spark, sf_dir).documents
    # u in (0, 1): 8 hex digits of md5 → 32-bit int, +0.5 to stay off 0
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / F.lit(4294967296.0)
    key = F.pow(u, 1.0 / F.greatest(F.col("n_chars").cast("double"), F.lit(1.0)))
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        d.select("doc_id", "lang", "n_chars", key.alias("es_key"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "lang", "n_chars", "rank")
    )


@query(
    "pipeline_train_val_test",
    oracle="""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, COUNT(*)::BIGINT AS n_docs
    FROM assigned GROUP BY lang, split
    """,
)
def pipeline_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split (md5-prefix bands:
    0x00-0xcb train, 0xcc-0xe5 val, 0xe6-0xff test), reported per
    language so stratification drift is visible. Same engine-independent
    hash rule as sample_deterministic: a document's split NEVER changes
    across re-runs, cluster sizes, or engines — the property that keeps
    eval sets uncontaminated as the corpus grows. Pure map-side assign +
    one cell-level aggregate."""
    d = Catalog(spark, sf_dir).documents
    h = _md5_prefix(F.col("doc_id"))
    split = (
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )
