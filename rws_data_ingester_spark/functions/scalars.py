"""Scalar function layer (SURVEY.md §2.8): string / math / date /
conditional / array / map / JSON / hash functions, exercised as oracle-
checked queries over the fixture tables.

[REF] ancestry: substring-contains (src/rotterdam_swimming_advice.py:174,
182), strip/rstrip cleanup (:61,69,72-74), replace (:72-73,285),
concat/join/format (:80,106,189-225), coalesce-defaults (:169,171,188),
JSON decode with fallback (:138-141). Each appears below in columnar form.

Everything here is a built-in ``pyspark.sql.functions`` call — JVM-side,
inside whole-stage codegen, no Python in the hot path. Transcendental
outputs (ln/exp) are rounded on both sides because JVM libm and DuckDB
libm may differ in the last ulp.

Round-2 consolidation: the 23 original scalar queries are merged into 11
by source table (one scan per family) so the whole scalar surface fits
the driver's per-round correctness window; every §2.8 function from the
original set is still exercised — nothing was dropped, only co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.functions.timefmt import ts_str
from rws_data_ingester_spark.plans.registry import query


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                                   AS name_lower,
           upper(p_brand)                                  AS brand_upper,
           substring(p_name, 1, 10)                        AS name_prefix,
           length(p_name)::BIGINT                          AS name_len,
           lpad(p_partkey::VARCHAR, 10, '0')               AS key_padded,
           replace(p_type, ' ', '_')                       AS type_snake,
           trim(concat('  ', p_name, '  '))                AS name_trimmed,
           rtrim(concat(p_brand, '::'), ':')               AS brand_rtrim,
           contains(p_type, 'BRASS')                       AS is_brass,
           instr(p_name, 'a')::BIGINT                      AS first_a,
           regexp_extract(p_brand, '#(\\d+)', 1)           AS brand_num,
           levenshtein(p_brand, 'Brand#11')::BIGINT        AS brand_dist,
           split_part(p_type, ' ', 1)                      AS type_first_word,
           COALESCE(NULLIF(p_brand, 'Brand#11'), 'N/A')    AS brand_or_na,
           COALESCE(try_cast(regexp_extract(p_name, '^(\\d+)', 1) AS BIGINT), -1)
             AS leading_num
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions over part, plus the reference's defensive
    ``.get(field, 'N/A')`` coalesce-defaults pattern
    (src/rotterdam_swimming_advice.py:169,171,188) in columnar form."""
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.rtrim(F.concat(F.col("p_brand"), F.lit("::")), F.lit(":")).alias("brand_rtrim"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).cast("long").alias("brand_dist"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#11")), F.lit("N/A")).alias(
            "brand_or_na"
        ),
        F.coalesce(
            F.expr(r"try_cast(regexp_extract(p_name, '^(\\d+)', 1) AS BIGINT)"),
            F.lit(-1),
        ).alias("leading_num"),
    )


@query(
    "scalar_string_conditional_funcs",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 8000 THEN 'mid'
                ELSE 'high' END                              AS bal_tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'n/a') AS seg_or_na,
           (CASE WHEN c_acctbal > 0 THEN ROUND(c_acctbal, 2) ELSE NULL END) AS pos_bal,
           if(c_acctbal >= 0, 'credit', 'debit')             AS side,
           regexp_replace(c_name, '[0-9]+', '#')             AS name_hashed,
           translate(c_mktsegment, 'AEIOU', 'aeiou')         AS seg_translated,
           repeat(c_mktsegment[1:1], 3)                      AS first_x3,
           reverse(c_name)                                   AS name_rev,
           ascii(c_mktsegment)::BIGINT                       AS seg_ascii,
           chr(65 + (c_custkey % 26)::INTEGER)               AS key_letter,
           concat_ws('-', c_mktsegment, c_custkey::VARCHAR)  AS seg_key,
           printf('%s has balance %.2f', c_name, c_acctbal)  AS summary,
           upper(c_name[1:1]) || lower(c_name[2:])           AS name_title,
           strpos(c_name, '1')::BIGINT                       AS pos_one,
           left(c_mktsegment, 3)                             AS seg3,
           right(c_name, 4)                                  AS name_tail,
           c_mktsegment LIKE 'B%'                            AS seg_b,
           c_name SIMILAR TO 'Customer#[0-9]+'               AS name_canonical,
           split_part(c_name, '#', 2)                        AS name_number
    FROM customer
    """,
)
def scalar_string_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (when/nullif/nvl-style) plus the second and third string
    batches over one customer scan: regexp_replace, translate, repeat,
    reverse, ascii/chr, concat_ws, printf/format_string, initcap (DuckDB
    lacks the function — its oracle spells upper(head)||lower(tail),
    equivalent for single-word names), position, left/right, LIKE,
    anchored regex match, split_part."""
    c = Catalog(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("n/a")).alias(
            "seg_or_na"
        ),
        F.when(F.col("c_acctbal") > 0, pround("c_acctbal", 2)).alias("pos_bal"),
        F.when(F.col("c_acctbal") >= 0, "credit").otherwise("debit").alias("side"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_hashed"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("first_x3"),
        F.reverse("c_name").alias("name_rev"),
        F.ascii("c_mktsegment").cast("long").alias("seg_ascii"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("key_letter"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
        # format_string renders a NULL arg as the text "null" while DuckDB's
        # printf propagates NULL — pin the null-propagating behavior.
        F.when(
            F.col("c_name").isNotNull() & F.col("c_acctbal").isNotNull(),
            F.format_string("%s has balance %.2f", F.col("c_name"), F.col("c_acctbal")),
        ).alias("summary"),
        F.initcap(F.lower("c_name")).alias("name_title"),
        F.instr("c_name", "1").cast("long").alias("pos_one"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.substring("c_name", -4, 4).alias("name_tail"),
        F.col("c_mktsegment").like("B%").alias("seg_b"),
        F.col("c_name").rlike("^Customer#[0-9]+$").alias("name_canonical"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_number"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                    AS price_r1,
           ROUND(abs(l_extendedprice - 1000.0), 4)      AS abs_diff,
           floor(l_extendedprice)::BIGINT               AS price_floor,
           ceil(l_extendedprice)::BIGINT                AS price_ceil,
           ROUND(pow(l_quantity, 2) + 1e-8, 4)          AS qty_sq,
           CASE WHEN l_extendedprice > 0
                THEN ROUND(ln(l_extendedprice) + 1e-10, 6) END AS price_ln,
           ROUND(exp(l_discount) + 1e-10, 6)            AS disc_exp,
           CASE WHEN l_extendedprice >= 0
                THEN ROUND(sqrt(l_extendedprice), 6) END AS price_sqrt,
           (l_linenumber % 3)::BIGINT                   AS line_mod,
           ROUND(greatest(l_discount, l_tax), 4)        AS max_rate,
           ROUND(least(l_discount, l_tax), 4)           AS min_rate,
           sign(l_extendedprice - 1000.0)::DOUBLE       AS price_sign,
           ROUND(CASE WHEN (l_linenumber - 1) = 0 THEN NULL
                 ELSE l_quantity / (l_linenumber - 1) END, 6) AS qty_per_prev_line,
           CASE WHEN (l_linenumber - 1) = 0 THEN NULL
                ELSE (l_orderkey // (l_linenumber - 1)) END::BIGINT AS key_div
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins plus try_* arithmetic (divide-by-zero yields NULL
    instead of failing the job — the columnar analog of the reference's
    defensive defaults) over one lineitem scan."""
    li = Catalog(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround("l_extendedprice", 1).alias("price_r1"),
        pround(F.abs(F.col("l_extendedprice") - 1000.0), 4).alias("abs_diff"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        pround(F.pow("l_quantity", F.lit(2)) + 1e-8, 4).alias("qty_sq"),
        # ln/sqrt domains are guarded identically on both engines: DuckDB
        # ERRORS on ln(x<=0) / sqrt(x<0) where Spark yields NULL/NaN.
        # ln/exp/pow are NOT correctly-rounded (JVM vs libm can differ
        # by an ulp), so those get the scale-proportional nudge on both
        # sides (the agg_corr_covar class); sqrt IS IEEE-exact — no nudge.
        F.when(F.col("l_extendedprice") > 0, pround(F.log("l_extendedprice") + 1e-10, 6)).alias(
            "price_ln"
        ),
        pround(F.exp("l_discount") + 1e-10, 6).alias("disc_exp"),
        F.when(F.col("l_extendedprice") >= 0, pround(F.sqrt("l_extendedprice"), 6)).alias(
            "price_sqrt"
        ),
        (F.col("l_linenumber") % 3).cast("long").alias("line_mod"),
        pround(F.greatest("l_discount", "l_tax"), 4).alias("max_rate"),
        pround(F.least("l_discount", "l_tax"), 4).alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 1000.0).alias("price_sign"),
        pround(F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1), 6).alias(
            "qty_per_prev_line"
        ),
        F.expr("try_divide(l_orderkey, l_linenumber - 1)").cast("long").alias("key_div"),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)::BIGINT                         AS order_year,
           month(o_orderdate)::BIGINT                        AS order_month,
           day(o_orderdate)::BIGINT                          AS order_day,
           dayofweek(o_orderdate)::BIGINT                    AS order_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)::BIGINT AS days_since_95,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S')    AS due_date,
           epoch(o_orderdate)::BIGINT                        AS order_epoch,
           strftime(o_orderdate, '%Y-%m-%d')                 AS order_date_str,
           ROUND(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) / 30.4375, 4)
             AS approx_months,
           strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
           weekofyear(o_orderdate)::BIGINT                   AS woy,
           strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d %H:%M:%S')  AS due_date45,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d %H:%M:%S') AS quarter_later,
           strftime(o_orderdate - INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS grace_start
    FROM orders
    """,
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions and interval arithmetic over one orders scan:
    calendar fields, truncation, month boundaries, epoch conversion, and
    day/month/hour interval offsets rendered to strings per the oracle
    rules. Spark dayofweek is 1=Sunday..7 vs DuckDB 0=Sunday..6, so the
    Spark side subtracts 1. Month addition is calendar-aware in both
    engines (Jan 31 + 1 month = Feb 28).

    Interval offsets are chosen so no two literals normalize equal (DuckDB
    compares intervals at 1 month = 30 days, and its subexpression
    elimination then collapses e.g. `+90 DAY` with `+3 MONTH` into one
    value — a silent wrong-answer class this query would otherwise trip):
    30 DAY, 45 DAY, 3 MONTH (=90d), 36 HOUR (=1.5d) are pairwise distinct."""
    o = Catalog(spark, sf_dir).orders
    fmt = "yyyy-MM-dd HH:mm:ss"
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        ts_str(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).cast("long").alias("days_since_95"),
        ts_str(F.timestamp_add("DAY", F.lit(30), F.col("o_orderdate"))).alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        pround(
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")) / 30.4375, 4
        ).alias("approx_months"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.weekofyear("o_orderdate").cast("long").alias("woy"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 45 DAY"), fmt).alias("due_date45"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH"), fmt).alias(
            "quarter_later"
        ),
        F.date_format(F.col("o_orderdate") - F.expr("INTERVAL 36 HOUR"), fmt).alias(
            "grace_start"
        ),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)::BIGINT                                        AS dim,
           ROUND(embedding[1]::DOUBLE, 6) + 0.0                          AS first_elem,
           ROUND(list_aggregate(embedding::DOUBLE[], 'sum'), 4) + 0.0    AS vec_sum,
           ROUND(list_aggregate(embedding::DOUBLE[], 'max'), 6) + 0.0    AS vec_max,
           ROUND(list_aggregate(embedding::DOUBLE[], 'min'), 6) + 0.0    AS vec_min,
           -- sum-of-squares via transform+aggregate: list_dot_product
           -- raises on a NULL list (even under CASE — vectorized eager
           -- evaluation) while this form propagates NULL like Spark.
           ROUND(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'), 4)
                                                                         AS norm_sq,
           ROUND(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'sum'), 4)
             AS l1_norm,
           len(list_filter(embedding::DOUBLE[], x -> x > 0))::BIGINT     AS n_positive
    FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array lambda functions (transform/filter/aggregate/zip_with) — all
    Catalyst HigherOrderFunctions, no Python. The double-cast before any
    arithmetic keeps Spark and DuckDB in the same float semantics."""
    e = Catalog(spark, sf_dir).embeddings
    dbl = F.expr("transform(embedding, x -> cast(x as double))")
    # two-phase: bind each HOF fold once, round the bound columns —
    # pround references its operand 4×, which would re-fold the array
    # per reference (the similarity/text binding pattern)
    raw = e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.col("embedding")[0].cast("double").alias("_first"),
        F.expr("aggregate(transform(embedding, x -> cast(x as double)), cast(0.0 as double), (acc, x) -> acc + x)").alias("_sum"),
        F.array_max(dbl).alias("_max"),
        F.array_min(dbl).alias("_min"),
        F.expr(
            "aggregate(zip_with(transform(embedding, x -> cast(x as double)),"
            " transform(embedding, x -> cast(x as double)), (a, b) -> a * b),"
            " cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("_norm_sq"),
        F.expr(
            "aggregate(transform(embedding, x -> abs(cast(x as double))),"
            " cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("_l1"),
        F.size(F.expr("filter(embedding, x -> x > 0)")).cast("long").alias("n_positive"),
    )
    return raw.select(
        "vec_id",
        "dim",
        pround("_first", 6).alias("first_elem"),
        pround("_sum", 4).alias("vec_sum"),
        pround("_max", 6).alias("vec_max"),
        pround("_min", 6).alias("vec_min"),
        pround("_norm_sq", 4).alias("norm_sq"),
        pround("_l1", 4).alias("l1_norm"),
        "n_positive",
    )


@query(
    "scalar_collection_hash_funcs",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, lang, source, string_split(text, ' ') AS toks,
             map(['lang', 'source'], [lang, source]) AS meta
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           len(list_filter(toks, t -> length(t) > 4))::BIGINT AS n_long,
           list_reduce(list_transform(toks, t -> length(t)), (a, b) -> a + b)::BIGINT
             AS total_chars,
           CASE WHEN text IS NULL THEN NULL
                WHEN len(list_filter(toks, t -> t = 'the')) > 0 THEN true
                ELSE false END                                    AS has_the,
           len(list_filter(toks, t -> length(t) >= 1)) = len(toks) AS all_nonempty,
           list_position(toks, 'the')::BIGINT                   AS pos_the,
           len(list_filter(toks, t -> t != 'the'))::BIGINT      AS n_non_the,
           CASE WHEN text IS NULL THEN NULL
                ELSE len(list_distinct(toks || ['__sentinel__'])) END::BIGINT
             AS n_with_sentinel,
           CASE WHEN text IS NULL THEN NULL
                ELSE coalesce(array_to_string(toks[2:4], '|'), '') END AS mid_slice,
           CASE WHEN text IS NULL THEN NULL
                ELSE len(flatten([toks, toks])) END::BIGINT       AS n_doubled,
           map_extract(meta, 'lang')[1]                         AS lang,
           map_extract(meta, 'source')[1]                       AS source,
           len(map_keys(meta))::BIGINT                          AS n_keys,
           sha256(text)                                         AS text_sha256,
           md5(text)                                            AS text_md5
    FROM d
    """,
)
def scalar_collection_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (filter/transform+aggregate/exists/
    forall), the second array batch (position lookup, remove-equivalent
    filter, union-with-sentinel distinctness, slice, flatten), column→map
    round-trip (the shape typed metadata columns use), and cryptographic
    hashes — all over one documents scan. DuckDB list_position and Spark
    array_position agree on 1-based/0-for-missing semantics; on an EMPTY
    slice (docs under 2 tokens) Spark's array_join returns '' while
    DuckDB's array_to_string returns NULL, so the oracle coalesces to ''
    — the exposed semantic is Spark's (caught by the adversarial-corpus
    differential test, not the fixtures)."""
    d = Catalog(spark, sf_dir).documents
    toks = F.split("text", " ")
    meta = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.exists(toks, lambda t: t == "the").alias("has_the"),
        F.forall(toks, lambda t: F.length(t) >= 1).alias("all_nonempty"),
        F.array_position(toks, "the").cast("long").alias("pos_the"),
        F.size(F.array_remove(toks, "the")).cast("long").alias("n_non_the"),
        F.size(F.array_union(toks, F.array(F.lit("__sentinel__"))))
        .cast("long")
        .alias("n_with_sentinel"),
        F.array_join(F.slice(toks, 2, 3), "|").alias("mid_slice"),
        F.size(F.flatten(F.array(toks, toks))).cast("long").alias("n_doubled"),
        meta.getItem("lang").alias("lang"),
        meta.getItem("source").alias("source"),
        F.size(F.map_keys(meta)).cast("long").alias("n_keys"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5("text").alias("text_md5"),
    )


@query(
    "scalar_explode_funcs",
    oracle="""
    -- posexplode + re-aggregate round-trip: per-document token counts
    -- with first occurrence position.
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 50
    ),
    pos AS (
      -- zipped parallel UNNESTs: linear, vs quadratic list-carry
      SELECT doc_id,
             UNNEST(generate_series(0, len(toks) - 1))::BIGINT AS pos,
             UNNEST(toks) AS token
      FROM d
    )
    SELECT doc_id, token, COUNT(*)::BIGINT AS n, MIN(pos)::BIGINT AS first_pos
    FROM pos GROUP BY doc_id, token
    """,
)
def scalar_explode_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator expressions: posexplode (which subsumes explode — same
    lateral expansion plus the element index) followed by a re-aggregation
    back to per-token counts and first positions."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .groupBy("doc_id", "token")
        .agg(
            F.count("*").alias("n"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


@query(
    "scalar_json_funcs",
    oracle="""
    -- TRY_CAST everywhere a JSON value meets BIGINT: a $.k holding a
    -- string must degrade to NULL on BOTH engines — Spark's ANSI cast
    -- would otherwise kill the whole job on one bad row (try_cast on
    -- the Spark side mirrors this).
    SELECT event_id,
           CASE WHEN COALESCE(json_valid(props), false)
                THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k_path,
           CASE WHEN COALESCE(json_valid(props), false)
                THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k_typed,
           COALESCE(json_valid(props), false)                     AS is_valid,
           COALESCE(CASE WHEN COALESCE(json_valid(props), false)
                         THEN TRY_CAST(json_extract(props, '$.missing') AS BIGINT) END,
                    -1)                                           AS k_fallback,
           json_object('id', event_id,
                       'k', CASE WHEN COALESCE(json_valid(props), false)
                                 THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT)
                            END)::VARCHAR                         AS packed
    FROM events WHERE event_id < 200
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions (SURVEY §2.8-13, §2.2-1) — the reference's
    JSON-decode-with-fallback (rotterdam_swimming_advice.py:138-141) in
    columnar form: path extraction (get_json_object), typed decode
    (from_json to a struct), validity probe, missing-path fallback
    (coalesce default), and a to_json re-encode round-trip.

    Adversarial-log alignment (engines diverge on degenerate props
    unless stated): is_valid is JSON-validity (try_parse_json, matching
    DuckDB's json_valid — a bare array IS valid JSON even though it has
    no $.k), NULL props is not-valid on both sides (coalesce), DuckDB's
    json_extract ERRORS on malformed input so every oracle access sits
    behind a json_valid CASE, and the re-encode keeps null fields
    (ignoreNullFields=false) because DuckDB's json_object always emits
    them."""
    ev = Catalog(spark, sf_dir).events
    parsed = F.from_json("props", "struct<k:long>")
    return ev.filter(F.col("event_id") < 200).select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_path"),
        parsed["k"].alias("k_typed"),
        F.try_parse_json("props").isNotNull().alias("is_valid"),
        F.coalesce(
            F.get_json_object("props", "$.missing").try_cast("long"), F.lit(-1)
        ).alias("k_fallback"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), parsed["k"].alias("k")),
            {"ignoreNullFields": "false"},
        ).alias("packed"),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           (o_orderkey & 255)::BIGINT       AS low_byte,
           (o_orderkey | 4096)::BIGINT      AS with_flag,
           xor(o_orderkey, o_custkey)::BIGINT AS xored,
           (o_orderkey << 2)::BIGINT        AS shifted_l,
           (o_orderkey >> 3)::BIGINT        AS shifted_r,
           bit_count(o_orderkey)::BIGINT    AS popcount
    FROM orders
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops — the building blocks the SimHash/LSH band extraction
    uses, exposed as a first-class query."""
    o = Catalog(spark, sf_dir).orders
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("long").alias("with_flag"),
        k.bitwiseXOR(c).cast("long").alias("xored"),
        F.shiftleft(k, 2).cast("long").alias("shifted_l"),
        F.shiftright(k, 3).cast("long").alias("shifted_r"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@query(
    "scalar_generators",
    oracle="""
    WITH n AS (SELECT n_nationkey FROM nation WHERE n_nationkey < 5)
    SELECT n_nationkey,
           UNNEST(generate_series(0, n_nationkey))::BIGINT AS i
    FROM n
    """,
)
def scalar_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generation via sequence + explode_outer (lateral expansion)."""
    n = Catalog(spark, sf_dir).nation
    return (
        n.filter(F.col("n_nationkey") < 5)
        .select(
            "n_nationkey",
            F.explode_outer(F.sequence(F.lit(0), F.col("n_nationkey"))).alias("i"),
        )
        .select("n_nationkey", F.col("i").cast("long").alias("i"))
    )


@query(
    "scalar_encode_map_funcs",
    oracle="""
    WITH m AS (
      SELECT n_nationkey, n_name,
             map(['key', 'region'], [n_nationkey::VARCHAR, n_regionkey::VARCHAR]) AS meta
      FROM nation
    )
    SELECT n_nationkey,
           base64(encode(n_name))               AS name_b64,
           hex(encode(n_name))                  AS name_hex,
           octet_length(encode(n_name))::BIGINT AS n_bytes,
           decode(from_base64(base64(encode(n_name)))) AS roundtrip,
           array_to_string(
             list_sort(list_transform(map_entries(meta), e -> e.key || '=' || e.value)),
             ',') AS entries_str,
           array_to_string(
             list_sort(list_transform(
               list_filter(map_entries(meta), e -> e.key = 'region'),
               e -> e.key || ':' || e.value)), ',') AS region_only
    FROM m
    """,
)
def scalar_encode_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encodings over the payload path (utf-8 encode, base64, hex,
    base64 round-trip) plus the second map batch: entry expansion
    (map_entries), per-entry transform, and map_filter — rendered as
    sorted joined strings because the hash compare needs scalar cells."""
    n = Catalog(spark, sf_dir).nation
    raw = F.encode(F.col("n_name"), "utf-8")
    meta = F.create_map(
        F.lit("key"), F.col("n_nationkey").cast("string"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    entries = F.transform(
        F.map_entries(meta), lambda e: F.concat(e["key"], F.lit("="), e["value"])
    )
    region_only = F.transform(
        F.map_entries(F.map_filter(meta, lambda k, v: k == "region")),
        lambda e: F.concat(e["key"], F.lit(":"), e["value"]),
    )
    return n.select(
        "n_nationkey",
        F.base64(raw).alias("name_b64"),
        F.upper(F.hex(raw)).alias("name_hex"),
        F.length(raw).cast("long").alias("n_bytes"),
        F.decode(F.unbase64(F.base64(raw)), "utf-8").alias("roundtrip"),
        F.array_join(F.sort_array(entries), ",").alias("entries_str"),
        F.array_join(F.sort_array(region_only), ",").alias("region_only"),
    )


@query(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_id,
           CASE WHEN COALESCE(json_valid(props), false)
                THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k_long,
           (CASE WHEN COALESCE(json_valid(props), false)
                 THEN json_extract(props, '$.absent') END) IS NULL
             AS missing_is_null,
           COALESCE(NOT json_valid('{' || props), true) AS bad_parse_null,
           CASE WHEN COALESCE(json_valid(props), false)
                THEN json_extract(props, '$')::VARCHAR END AS props_roundtrip
    FROM events
    """,
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface over the semi-structured props column:
    parse_json → binary variant, typed path extraction (variant_get),
    NULL on absent paths, try_parse_json's NULL on malformed input, and
    to_json round-trip (both engines render compact JSON, which is what
    makes the round-trip hash-comparable). VARIANT is the open-ended
    ingest answer when a JSON payload has no stable schema to declare —
    the shredded binary encoding keeps path access columnar-ish instead
    of re-parsing strings per access (which is exactly what
    get_json_object in scalar_json_funcs does on every call).

    The variant is built with try_parse_json, NOT parse_json: parse_json
    RAISES on malformed input, so a single bad payload in a 100 TB log
    would fail the job — try_parse_json degrades that row to NULL, which
    the oracle mirrors with json_valid guards (DuckDB's json_extract
    likewise errors on malformed input)."""
    ev = Catalog(spark, sf_dir).events
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        # try_variant_get, not variant_get: a $.k holding a string is an
        # INVALID_VARIANT_CAST that would fail the job on one bad row
        F.try_variant_get(v, "$.k", "long").alias("k_long"),
        F.variant_get(v, "$.absent", "string").isNull().alias("missing_is_null"),
        F.try_parse_json(F.concat(F.lit("{"), F.col("props"))).isNull().alias(
            "bad_parse_null"
        ),
        F.to_json(v).alias("props_roundtrip"),
    )
