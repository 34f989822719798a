"""Differential check of every documents-only oracle pair on a corpus
with MULTI-HUNDRED-KB single documents — the "one 10 MB web page"
hazard class that is a certainty at 100 TB corpus scale.

What this class catches (all found by the initial multi-MB probe):

- Accidentally-quadratic oracle SQL. The naive DuckDB form "carry the
  token list through an UNNEST(generate_series(...)) and slice per
  output row" materializes the full list per row: the chunking /
  contamination / paragraph-dedup oracles each burned >2 minutes (one
  >8 minutes at 10 GB RSS) on a 2.4 MB document while the Spark side
  finished in <1 s. All five list-carrying oracles were rewritten to
  the linear zipped-parallel-UNNEST + LEAD/GROUP BY form; this suite
  keeps them (and the Spark plans) honest on big documents forever.
- Engine blowups on a 1 MB whitespace-free token ("minified JS" shape)
  or a two-char run repeated 500k times (pathological for regex /
  run-length logic).

Documents here are ~300 KB so the suite stays CI-sized; the standalone
probe verified the same queries at 2.4 MB. Values, not just survival:
the driver's own multiset compare runs on every pair.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import rows_to_multiset
from tests.test_differential_docs import _documents_only_pairs

_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur",
]


def _big_docs():
    rng = random.Random(20260814)
    prose = " ".join(rng.choice(_WORDS) for _ in range(50_000))  # ~300 KB
    no_ws = "x" * 300_000          # one 300 KB whitespace-free token
    runny = "ab" * 150_000         # two-char run, 300 KB
    # 21 words/paragraph, NOT 20: the 20-word corpus lands chars/tokens
    # exactly on a ROUND(x, 4) half-way tie (6.07145), where Spark's
    # BigDecimal HALF_UP and DuckDB's C-double rounding legitimately
    # disagree — the documented off-grid-decimal class, avoided in
    # fixtures rather than "fixed" in queries.
    para = " ".join(               # heavy paragraph-level duplication
        " ".join(rng.choice(_WORDS) for _ in range(21))
        for _ in range(2_000)
    )
    return [
        (0, prose, "en", "web"),
        (1, no_ws, "en", "web"),
        (2, runny, "en", "web"),
        (3, para, "en", "books"),
        # a benchmark-side doc (doc_id < 10) sharing grams with doc 0's
        # prose pool so the contamination screen has hits to count
        (4, " ".join(rng.choice(_WORDS) for _ in range(200)), "en", "wiki"),
        # corpus-side docs (>= 10) for the contamination screen
        (11, " ".join(rng.choice(_WORDS) for _ in range(5_000)), "en", "web"),
        (12, "tiny normal document with a few words", "en", "wiki"),
        # NULL text rides along so the rows-only tier proves the
        # NULL-payload contract at big-doc scale too
        (13, None, "en", "web"),
    ]


@pytest.fixture(scope="module")
def bigdoc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bigdoc")
    rows = [
        (i, text, lang, source, len(text) if text is not None else None)
        for (i, text, lang, source) in _big_docs()
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(2).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", _documents_only_pairs())
def test_documents_only_oracle_pair_on_big_docs(spark, bigdoc_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, bigdoc_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{bigdoc_dir}/documents.parquet/*.parquet')"
    )
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
    if sm != dm:
        only_s = {k: c for k, c in sm.items() if dm.get(k) != c}
        only_d = {k: c for k, c in dm.items() if sm.get(k) != c}
        raise AssertionError(
            f"{name}: value mismatch on big-doc corpus; "
            f"spark-only sample {list(only_s.items())[:3]}; "
            f"duck-only sample {list(only_d.items())[:3]}"
        )


# Rows-only documents queries: survival + determinism class on the same
# big-doc corpus. These caught three O(n²)-per-row constructs the oracle
# pairs could not see (they are oracle-less): the BPE merge accumulator
# (array-copy per element), the fingerprint's per-element re-read of a
# large outer column through an interpreted higher-order function
# (UnsafeRow.getBinary copies the whole payload per element), and the
# training funnel's bare split() re-evaluated per contamination gram.
DOCS_ROWS_ONLY = [
    "dedup_jaccard_pairs", "dedup_minhash_candidates", "dedup_simhash",
    "text_fingerprint", "text_span_corruption", "bpe_vocab_train",
    "dedup_clusters", "pipeline_near_dedup_remove",
    # oracle-paired since round 6, kept here so its mapInPandas kernel
    # still gets the big-doc survival+determinism run
    "pipeline_pack_sequences",
    "pipeline_quality_classifier", "pipeline_training_data",
    "multimodal_features", "multimodal_resize", "dedup_incremental_index",
    "sample_weighted_reservoir",
]


@pytest.mark.parametrize("name", DOCS_ROWS_ONLY)
def test_rows_only_docs_query_survives_big_docs(spark, bigdoc_dir, name):
    REGISTRY[name].fn(spark, bigdoc_dir).collect()
