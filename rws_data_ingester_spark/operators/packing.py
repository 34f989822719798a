"""Sequence packing — assembling documents into fixed-token-budget
training sequences (SURVEY.md §2.10 [EXT] surface; the reference has no
analog). The last preprocessing step of an LLM data pipeline: packed
sequences waste no pad tokens, and the packing must be deterministic so
a re-run reproduces the same training order.

Scale design:
- Documents are range-partitioned by doc_id (contiguous id blocks per
  partition), then packed per-partition with a greedy contiguous fill in
  doc_id order inside ``mapInPandas`` (Arrow-batched; the only Python in
  the path runs one cumsum-style scan per partition, never a per-row
  UDF call).
- Sequence ids are ``partition_base + local_index`` where the base is
  derived from the partition's first doc_id — globally unique and
  reproducible WITHOUT any driver-side coordination or
  monotonically_increasing_id (whose values depend on partition count).
- Oversized documents (> budget) become singleton sequences, flagged
  ``truncated`` — the caller decides whether to split or drop.
- Packing is local to a partition, so sequences never span partition
  boundaries: at most one under-filled sequence per partition (the
  tail), a bounded waste of < budget tokens per partition — the price
  of a coordination-free parallel pack, and the same trade every
  distributed packer makes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.catalog import Catalog
from rws_data_ingester_spark.plans.registry import query

PACK_SCHEMA = (
    "seq_id bigint, n_docs bigint, total_tokens bigint, "
    "doc_ids array<bigint>, truncated boolean"
)


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 256,
    partitions: int = 8,
) -> DataFrame:
    """Greedy contiguous packing of (id, token_count) rows into sequences
    of at most ``budget`` tokens, deterministic in ``id_col`` order
    within range partitions."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(id_col, ignore_index=True)
        base = int(pdf[id_col].iloc[0]) << 20  # partition-local seq ids,
        # globally unique: partitions hold disjoint contiguous id ranges.
        seqs, cur_ids, cur_tok = [], [], 0
        for did, ntok in zip(pdf[id_col], pdf[tokens_col]):
            did, ntok = int(did), int(ntok)
            if cur_ids and cur_tok + ntok > budget:
                seqs.append((cur_ids, cur_tok))
                cur_ids, cur_tok = [], 0
            cur_ids.append(did)
            cur_tok += ntok
        if cur_ids:
            seqs.append((cur_ids, cur_tok))
        yield pd.DataFrame(
            {
                "seq_id": [base + i for i in range(len(seqs))],
                "n_docs": [len(ids) for ids, _ in seqs],
                "total_tokens": [t for _, t in seqs],
                "doc_ids": [ids for ids, _ in seqs],
                "truncated": [t > budget for _, t in seqs],
            }
        )

    sized = docs.select(id_col, tokens_col).repartitionByRange(
        partitions, F.col(id_col)
    )
    return sized.mapInPandas(pack, schema=PACK_SCHEMA)


def _sized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens) for the documents table — whitespace token
    counts, shared by the detail and audit forms below. NULL text packs
    as a 0-token member (coalesce): the kernel's int(ntok) dies on the
    NaN a NULL becomes in pandas, and dropping the row would break the
    every-doc-packed-exactly-once invariant."""
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.coalesce(F.size(F.split("text", " ")), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )


def pack_documents_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence detail of packing the documents table into 256-token
    training sequences (whitespace token counts) — the full operator
    surface, exercised by tests/test_packing.py (exactly-once coverage,
    budget respect, determinism, pure-Python greedy replay). The
    sequence BOUNDARIES depend on the range-partitioner's sampled split
    points, so this detail frame is not SQL-oracle-expressible; the
    registered query below reduces it to partition-layout-INDEPENDENT
    conservation invariants that DuckDB can recompute exactly."""
    out = pack_sequences(_sized_documents(spark, sf_dir), budget=256)
    # hash-comparable rendering: array column → csv string
    return out.select(
        "seq_id",
        "n_docs",
        "total_tokens",
        F.array_join(F.transform("doc_ids", lambda x: x.cast("string")), ",").alias(
            "doc_ids_csv"
        ),
        "truncated",
    )


@query(
    "pipeline_pack_sequences",
    # Token-conservation oracle (VERDICT r5, task 6): the greedy pack's
    # SEQUENCE boundaries are range-partition-dependent, but its
    # conservation laws are not — every doc packed exactly once, token
    # totals preserved, and truncated sequences are exactly the singleton
    # over-budget docs (the greedy flushes before appending an oversized
    # doc and flushes again after, so an oversized doc can never share a
    # sequence). DuckDB recomputes all five invariants from the raw
    # documents table; Spark computes them FROM THE PACKED OUTPUT, so a
    # lost/duplicated doc, token corruption, or a mis-flagged truncation
    # in the packing kernel breaks the hash.
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   CAST(CASE WHEN text IS NULL THEN 0
                             ELSE len(string_split(text, ' ')) END AS BIGINT)
                       AS n_tokens
            FROM documents
        )
        SELECT count(*) AS n_docs_packed,
               count(DISTINCT doc_id) AS n_distinct_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               count(*) FILTER (WHERE n_tokens > 256) AS n_truncated_seqs,
               CAST(coalesce(sum(n_tokens) FILTER (WHERE n_tokens > 256), 0)
                    AS BIGINT) AS truncated_tokens
        FROM toks
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conservation audit of the 256-token sequence pack, computed from
    the packed output in ONE pass: posexplode the raw member-id arrays
    (long members — no csv round-trip), count members (= sum of n_docs),
    count distinct members (exactly-once), and take each sequence's
    totals at pos 0 only (every sequence has >=1 member by
    construction). Oracle-paired — see the SQL above for why these five
    numbers are partition-layout-independent while the per-sequence
    detail (``pack_documents_detail``) is not."""
    packed = pack_sequences(_sized_documents(spark, sf_dir), budget=256)
    ex = packed.select(
        "total_tokens",
        "truncated",
        F.posexplode("doc_ids").alias("pos", "member"),
    )
    first = F.col("pos") == 0
    return ex.agg(
        F.count("*").alias("n_docs_packed"),
        F.countDistinct("member").alias("n_distinct_docs"),
        F.sum(F.when(first, F.col("total_tokens"))).alias("total_tokens"),
        F.count_if(first & F.col("truncated")).alias("n_truncated_seqs"),
        F.coalesce(
            F.sum(F.when(first & F.col("truncated"), F.col("total_tokens"))),
            F.lit(0).cast("long"),
        ).alias("truncated_tokens"),
    )
