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


@query("pipeline_pack_sequences", oracle=None)  # per-partition greedy → rows-only
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the documents table into 256-token training sequences
    (whitespace token counts). Rows-only: the packing is defined per
    range partition; tests/test_packing.py pins the invariants (every
    doc packed exactly once, no sequence over budget unless a singleton
    oversized doc, determinism across runs) and replays the exact greedy
    algorithm in pure Python per partition."""
    d = Catalog(spark, sf_dir).documents
    # NULL text packs as a 0-token member (coalesce): the kernel's
    # int(ntok) dies on the NaN a NULL becomes in pandas, and dropping
    # the row would break the every-doc-packed-exactly-once invariant.
    sized = d.select(
        "doc_id",
        F.coalesce(F.size(F.split("text", " ")), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    out = pack_sequences(sized, budget=256)
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
