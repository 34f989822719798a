"""Tests for the PQ ANN tier, contiguous-id assignment, BPE training,
temperature mixing, and small-file compaction (round-2 late additions).
Oracle parity for the oracle-paired ones runs in test_oracle_parity.py;
these tests pin the *semantic* properties the oracle can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rws_data_ingester_spark.plans import REGISTRY
from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# PQ similarity search
# --------------------------------------------------------------------------
def test_pq_recall_vs_exact(spark):
    """ADC shortlist + exact re-rank must recover most of the true top-5
    neighbor set (the exact query is the oracle-checked brute-force path)."""
    exact = REGISTRY["simsearch_topk_exact"].fn(spark, SF_DIR).collect()
    pq = REGISTRY["simsearch_topk_pq"].fn(spark, SF_DIR).collect()
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict[int, set[int]] = {}
    for r in pq:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(truth)
    hits = sum(len(truth[q] & got[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    assert hits / total >= 0.8, f"PQ recall {hits}/{total} below 0.8"


def test_pq_codes_shape(spark):
    """Every corpus vector is coded as m=8 codes, each in [0, 16)."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.operators.vectors import pq_encode, pq_train

    e = Catalog(spark, SF_DIR).embeddings
    cb = pq_train(e)
    assert cb.shape == (8, 256, 8)
    codes = pq_encode(e, cb)
    bad = codes.filter(
        (F.size("codes") != 8)
        | F.exists("codes", lambda c: (c < 0) | (c >= 256))
    ).count()
    assert bad == 0
    assert codes.count() == e.count()


def test_pq_all_zero_embedding_yields_valid_codes(spark):
    """An all-zero embedding has L2 norm 0; without the clamp the
    normalization produced NaN subvectors → NaN ADC distances → garbage
    argmin codes (ADVICE round 2). The clamp maps it to the zero vector,
    which encodes to ordinary nearest-centroid codes."""
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.operators.vectors import pq_encode, pq_train

    e = Catalog(spark, SF_DIR).embeddings
    zero = spark.createDataFrame(
        [(999_999, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    corpus = e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionByName(zero)
    cb = pq_train(corpus)
    assert not __import__("numpy").isnan(cb).any()
    row = pq_encode(corpus, cb).filter(F.col("vec_id") == 999_999).collect()
    assert len(row) == 1
    assert all(0 <= c < 256 for c in row[0]["codes"]), row[0]["codes"]


# --------------------------------------------------------------------------
# Contiguous id assignment
# --------------------------------------------------------------------------
def test_ids_no_global_single_partition_sort(spark):
    """The plan must not contain a partition-less Window (the whole point
    of the bucketed two-pass shape): every Window sort is keyed by the
    bucket, and the only unpartitioned window runs over the 16-row
    offsets frame, never the data."""
    df = REGISTRY["ids_assign_contiguous"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "_bucket" not in line:
            # allowed: the offsets prefix-sum window over the tiny
            # per-bucket counts frame (carries _n / _offset columns)
            assert "_offset" in line or "_n#" in line, f"unexpected global window: {line}"


def test_ids_survive_skewed_keys(spark):
    """Duplicate-free but heavily skewed key distribution (all keys in a
    narrow band plus outliers) still yields exact 0..n-1 dense ids."""
    from rws_data_ingester_spark.operators.ids import assign_contiguous_ids

    keys = list(range(100)) + [10_000, 20_000, -5]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = assign_contiguous_ids(df, "k").collect()
    by_key = sorted((r["k"], r["global_id"]) for r in out)
    assert [g for _, g in by_key] == list(range(len(keys)))


# --------------------------------------------------------------------------
# BPE training
# --------------------------------------------------------------------------
def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python reference BPE (Sennrich-style greedy merges, ties
    broken lexicographically) to pin the Spark implementation against."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, freq in word_freqs.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + freq
        if not pairs:
            break
        maxf = max(pairs.values())
        a, b = min(p for p, f in pairs.items() if f == maxf)
        merges.append((rank, a, b, a + b, maxf))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_matches_reference_implementation(spark):
    from rws_data_ingester_spark.operators.tokenizer import bpe_train

    corpus = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    word_freqs: dict[str, int] = {}
    for line in corpus:
        for w in line.split():
            word_freqs[w] = word_freqs.get(w, 0) + 1
    expected = _ref_bpe(word_freqs, 6)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in bpe_train(docs, 6).orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_merge_pair_preserves_empty_symbol_arrays(spark):
    """array_join([]) -> "" -> split("", " ") -> [""]; the guard must map
    an empty symbols array back to [], not to a single empty-string
    symbol (a shape change vs the old aggregate-accumulator form)."""
    from pyspark.sql import functions as F

    from rws_data_ingester_spark.operators.tokenizer import _merge_pair

    df = spark.createDataFrame(
        [(["a", "b", "c"],), ([],)], "symbols array<string>"
    ).select(_merge_pair(F.col("symbols"), "a", "b").alias("out"))
    rows = sorted((r["out"] for r in df.collect()), key=len)
    assert rows == [[], ["ab", "c"]]


def test_bpe_deterministic_across_runs(spark):
    q = REGISTRY["bpe_vocab_train"]
    a = [tuple(r) for r in q.fn(spark, SF_DIR).orderBy("merge_rank").collect()]
    b = [tuple(r) for r in q.fn(spark, SF_DIR).orderBy("merge_rank").collect()]
    assert a == b and len(a) > 0


# --------------------------------------------------------------------------
# Temperature mixing
# --------------------------------------------------------------------------
def test_temperature_mixing_upweights_small_sources(spark):
    """alpha<1 means smaller sources get HIGHER sampling rates — the rate
    column must be anti-monotonic in source size (ties allowed at the
    p=1 clamp)."""
    rows = REGISTRY["pipeline_mix_temperature"].fn(spark, SF_DIR).collect()
    by_size = sorted(rows, key=lambda r: r["n_docs"])
    rates = [r["samp_rate"] for r in by_size]
    assert all(a >= b for a, b in zip(rates, rates[1:])), rates
    for r in rows:
        assert 0 < r["n_sampled"] <= r["n_docs"]


# --------------------------------------------------------------------------
# Compaction
# --------------------------------------------------------------------------
def test_compaction_reduces_files_preserves_rows(spark):
    from rws_data_ingester_spark.operators.layout import compaction_phase_audit

    # fixture-scale detail: exactly 64 fragment files, strictly reduced
    phases = {
        r["phase"]: r for r in compaction_phase_audit(spark, SF_DIR).collect()
    }
    assert phases["fragmented"]["n_files"] == 64
    assert phases["compacted"]["n_files"] < phases["fragmented"]["n_files"]
    assert phases["compacted"]["n_rows"] == phases["fragmented"]["n_rows"]

    # registered oracle-stable form
    [row] = REGISTRY["sink_compaction"].fn(spark, SF_DIR).collect()
    assert row["compaction_not_worse"]
    assert row["n_rows_compacted"] == row["n_rows_fragmented"]
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert row["n_rows_fragmented"] == n_events


# --------------------------------------------------------------------------
# Centroids
# --------------------------------------------------------------------------
def test_centroids_cover_every_label_and_dim(spark):
    from rws_data_ingester_spark.catalog import Catalog

    out = REGISTRY["embedding_centroids"].fn(spark, SF_DIR)
    e = Catalog(spark, SF_DIR).embeddings
    n_labels = e.select("label").distinct().count()
    dims = e.select(F.size("embedding").alias("d")).distinct().collect()
    assert len(dims) == 1
    assert out.count() == n_labels * dims[0]["d"]


# --------------------------------------------------------------------------
# Chunking / span corruption / split
# --------------------------------------------------------------------------
def test_chunk_overlap_covers_every_token(spark):
    from rws_data_ingester_spark.catalog import Catalog

    d = Catalog(spark, SF_DIR).documents
    docs = {r["doc_id"]: r["text"].split(" ") for r in d.collect()}
    out = REGISTRY["text_chunk_overlap"].fn(spark, SF_DIR).collect()
    from collections import defaultdict

    by_doc = defaultdict(list)
    for r in out:
        by_doc[r["doc_id"]].append(r)
    for doc_id, toks in docs.items():
        chunks = sorted(by_doc[doc_id], key=lambda r: r["start_tok"])
        assert chunks[0]["start_tok"] == 0
        covered = 0
        for ch in chunks:
            assert ch["start_tok"] <= covered  # no gap between chunks
            covered = max(covered, ch["start_tok"] + ch["n_chunk_toks"])
            got = ch["chunk_text"].split(" ")
            assert got == toks[ch["start_tok"] : ch["start_tok"] + 100]
        assert covered == len(toks)  # full coverage


def test_span_corruption_reconstructs_original(spark):
    from rws_data_ingester_spark.catalog import Catalog

    d = Catalog(spark, SF_DIR).documents
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    out = REGISTRY["text_span_corruption"].fn(spark, SF_DIR).collect()
    assert len(out) == len(texts)
    total_spans = total_masked = 0
    for r in out:
        total_masked += r["n_masked_spans"]
        total_spans += -(-r["n_tokens"] // 3)
        # splice targets back into corrupted → original
        targets: dict[str, list[str]] = {}
        cur = None
        for tok in (r["target_text"].split(" ") if r["target_text"] else []):
            if tok.startswith("<extra_id_"):
                cur = tok
                targets[cur] = []
            else:
                targets[cur].append(tok)
        rebuilt: list[str] = []
        for tok in r["corrupted_text"].split(" "):
            if tok.startswith("<extra_id_"):
                rebuilt.extend(targets[tok])
            else:
                rebuilt.append(tok)
        assert " ".join(rebuilt) == texts[r["doc_id"]], r["doc_id"]
    # expected mask rate 2/16 = 12.5%; allow a generous sampling envelope
    rate = total_masked / total_spans
    assert 0.08 < rate < 0.18, rate


def test_train_val_test_partitions_corpus(spark):
    from rws_data_ingester_spark.catalog import Catalog

    d = Catalog(spark, SF_DIR).documents
    rows = REGISTRY["pipeline_train_val_test"].fn(spark, SF_DIR).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    total = d.count()
    assert sum(by_split.values()) == total  # disjoint + complete
    assert set(by_split) == {"train", "val", "test"}
    assert 0.7 < by_split["train"] / total < 0.9
    assert by_split["val"] / total < 0.2 and by_split["test"] / total < 0.2
