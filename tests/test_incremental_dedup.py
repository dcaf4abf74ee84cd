"""Tests for incremental dedup: dedup_ingest (exact, through the lake
MERGE) and jaccard_against_corpus (one-sided near-dup for a new batch)."""

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake.table import LakeTable
from techtalk_data_pipeline_snowpark_spark.operators.dedup import (
    dedup_ingest,
    jaccard_against_corpus,
)

SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("batch", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _batches():
    """Three batches with planted within- and cross-batch duplicates."""
    return [
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],  # 0,2 dup
        [(10, "alpha beta"), (11, "epsilon zeta")],  # 10 dups batch 0
        [(20, "epsilon zeta"), (21, "eta theta"), (22, "gamma delta")],
    ]


def _brute_winners():
    """First-seen (batch, id) representative per content, as the oracle
    rank-by-(batch, id) definition computes it."""
    seen = {}
    for b, rows in enumerate(_batches()):
        for i, txt in sorted(rows):
            seen.setdefault(_sha(txt), (b, i, txt))
    return {(i, b, t) for (b, i, t) in seen.values()}


def test_dedup_ingest_multi_batch_first_seen_wins(spark, tmp_table_root):
    t = LakeTable.create(
        spark, tmp_table_root, SCHEMA, key_cols=["content_hash"], num_buckets=4
    )
    for b, rows in enumerate(_batches()):
        batch = spark.createDataFrame(
            [(i, b, txt) for i, txt in rows], "doc_id long, batch long, text string"
        )
        dedup_ingest(t, batch, "text", "doc_id")
    got = {
        (r["doc_id"], r["batch"], r["text"])
        for r in t.read().select("doc_id", "batch", "text").collect()
    }
    assert got == _brute_winners()
    # hashes stored match the content
    for r in t.read().collect():
        assert r["content_hash"] == _sha(r["text"])


def test_dedup_ingest_idempotent_redelivery(spark, tmp_table_root):
    t = LakeTable.create(
        spark, tmp_table_root, SCHEMA, key_cols=["content_hash"], num_buckets=4
    )
    batch = spark.createDataFrame(
        [(0, 0, "alpha beta"), (1, 0, "gamma delta")],
        "doc_id long, batch long, text string",
    )
    dedup_ingest(t, batch, "text", "doc_id")
    before = {tuple(r) for r in t.read().collect()}
    dedup_ingest(t, batch, "text", "doc_id")  # crash-redelivery of the batch
    after = {tuple(r) for r in t.read().collect()}
    assert after == before  # insert-only on hash: exact no-op


def test_dedup_ingest_duplicate_id_raises(spark, tmp_table_root):
    import pytest

    t = LakeTable.create(
        spark, tmp_table_root, SCHEMA, key_cols=["content_hash"], num_buckets=4
    )
    # a repeated (id, content) pair violates the id-uniqueness contract:
    # the winner set would carry the key twice — must raise, not insert
    batch = spark.createDataFrame(
        [(1, 0, "same text"), (1, 0, "same text")],
        "doc_id long, batch long, text string",
    )
    with pytest.raises(ValueError, match="not unique"):
        dedup_ingest(t, batch, "text", "doc_id")
    assert t.read().count() == 0  # nothing committed


def test_dedup_ingest_within_batch_min_id_wins(spark, tmp_table_root):
    t = LakeTable.create(
        spark, tmp_table_root, SCHEMA, key_cols=["content_hash"], num_buckets=4
    )
    batch = spark.createDataFrame(
        [(7, 0, "same text"), (3, 0, "same text"), (9, 0, "same text")],
        "doc_id long, batch long, text string",
    )
    dedup_ingest(t, batch, "text", "doc_id")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 3


def test_dedup_ingest_null_text_not_dropped(spark, tmp_table_root):
    t = LakeTable.create(
        spark, tmp_table_root, SCHEMA, key_cols=["content_hash"], num_buckets=4
    )
    # NULL text must neither vanish nor poison the merge key: it hashes as
    # the empty string, so NULL and '' docs dedup together (first id wins)
    batch = spark.createDataFrame(
        [(5, 0, None), (2, 0, ""), (9, 0, "real text")],
        "doc_id long, batch long, text string",
    )
    dedup_ingest(t, batch, "text", "doc_id")
    rows = {r["doc_id"] for r in t.read().collect()}
    assert rows == {2, 9}  # 2 wins the (null ≡ '') group; 5 not silently lost
    assert t.read().where(F.col("content_hash").isNull()).count() == 0


# ------------------------------------------------- jaccard_against_corpus


def _shingles(text, k=3):
    toks = text.lower().strip().split()
    if len(toks) <= k - 1:
        return {" ".join(toks[:k])}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - (k - 1))}


def _brute_one_sided(new_rows, corpus_rows, threshold, cap, block_tokens=2, k=3):
    def blk(t):
        return " ".join(t.lower().strip().split()[:block_tokens])

    from collections import Counter

    corpus_blocks = Counter(blk(t) for _, t in corpus_rows)
    out = set()
    for ni, nt in new_rows:
        for ci, ct in corpus_rows:
            if ni == ci or blk(nt) != blk(ct) or corpus_blocks[blk(ct)] > cap:
                continue
            a, b = _shingles(nt, k), _shingles(ct, k)
            j = len(a & b) / len(a | b) if a | b else 0.0
            if j >= threshold:
                out.add((ni, ci, round(j, 6)))
    return out


def test_one_sided_jaccard_brute_parity(spark):
    corpus_rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "the quick brown fox jumps over the lazy cat"),
        (102, "completely different text about spark engines"),
        (103, "the quick red fox sat on the mat"),
    ]
    new_rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "unrelated new document with fresh content entirely"),
        (2, "the quick brown fox jumps over the lazy cat"),
    ]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    got = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in jaccard_against_corpus(new, corpus, "doc_id", "text", 0.3).collect()
    }
    assert got == _brute_one_sided(new_rows, corpus_rows, 0.3, 64)
    assert got  # the fixture must actually produce pairs
    # one-sided: every pair is (new, corpus), never corpus-vs-corpus —
    # 101 is near-identical to 100 but must not appear as a new_id
    assert all(a in {0, 1, 2} and b in {100, 101, 102, 103} for a, b, _ in got)


def test_one_sided_jaccard_corpus_cap(spark):
    # 5 corpus docs share one block; cap 4 excludes the whole block
    corpus_rows = [(100 + i, f"shared block filler {i}") for i in range(5)]
    new_rows = [(0, "shared block filler 0")]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    capped = jaccard_against_corpus(
        new, corpus, "doc_id", "text", 0.1, max_block_size=4
    )
    assert capped.count() == 0
    uncapped = jaccard_against_corpus(
        new, corpus, "doc_id", "text", 0.1, max_block_size=64
    )
    assert uncapped.count() == len(
        _brute_one_sided(new_rows, corpus_rows, 0.1, 64)
    ) > 0


def test_one_sided_jaccard_excludes_empty_docs(spark):
    # empty/whitespace-only/NULL docs degenerate to shingle set [""] and
    # would pair with every other empty doc at jaccard 1.0 — excluded
    new = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "real shared text here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(100, ""), (101, "  "), (102, "real shared text here today")],
        "doc_id long, text string",
    )
    got = {
        (r["new_id"], r["corpus_id"])
        for r in jaccard_against_corpus(new, corpus, "doc_id", "text", 0.3).collect()
    }
    assert got == {(3, 102)}  # only the real near-dup; no empty-empty pairs


def test_one_sided_jaccard_no_cartesian_plan(spark):
    new = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(100, "a b c d"), (101, "x y z")], "doc_id long, text string"
    )
    plan = (
        jaccard_against_corpus(new, corpus, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
