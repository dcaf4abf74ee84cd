"""Tests for operators/vocab.py — corpus vocabulary + coverage scoring."""

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.vocab import (
    top_vocabulary,
    vocab_coverage,
)

ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "a cat and a dog"),
    (3, "   "),  # whitespace-only → zero tokens
    (4, "zebra quokka axolotl"),  # all out-of-vocab at small V
]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _brute_vocab(size):
    from collections import Counter

    c = Counter(t for _, txt in ROWS for t in txt.lower().strip().split())
    return [t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:size]]


def _brute_coverage(size):
    vocab = set(_brute_vocab(size))
    out = {}
    for i, txt in ROWS:
        toks = txt.lower().strip().split()
        iv = sum(1 for t in toks if t in vocab)
        out[i] = (len(toks), iv, iv / len(toks) if toks else None)
    return out


def test_top_vocabulary_deterministic_cut(spark):
    got = [(r["token"], r["cnt"]) for r in top_vocabulary(_df(spark), "text", 4).collect()]
    # counts: the=3, a=2, cat=2, dog=2, sat=2, rest=1; tie at cnt=2 cut by
    # token asc → a, cat, dog in; sat out
    assert got == [("the", 3), ("a", 2), ("cat", 2), ("dog", 2)]


def test_vocab_coverage_brute_parity(spark):
    for size in (2, 4, 8):
        got = {
            r["doc_id"]: (r["n_tokens"], r["in_vocab_tokens"], r["coverage"])
            for r in vocab_coverage(_df(spark), "doc_id", "text", size).collect()
        }
        want = _brute_coverage(size)
        assert set(got) == set(want)
        for k in want:
            n, iv, cov = want[k]
            assert got[k][0] == n and got[k][1] == iv
            if cov is None:
                assert got[k][2] is None
            else:
                assert got[k][2] == pytest.approx(cov, abs=0)


def test_vocab_coverage_zero_and_oov_docs(spark):
    got = {
        r["doc_id"]: r
        for r in vocab_coverage(_df(spark), "doc_id", "text", 2).collect()
    }
    assert got[3]["n_tokens"] == 0 and got[3]["coverage"] is None
    assert got[4]["in_vocab_tokens"] == 0 and got[4]["coverage"] == 0.0
    assert len(got) == len(ROWS)  # every doc scored, OOV/empty included


def test_vocab_coverage_frozen_vocab(spark):
    frozen = spark.createDataFrame([("cat",), ("dog",)], "token string")
    got = {
        r["doc_id"]: r["in_vocab_tokens"]
        for r in vocab_coverage(_df(spark), "doc_id", "text", vocab=frozen).collect()
    }
    assert got == {0: 1, 1: 1, 2: 2, 3: 0, 4: 0}


def test_vocab_coverage_broadcast_semi_join_plan(spark):
    plan = (
        vocab_coverage(_df(spark).repartition(4), "doc_id", "text", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_top_vocabulary_validation(spark):
    with pytest.raises(ValueError):
        top_vocabulary(_df(spark), "text", 0)
