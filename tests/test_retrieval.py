"""Tests for operators/retrieval.py — TF-IDF top terms and BM25 search."""

import math

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.retrieval import (
    _bm25_ranked,
    _tfidf_ranked,
    bm25_topk,
    doc_term_freqs,
    rrf_fuse,
    tfidf_top_terms,
)

CORPUS = [
    (0, "spark merge window spark spark"),
    (1, "customer vector merge"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark spark spark spark spark spark spark spark"),
    (4, "window window vector"),
    (5, "  Mixed CASE   Spark  merge "),
    (6, ""),
    (7, "unique solitary tokens only here"),
]


def _df(spark, parts=1):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"]).repartition(parts)


def _toks(text):
    return [t for t in text.strip().lower().split() if t]


def _brute_tf(corpus):
    """{(doc, term): tf}, {doc: dl}, {term: df}, n."""
    tf, dl = {}, {}
    for i, text in corpus:
        toks = _toks(text)
        dl[i] = len(toks)
        for t in toks:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    dfreq = {}
    for (_, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    return tf, dl, dfreq, len(corpus)


def _brute_tfidf_top(corpus, top_n):
    tf, _, dfreq, n = _brute_tf(corpus)
    scored = [
        (i, t, round(c * (math.log((n + 1.0) / (dfreq[t] + 1.0)) + 1.0), 6))
        for (i, t), c in tf.items()
    ]
    out = []
    for doc in {i for i, _, _ in scored}:
        rows = sorted(
            [r for r in scored if r[0] == doc], key=lambda r: (-r[2], r[1])
        )
        out += [(i, t, s, rk + 1) for rk, (i, t, s) in enumerate(rows[:top_n])]
    return set(out)


def _brute_bm25(corpus, query, k, k1=1.2, b=0.75):
    tf, dl, dfreq, n = _brute_tf(corpus)
    terms = sorted({t for t in _toks(query)})
    avgdl = sum(dl.values()) / len(dl)
    scores = {}
    for (i, t), c in tf.items():
        if t not in terms:
            continue
        idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
        scores[i] = scores.get(i, 0.0) + idf * (c * (k1 + 1.0)) / (
            c + k1 * (1.0 - b + b * dl[i] / avgdl)
        )
    ranked = sorted(((round(s, 6), i) for i, s in scores.items()),
                    key=lambda r: (-r[0], r[1]))
    return [(i, s, rk + 1) for rk, (s, i) in enumerate(ranked[:k])]


# ------------------------------------------------------- doc_term_freqs

def test_doc_term_freqs_brute_parity(spark):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_term_freqs(_df(spark, 5), "doc_id", "text").collect()
    }
    tf, dl, _, _ = _brute_tf(CORPUS)
    assert got == {(i, t): (c, dl[i]) for (i, t), c in tf.items()}


# ------------------------------------------------------ tfidf_top_terms

@pytest.mark.parametrize("parts", [1, 7])
def test_tfidf_brute_parity_partitioning_invariant(spark, parts):
    got = {
        (r["doc_id"], r["term"], r["tfidf"], r["rank"])
        for r in tfidf_top_terms(_df(spark, parts), "doc_id", "text", 3).collect()
    }
    assert got == _brute_tfidf_top(CORPUS, 3)


def test_tfidf_rank_tiebreak_is_term_asc(spark):
    # doc 7: five singleton terms, identical tf and df → identical score;
    # ranks must follow term order alphabetically.
    out = (
        tfidf_top_terms(_df(spark), "doc_id", "text", 5)
        .where(F.col("doc_id") == 7)
        .orderBy("rank")
        .collect()
    )
    assert [r["term"] for r in out] == ["here", "only", "solitary", "tokens", "unique"]
    assert len({r["tfidf"] for r in out}) == 1


def test_tfidf_empty_doc_emits_nothing_and_validation(spark):
    out = tfidf_top_terms(_df(spark), "doc_id", "text", 3)
    assert out.where(F.col("doc_id") == 6).count() == 0
    with pytest.raises(ValueError, match="top_n"):
        tfidf_top_terms(_df(spark), "doc_id", "text", 0)


# ------------------------------------------------------------ bm25_topk

@pytest.mark.parametrize("parts", [1, 7])
def test_bm25_brute_parity(spark, parts):
    got = [
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(_df(spark, parts), "Spark  MERGE", "doc_id", "text", k=5)
        .orderBy("rank")
        .collect()
    ]
    assert got == _brute_bm25(CORPUS, "spark merge", 5)


def test_bm25_term_saturation_beats_raw_count(spark):
    # doc 3 is 8× "spark" (dl 8); doc 0 has 3× "spark" in dl 5 — BM25's
    # tf saturation + length normalization must still rank doc 3 first
    # on the single-term query, but by far less than 8/3.
    out = bm25_topk(_df(spark), "spark", "doc_id", "text", k=2).collect()
    by_id = {r["doc_id"]: r["score"] for r in out}
    assert set(by_id) == {0, 3}
    assert by_id[3] > by_id[0]
    assert by_id[3] / by_id[0] < 1.5


def test_bm25_no_match_docs_absent_and_k_cut(spark):
    out = bm25_topk(_df(spark), "vector", "doc_id", "text", k=10).collect()
    assert {r["doc_id"] for r in out} == {1, 4}  # only docs containing it
    assert bm25_topk(_df(spark), "spark", "doc_id", "text", k=1).count() == 1


def test_bm25_validation(spark):
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(_df(spark), "spark", "doc_id", "text", k=0)
    with pytest.raises(ValueError, match="query"):
        bm25_topk(_df(spark), "   ", "doc_id", "text")


# ------------------------------------------------------------- plans

def test_bm25_plan_takeordered_and_broadcasts(spark):
    # plan shape is asserted on the lazy frame (bm25_topk itself eagerly
    # checkpoints ≤ k rows and releases the tf barrier)
    ranked, tf = _bm25_ranked(
        _df(spark, 7), ["merge", "spark", "window"], "doc_id", "text", 5, 1.2, 0.75
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    tf.unpersist()
    # global cut is a map-side partial top-k, not a full sort
    assert "TakeOrderedAndProject" in plan
    # df-counts and corpus stats ride broadcast joins; the corpus side
    # never shuffles for them
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 2


def test_tfidf_plan_shape(spark):
    ranked, tf = _tfidf_ranked(_df(spark, 7), "doc_id", "text", 3)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    tf.unpersist()
    # per-doc ranking window partitions by doc_id with the rank-limit
    # pushed map-side (Partial WindowGroupLimit before the exchange) —
    # no global ordering anywhere
    assert "WindowGroupLimit" in plan
    assert "hashpartitioning(doc_id" in plan
    # the only single-partition exchange is the one-row corpus count
    # feeding the broadcast scalar side
    assert plan.count("Exchange SinglePartition") <= 1
    # the persisted tf barrier is in the plan (the explode+shuffle does
    # not run once per consumer)
    assert "InMemoryTableScan" in plan


# ------------------------------------------------------------- rrf_fuse

def _ranked(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "rank"])


def test_rrf_brute_parity_and_missing_sides(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(3, 1), (4, 2)])
    out = {
        r["doc_id"]: (r["rank_0"], r["rank_1"], r["rrf"], r["rank"])
        for r in rrf_fuse([a, b], "doc_id", top=10).collect()
    }
    exp_scores = {
        1: 1 / 61,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,  # appears in both lists
        4: 1 / 62,
    }
    assert set(out) == set(exp_scores)
    for i, s in exp_scores.items():
        assert out[i][2] == pytest.approx(round(s, 9), abs=0)
    # 3 fuses highest; 2 and 4 tie on score → doc_id ascending breaks it
    assert out[3][3] == 1 and out[1][3] == 2
    assert out[2][3] == 3 and out[4][3] == 4
    # missing-side ranks surface as nulls, not zeros
    assert out[1][1] is None and out[4][0] is None


def test_rrf_top_cut_and_validation(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 8)])
    b = _ranked(spark, [(i, 8 - i) for i in range(1, 8)])
    assert rrf_fuse([a, b], "doc_id", top=3).count() == 3
    with pytest.raises(ValueError, match="at least 2"):
        rrf_fuse([a], "doc_id")
    with pytest.raises(ValueError, match="positive"):
        rrf_fuse([a, b], "doc_id", top=0)


def test_rrf_three_lists(spark):
    a = _ranked(spark, [(1, 1)])
    b = _ranked(spark, [(1, 2)])
    c = _ranked(spark, [(2, 1)])
    out = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b, c], "doc_id").collect()}
    assert out[1] == pytest.approx(round(1 / 61 + 1 / 62, 9), abs=0)
    assert out[2] == pytest.approx(round(1 / 61, 9), abs=0)
