"""Deterministic quantized k-means + SemDeDup semantic near-dup.

Verified against a pure-Python integer brute force that replays the
exact same arithmetic (floor-quantize, int squared distances,
first-match argmin, floor(sum/count) centroid update), plus planted
well-separated clusters, partitioning invariance (the property float
k-means cannot give), tie semantics, empty-cluster carry, and plan
shape (map-only assignment; hash join — not cartesian — on the pair
stage)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators import (
    kmeans_assign,
    kmeans_fit,
    quantize_embedding,
    semantic_cluster_stats,
    semantic_near_dups,
)

SCALE = 10_000


def _q(vec):
    return [math.floor(x * SCALE) for x in vec]


def _brute_kmeans(rows, k, iters, salt):
    """The module's arithmetic, replayed row-at-a-time in Python."""
    import hashlib

    def h(i):
        return hashlib.md5((str(i) + salt).encode()).hexdigest()

    seeds = sorted(rows, key=lambda r: (h(r[0]), r[0]))[:k]
    cents = [_q(r[1]) for r in seeds]

    def assign(v, cents):
        best, bd = None, None
        for c, cent in enumerate(cents):
            d = sum((a - b) * (a - b) for a, b in zip(v, cent))
            if bd is None or d < bd:  # strict: ties keep the LOWEST c
                best, bd = c, d
        return best, bd

    for _ in range(iters):
        sums, cnts = {}, {}
        for rid, vec in rows:
            v = _q(vec)
            c, _ = assign(v, cents)
            cnts[c] = cnts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * len(v))
            for i, x in enumerate(v):
                s[i] += x
        cents = [
            [math.floor(sums[c][i] / cnts[c]) for i in range(len(cents[c]))]
            if c in cnts
            else cents[c]
            for c in range(k)
        ]
    return {rid: assign(_q(vec), cents) for rid, vec in rows}, cents


def _synth(n=120, d=8, clusters=3, seed=7):
    """Well-separated planted clusters on a deterministic RNG."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        g = i % clusters
        center = [3.0 * (1 if (g >> b) & 1 else -1) for b in range(d)]
        vec = [center[j] + rng.uniform(-0.3, 0.3) for j in range(d)]
        rows.append((i, vec))
    return rows


def test_brute_parity_and_planted_recovery(spark):
    rows = _synth()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    asg, cents = kmeans_fit(df, "vec_id", "embedding", k=3, iters=3, salt="s1")
    got = {
        r["vec_id"]: (r["cluster"], r["dist_sq"])
        for r in asg.select("vec_id", "cluster", "dist_sq").collect()
    }
    want, want_cents = _brute_kmeans(rows, 3, 3, "s1")
    assert got == want
    assert cents == want_cents
    # planted recovery: each output cluster maps to exactly one planted group
    groups = {}
    for rid, (c, _) in got.items():
        groups.setdefault(c, set()).add(rid % 3)
    assert all(len(g) == 1 for g in groups.values()) and len(groups) == 3


def test_partitioning_invariance(spark):
    rows = _synth(n=90, seed=11)
    df1 = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(1)
    df13 = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(13)
    a1, c1 = kmeans_fit(df1, "vec_id", "embedding", k=4, iters=2, salt="p")
    a13, c13 = kmeans_fit(df13, "vec_id", "embedding", k=4, iters=2, salt="p")
    assert c1 == c13  # float k-means would already disagree here
    s1 = a1.select("vec_id", "cluster", "dist_sq")
    assert s1.exceptAll(a13.select("vec_id", "cluster", "dist_sq")).count() == 0


def test_argmin_tie_lowest_cluster_and_iters0(spark):
    df = spark.createDataFrame([(0, [0.0, 0.0])], ["vec_id", "embedding"])
    # two identical centroids: tie must resolve to index 0
    out = kmeans_assign(
        df.select("vec_id", quantize_embedding("embedding").alias("__qv")),
        "__qv",
        [[5, 5], [5, 5]],
    ).collect()[0]
    assert out["cluster"] == 0 and out["dist_sq"] == 50
    # iters=0 assigns against the md5-seed centroids directly
    rows = _synth(n=20, seed=3)
    asg, cents = kmeans_fit(
        spark.createDataFrame(rows, ["vec_id", "embedding"]),
        "vec_id",
        "embedding",
        k=2,
        iters=0,
        salt="z",
    )
    _, want_cents = _brute_kmeans(rows, 2, 0, "z")
    assert cents == want_cents


def test_empty_cluster_carries_centroid(spark):
    # k=3 over two tight planted blobs: one seed centroid will end up
    # memberless after iteration 1 and must survive verbatim.
    rows = [(i, [0.0 + i * 1e-4, 0.0]) for i in range(10)] + [
        (100 + i, [9.0 + i * 1e-4, 9.0]) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    asg, cents = kmeans_fit(df, "vec_id", "embedding", k=3, iters=2, salt="e")
    _, want_cents = _brute_kmeans(rows, 3, 2, "e")
    assert cents == want_cents
    assert asg.select("cluster").distinct().count() <= 3


def test_semantic_near_dups_planted(spark):
    rows = _synth(n=60, d=8, clusters=2, seed=5)
    # plant two exact near-dups of row 0 (same planted cluster by construction)
    base = rows[0][1]
    rows.append((1000, [x + 0.01 for x in base]))
    rows.append((1001, [x - 0.01 for x in base]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    asg, _ = kmeans_fit(df, "vec_id", "embedding", k=2, iters=2, salt="d")
    pairs = semantic_near_dups(asg, "vec_id", threshold=(99, 100))
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert {(0, 1000), (0, 1001), (1000, 1001)} <= got
    # every pair is genuinely above threshold by exact integer math
    for r in pairs.collect():
        assert r["dot"] > 0
    # a<b canonical orientation, within-cluster only
    clusters = {r["vec_id"]: r["cluster"] for r in asg.collect()}
    for a, b in got:
        assert a < b and clusters[a] == clusters[b]


def test_semantic_threshold_exactness(spark):
    # hand-built QUANTIZED vectors where cos is exactly 3/5 = 0.6:
    # a=[3,0], b=[3,4]: dot=9, |a|²=9, |b|²=25 → cos=9/15=3/5.
    asg = spark.createDataFrame(
        [(0, 0, 0, [3, 0]), (1, 0, 0, [3, 4])],
        ["vec_id", "cluster", "dist_sq", "__qv"],
    )
    # threshold exactly 3/5: the >= must INCLUDE the boundary pair
    assert semantic_near_dups(asg, "vec_id", threshold=(3, 5)).count() == 1
    # one notch tighter must exclude it
    assert semantic_near_dups(asg, "vec_id", threshold=(601, 1000)).count() == 0


def test_cluster_cap_and_stats(spark):
    rows = _synth(n=50, d=4, clusters=1, seed=9)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    asg, _ = kmeans_fit(df, "vec_id", "embedding", k=1, iters=1, salt="c")
    stats = semantic_cluster_stats(asg, cluster_cap=10)
    assert stats["clusters"] == 1 and stats["max_cluster"] == 50
    assert stats["clusters_capped"] == 1
    assert stats["candidate_pairs_dropped"] == (50 * 49 - 10 * 9) // 2
    capped = semantic_near_dups(asg, "vec_id", (1, 100), cluster_cap=10)
    # ≤ C(10,2) candidate pairs can survive; and capping is deterministic
    assert capped.count() <= 45
    again = semantic_near_dups(asg, "vec_id", (1, 100), cluster_cap=10)
    assert capped.exceptAll(again).count() == 0
    assert semantic_cluster_stats(asg)["candidate_pairs_dropped"] == 0


def test_plan_shape(spark):
    rows = _synth(n=40, seed=13)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qdf = df.select("vec_id", quantize_embedding("embedding").alias("__qv"))
    plan = kmeans_assign(qdf, "__qv", [[0] * 8, [1] * 8])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # assignment is map-only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    asg, _ = kmeans_fit(df, "vec_id", "embedding", k=2, iters=1, salt="q")
    pplan = (
        semantic_near_dups(asg, "vec_id", (1, 2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in pplan and "BroadcastNestedLoop" not in pplan


def test_validation(spark):
    df = spark.createDataFrame([(0, [0.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="k must be"):
        kmeans_fit(df, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError, match="iters"):
        kmeans_fit(df, "vec_id", "embedding", k=1, iters=-1)
    with pytest.raises(ValueError, match="exceeds row count"):
        kmeans_fit(df, "vec_id", "embedding", k=5)
    asg, _ = kmeans_fit(df, "vec_id", "embedding", k=1, iters=0)
    with pytest.raises(ValueError, match="num <= den"):
        semantic_near_dups(asg, "vec_id", threshold=(3, 2))
    with pytest.raises(ValueError, match="cluster_cap"):
        semantic_near_dups(asg, "vec_id", cluster_cap=0)
    with pytest.raises(ValueError, match="centroids"):
        kmeans_assign(df, "embedding", [])


def _brute_topk(rows, centroids, qid, nprobe, k):
    """Exact replay of cosine_topk_kmeans_ivf in Python."""
    def dist(v, cent):
        return sum((a - b) * (a - b) for a, b in zip(_q(v), cent))

    def cluster(v):
        ds = [dist(v, c) for c in centroids]
        return ds.index(min(ds))

    qvec = dict(rows)[qid]
    probes = [
        c
        for _, c in sorted(
            (dist(qvec, cent), c) for c, cent in enumerate(centroids)
        )[:nprobe]
    ]
    cands = [
        (rid, vec)
        for rid, vec in rows
        if rid != qid and cluster(vec) in probes
    ]

    def cos(a, b):
        import math as m

        d = sum(x * y for x, y in zip(a, b))
        return round(d / (m.sqrt(sum(x * x for x in a)) * m.sqrt(sum(x * x for x in b))), 9)

    scored = sorted(((-cos(qvec, v), rid) for rid, v in cands))
    return [(rid, -negc) for negc, rid in scored[:k]]


def test_kmeans_ivf_brute_parity_and_planted(spark):
    from techtalk_data_pipeline_snowpark_spark.operators import (
        cosine_topk_kmeans_ivf,
    )

    rows = _synth(n=80, d=8, clusters=4, seed=21)
    # plant an exact near-dup of row 1 — must surface at rank 1
    rows.append((2000, [x * 1.001 for x in rows[1][1]]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    asg, cents = kmeans_fit(df, "vec_id", "embedding", k=4, iters=2, salt="iv")
    out = cosine_topk_kmeans_ivf(
        df, df.where(F.col("vec_id") < 3), cents, k=5, nprobe=2
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
        )
    for qid in (0, 1, 2):
        want = _brute_topk(rows, cents, qid, nprobe=2, k=5)
        got_q = [(n, c) for _, n, c in sorted(got[qid])]
        assert got_q == want, (qid, got_q, want)
    assert sorted(got[1])[0][1] == 2000  # planted dup is rank 1


def test_kmeans_ivf_plan_and_validation(spark):
    from techtalk_data_pipeline_snowpark_spark.operators import (
        cosine_topk_kmeans_ivf,
    )

    rows = _synth(n=40, seed=23)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    _, cents = kmeans_fit(df, "vec_id", "embedding", k=3, iters=1, salt="pv")
    out = cosine_topk_kmeans_ivf(df, df.limit(2), cents, k=3, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan  # probe side broadcasts
    assert "CartesianProduct" not in plan
    with pytest.raises(ValueError, match="nprobe"):
        cosine_topk_kmeans_ivf(df, df, cents, nprobe=0)
    with pytest.raises(ValueError, match="nprobe"):
        cosine_topk_kmeans_ivf(df, df, cents, nprobe=99)
    with pytest.raises(ValueError, match="centroids"):
        cosine_topk_kmeans_ivf(df, df, [])
