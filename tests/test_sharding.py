"""Tests for operators/sharding.py — hash splits and shard packing."""

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.sharding import (
    hash_split,
    hash_split_oracle_case,
    pack_shards,
    shard_manifest,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.xxhash64(F.col("id")) % 97 + 97).alias("tokens"),
    )


# ----------------------------------------------------------- hash_split

def test_hash_split_is_pure_function_of_id(spark):
    a = hash_split(_docs(spark), "doc_id").select("doc_id", "split")
    # Same ids in a different frame (different order, extra rows) map
    # to the same split: adding documents never moves existing ones.
    bigger = _docs(spark, 1000).orderBy(F.desc("doc_id"))
    b = hash_split(bigger, "doc_id").select("doc_id", "split")
    joined = a.alias("a").join(b.alias("b"), "doc_id")
    assert joined.where(F.col("a.split") != F.col("b.split")).count() == 0


def test_hash_split_proportions_and_exhaustive(spark):
    out = hash_split(_docs(spark, 4000), "doc_id")
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 4000
    assert counts["train"] / 4000 == pytest.approx(0.8, abs=0.05)
    assert counts["val"] / 4000 == pytest.approx(0.1, abs=0.03)


def test_hash_split_salt_redraws(spark):
    a = hash_split(_docs(spark), "doc_id", salt="s1").select("doc_id", "split")
    b = hash_split(_docs(spark), "doc_id", salt="s2").select("doc_id", "split")
    moved = a.alias("a").join(b.alias("b"), "doc_id").where(
        F.col("a.split") != F.col("b.split")
    ).count()
    assert moved > 0  # different salt = a genuinely different draw


def test_hash_split_no_shuffle(spark):
    plan = hash_split(_docs(spark), "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only


def test_hash_split_weight_validation():
    with pytest.raises(ValueError):
        hash_split_oracle_case("id", {})
    with pytest.raises(ValueError):
        hash_split_oracle_case("id", {"a": -1.0, "b": 2.0})


def test_hash_split_single_split(spark):
    out = hash_split(_docs(spark, 50), "doc_id", {"all": 1.0})
    assert out.where(F.col("split") != "all").count() == 0


# ----------------------------------------------------------- pack_shards

def _expected_shards(rows, budget):
    rows = sorted(rows, key=lambda r: r[0])
    acc, out = 0, {}
    for doc_id, tokens in rows:
        out[doc_id] = acc // budget
        acc += tokens
    return out


def test_pack_shards_matches_global_prefix_sum(spark):
    df = _docs(spark, 600).repartition(13)  # scrambled input order
    packed = pack_shards(df, "doc_id", "tokens", budget=1500)
    got = {r["doc_id"]: r["shard_id"] for r in packed.collect()}
    want = _expected_shards(
        [(r["doc_id"], r["tokens"]) for r in df.collect()], 1500
    )
    assert got == want


def test_pack_shards_never_single_partition_window(spark):
    """The scale guarantee: every window is partition-local — the plan
    contains no SinglePartition exchange (the global-sort formulation)."""
    packed = pack_shards(_docs(spark, 300), "doc_id", "tokens", budget=1000)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_shards_budget_larger_than_total(spark):
    packed = pack_shards(_docs(spark, 20), "doc_id", "tokens", budget=10**9)
    assert packed.where(F.col("shard_id") != 0).count() == 0


def test_pack_shards_manifest_budget_respected(spark):
    budget = 1200
    packed = pack_shards(_docs(spark, 500), "doc_id", "tokens", budget=budget)
    man = shard_manifest(packed, "tokens").collect()
    max_tok = max(r["tokens"] for r in _docs(spark, 500).collect())
    # Prefix-sum packing overshoots a shard by at most one document.
    for r in man:
        assert r["n_tokens"] < budget + max_tok
    assert sum(r["n_docs"] for r in man) == 500


def test_pack_shards_empty_and_validation(spark):
    empty = _docs(spark, 0)
    assert pack_shards(empty, "doc_id", "tokens", budget=100).count() == 0
    with pytest.raises(ValueError):
        pack_shards(empty, "doc_id", "tokens", budget=0)
