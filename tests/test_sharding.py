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


# ------------------------------------------------------ mixture_resample

def _langs(spark, n=2000):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import (
        mixture_resample as _,  # noqa: F401 — keep import near use
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("zh"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_mixture_hits_target_proportions(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import mixture_resample

    out = mixture_resample(
        _langs(spark), "lang", {"en": 0.5, "zh": 2.5}, "doc_id", salt="t"
    )
    counts = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    base = 2000 // 3  # ~667 per lang
    assert counts["en"] / base == pytest.approx(0.5, abs=0.1)
    assert counts["zh"] / base == pytest.approx(2.5, abs=0.2)
    assert counts["fr"] == 666  # default weight 1.0 keeps all, one copy


def test_mixture_upsample_copies_are_distinct_and_bounded(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import mixture_resample

    out = mixture_resample(_langs(spark, 300), "lang", {"zh": 2.5}, "doc_id")
    per_doc = out.where(F.col("lang") == "zh").groupBy("doc_id").agg(
        F.count("*").alias("n"), F.countDistinct("copy_id").alias("d"),
        F.max("copy_id").alias("mx"),
    )
    bad = per_doc.where(
        (F.col("n") < 2) | (F.col("n") > 3) | (F.col("n") != F.col("d"))
        | (F.col("mx") != F.col("n") - 1)
    ).count()
    assert bad == 0


def test_mixture_deterministic_and_growth_stable(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import mixture_resample

    w = {"en": 0.3, "zh": 1.5}
    small = mixture_resample(_langs(spark, 300), "lang", w, "doc_id", salt="g")
    big = mixture_resample(_langs(spark, 900), "lang", w, "doc_id", salt="g")
    # Every (doc_id, copy_id) of the small corpus survives verbatim in the
    # bigger one: growing the corpus never changes an existing decision.
    assert small.select("doc_id", "copy_id").exceptAll(
        big.select("doc_id", "copy_id")
    ).count() == 0


def test_mixture_zero_weight_drops_group_and_no_shuffle(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import mixture_resample

    out = mixture_resample(_langs(spark, 300), "lang", {"fr": 0.0}, "doc_id")
    assert out.where(F.col("lang") == "fr").count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mixture_negative_weight_rejected(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import mixture_resample

    with pytest.raises(ValueError):
        mixture_resample(_langs(spark, 10), "lang", {"en": -0.5}, "doc_id")


# ------------------------------------------------------ stratified_sample

def _brute_sample(n, k, salt=""):
    import hashlib

    by_lang = {}
    for i in range(n):
        lang = ["en", "zh", "fr"][i % 3]
        by_lang.setdefault(lang, []).append(
            (hashlib.md5((str(i) + salt).encode()).hexdigest(), i)
        )
    out = {}
    for lang, rows in by_lang.items():
        for rank, (_, i) in enumerate(sorted(rows)[:k], start=1):
            out[(lang, i)] = rank
    return out


def test_stratified_sample_rank_by_hash_parity(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import stratified_sample

    got = {
        (r["lang"], r["doc_id"]): r["sample_rank"]
        for r in stratified_sample(_langs(spark, 300), ["lang"], "doc_id", 7).collect()
    }
    assert got == _brute_sample(300, 7)


def test_stratified_sample_exact_quota_and_small_groups(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import stratified_sample

    # fr has only 3 members at n=9: quota is min(k, |group|)
    out = stratified_sample(_langs(spark, 9), ["lang"], "doc_id", 5)
    counts = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert counts == {"en": 3, "zh": 3, "fr": 3}
    big = stratified_sample(_langs(spark, 3000), ["lang"], "doc_id", 5)
    counts = {r["lang"]: r["c"] for r in big.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert counts == {"en": 5, "zh": 5, "fr": 5}


def test_stratified_sample_partitioning_invariant(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import stratified_sample

    base = _langs(spark, 500)
    a = stratified_sample(base, ["lang"], "doc_id", 9)
    b = stratified_sample(base.repartition(13).orderBy(F.desc("doc_id")), ["lang"], "doc_id", 9)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stratified_sample_salt_redraws(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import stratified_sample

    a = {r["doc_id"] for r in stratified_sample(_langs(spark, 600), ["lang"], "doc_id", 10, salt="s1").collect()}
    b = {r["doc_id"] for r in stratified_sample(_langs(spark, 600), ["lang"], "doc_id", 10, salt="s2").collect()}
    assert a != b


def test_stratified_sample_two_stage_plan_and_validation(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import stratified_sample

    out = stratified_sample(_langs(spark, 300).repartition(8), ["lang"], "doc_id", 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # stage 1 (map-side per-partition top-k, BEFORE any exchange) must be
    # present so the shuffle carries <= k rows per (group, partition)
    assert "MapInPandas" in plan
    # single-partition input: the window alone is safe — stage 1 skipped
    one = stratified_sample(_langs(spark, 300).coalesce(1), ["lang"], "doc_id", 4)
    assert "MapInPandas" not in one._jdf.queryExecution().executedPlan().toString()
    multi = {
        (r["lang"], r["doc_id"], r["sample_rank"]) for r in out.collect()
    }
    single = {(r["lang"], r["doc_id"], r["sample_rank"]) for r in one.collect()}
    assert multi == single  # bypass and two-stage agree exactly
    with pytest.raises(ValueError):
        stratified_sample(_langs(spark, 10), ["lang"], "doc_id", 0)
    with pytest.raises(ValueError):
        stratified_sample(_langs(spark, 10), [], "doc_id", 3)


# -------------------------------------------------------- pack_sequences

def _brute_sequences(rows, L):
    """rows: [(id, tokens)] — concat-then-chunk positions in id order."""
    out = {}
    pre = 0
    for i, tok in sorted(rows):
        seq = pre // L
        off = pre % L
        n = (pre + tok - 1) // L - seq + 1 if tok > 0 else 0
        out[i] = (seq, off, n)
        pre += tok
    return out


def test_pack_sequences_brute_parity_scrambled_partitions(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import pack_sequences

    rows = [(i, (i * 37) % 190 + (0 if i % 11 == 0 else 13)) for i in range(500)]
    df = (
        spark.createDataFrame(rows, "doc_id long, tokens long")
        .repartition(13)
        .orderBy(F.desc("doc_id"))
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
        for r in pack_sequences(df, "doc_id", "tokens", 256).collect()
    }
    assert got == _brute_sequences(rows, 256)


def test_pack_sequences_boundary_and_zero_token_docs(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import pack_sequences

    # doc 0 fills seq 0 exactly; doc 1 has zero tokens AT a boundary;
    # doc 2 spans three sequences
    rows = [(0, 128), (1, 0), (2, 300), (3, 5)]
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id long, tokens long"),
            "doc_id", "tokens", 128,
        ).collect()
    }
    assert got == {
        0: (0, 0, 1),
        1: (1, 0, 0),   # zero-token doc: position defined, spans nothing
        2: (1, 0, 3),   # 300 tokens from a boundary: seqs 1,2,3
        3: (3, 44, 1),  # 300 % 128 = 44 into seq 3
    }


def test_pack_sequences_no_single_partition_plan_and_validation(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import pack_sequences

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("tokens")
    ).repartition(8)
    out = pack_sequences(df, "doc_id", "tokens", 64, num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan  # every window partition-local
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "tokens", 0)


# -------------------------------------------------- deterministic_shuffle

def _brute_shuffle(n, salt=""):
    import hashlib

    keys = {
        i: hashlib.md5((str(i) + salt).encode()).hexdigest() + "-" + str(i).zfill(24)
        for i in range(n)
    }
    return {i: r for r, (i, _) in enumerate(sorted(keys.items(), key=lambda kv: kv[1]))}


def test_deterministic_shuffle_brute_parity_and_permutation(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import (
        deterministic_shuffle,
    )

    df = _langs(spark, 400).repartition(9)
    got = {
        r["doc_id"]: r["shuffle_rank"]
        for r in deterministic_shuffle(df, "doc_id").collect()
    }
    assert got == _brute_shuffle(400)
    assert sorted(got.values()) == list(range(400))  # a true permutation


def test_deterministic_shuffle_salt_is_a_new_epoch(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import (
        deterministic_shuffle,
    )

    base = _langs(spark, 300)
    a = {r["doc_id"]: r["shuffle_rank"] for r in deterministic_shuffle(base, "doc_id", salt="e1").collect()}
    b = {r["doc_id"]: r["shuffle_rank"] for r in deterministic_shuffle(base, "doc_id", salt="e2").collect()}
    assert a == _brute_shuffle(300, "e1") and b == _brute_shuffle(300, "e2")
    assert a != b  # different epoch = genuinely different order


def test_deterministic_shuffle_no_single_partition_plan(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import (
        deterministic_shuffle,
    )

    out = deterministic_shuffle(_langs(spark, 300).repartition(8), "doc_id", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan  # never one global sorted task


# ----------------------------------------------------- chunk_documents

def _brute_chunks(texts, window, stride):
    """(doc_id, chunk_id, chunk_text, n_tokens) ground truth in Python."""
    out = []
    for doc_id, text in texts:
        if text is None:
            continue
        toks = text.split()
        if not toks:
            continue
        n = len(toks)
        last = (max(n - window, 0) + stride - 1) // stride
        for i in range(last + 1):
            piece = toks[i * stride : i * stride + window]
            out.append((doc_id, i, " ".join(piece), min(window, n - i * stride)))
    return sorted(out)


def _chunk_rows(spark, texts):
    return spark.createDataFrame(texts, "doc_id: long, text: string")


_CHUNK_TEXTS = [
    (0, "a b c d e f g h i j"),      # 10 tokens
    (1, "one"),                       # single token
    (2, ""),                          # blank -> no chunks
    (3, None),                        # NULL -> no chunks
    (4, "  lead  mid   trail  "),     # messy whitespace
    (5, "w x y z"),                   # n == window boundary cases
]


def test_chunk_documents_brute_parity_over_window_stride_grid(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import chunk_documents

    df = _chunk_rows(spark, _CHUNK_TEXTS).repartition(5)
    for window, stride in [(4, 4), (4, 2), (3, 1), (2, 5), (100, 7)]:
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(df, "doc_id", "text", window, stride).collect()
        )
        assert got == _brute_chunks(_CHUNK_TEXTS, window, stride), (window, stride)


def test_chunk_documents_overlap_and_tail(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import chunk_documents

    df = _chunk_rows(spark, [(0, "a b c d e")])
    rows = {r["chunk_id"]: r for r in chunk_documents(df, "doc_id", "text", 3, 2).collect()}
    # windows: [a b c], [c d e] — last window reaches the final token exactly
    assert rows[0]["chunk_text"] == "a b c" and rows[0]["n_tokens"] == 3
    assert rows[1]["chunk_text"] == "c d e" and rows[1]["n_tokens"] == 3
    assert len(rows) == 2
    # stride 4 overshoots: tail chunk is short, length reported truthfully
    rows = {r["chunk_id"]: r for r in chunk_documents(df, "doc_id", "text", 3, 4).collect()}
    assert rows[1]["chunk_text"] == "e" and rows[1]["n_tokens"] == 1


def test_chunk_documents_keeps_payload_and_is_map_only(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import chunk_documents

    df = spark.createDataFrame(
        [(0, "a b c", "en")], "doc_id: long, text: string, lang: string"
    )
    out = chunk_documents(df, "doc_id", "text", 2)
    assert set(out.columns) == {"doc_id", "text", "lang", "chunk_id", "chunk_text", "n_tokens"}
    assert [r["lang"] for r in out.collect()] == ["en", "en"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle at any scale


def test_chunk_documents_validation(spark):
    from techtalk_data_pipeline_snowpark_spark.operators.sharding import chunk_documents

    df = _chunk_rows(spark, [(0, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 4, 0)


def test_chunk_documents_duckdb_oracle_parity(spark):
    import duckdb

    from techtalk_data_pipeline_snowpark_spark.operators.sharding import (
        chunk_documents,
        chunk_documents_oracle,
    )

    df = _chunk_rows(spark, _CHUNK_TEXTS)
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, "doc_id", "text", 4, 3)
        .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", _CHUNK_TEXTS)
    want = sorted(
        tuple(r) for r in con.execute(
            chunk_documents_oracle("documents", "doc_id", "text", 4, 3)
        ).fetchall()
    )
    assert got == want
