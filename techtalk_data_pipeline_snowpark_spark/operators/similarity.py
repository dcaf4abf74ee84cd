"""Similarity search over an embedding column (`array<float>`).

- brute-force cosine top-k: the exact baseline. Queries are a small set →
  broadcast; corpus streams map-side; per-query top-k via window over the
  (tiny) query key — no all-pairs materialization beyond q×N rows, and
  TakeOrderedAndProject-style pruning is available via per-partition
  pre-topk (map-side `row_number` is replaced by an aggregation of
  min-heaps: here expressed as two-stage top-k).
- IVF-style bucketed ANN: corpus is assigned to a deterministic
  hyperplane-LSH cell once (a write-time step at scale); queries probe
  their own cell (+ optional multi-probe) → candidate set ≪ N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _dot, cosine


def topk_per_key(
    scored: DataFrame,
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int,
) -> DataFrame:
    """Two-stage exact top-k by (order desc, tiebreak asc) per key.

    Stage 1 confines each *input partition's* rows per key to ONE
    aggregation buffer (groupBy(key, spark_partition_id()) + sorted-slice
    aggregation). Precision note: because the sort+slice can only run in
    the FINAL aggregate, the partial buffers still ship every scored row
    across the exchange packed into per-(key, partition) arrays — the
    win is that no single task ever holds a whole KEY's scored set, not
    reduced shuffle volume (for a volume-bounded stage 1 see
    `sharding.py stratified_sample`'s mapInPandas local top-k). Stage 2
    ranks the ≤ k·P survivors with the per-key window. A single-stage
    window would put ALL N scored rows for one key on one task — with
    ~20 query keys that is the whole corpus on 20 tasks, the r1 scale
    hazard.

    Single-partition bypass: when the scored input is ONE partition, the
    per-key window is already safe — every row sits on a single task by
    construction, so the local pre-top-k (collect_list/array_sort CPU plus
    an extra exchange) is pure overhead and is skipped. The two-stage shape
    is preserved for any multi-partition input (plan-asserted).
    """
    try:
        nparts = scored.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — conversion quirks never break topk
        nparts = None
    if nparts == 1:
        w1 = Window.partitionBy(key_col).orderBy(
            F.col(order_col).desc(), F.col(tiebreak_col).asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w1))
            .where(F.col("rank") <= k)
            .select(key_col, tiebreak_col, order_col, "rank")
        )
    top_struct = F.struct(
        (-F.col(order_col)).alias("_neg"), F.col(tiebreak_col).alias("_tb")
    )
    local = scored.groupBy(key_col, F.spark_partition_id().alias("_p")).agg(
        F.slice(F.array_sort(F.collect_list(top_struct)), 1, k).alias("_top")
    )
    cand = local.select(
        key_col, F.explode("_top").alias("_t")
    ).select(
        key_col,
        F.col("_t._tb").alias(tiebreak_col),
        (-F.col("_t._neg")).alias(order_col),
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(key_col, tiebreak_col, order_col, "rank")
    )


def cosine_topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k: broadcast the (small) query side, score every corpus
    row JVM-side (zip_with/aggregate dot product), two-stage top-k (see
    ``topk_per_key`` — no task ever holds the full scored set).

    ``round_digits`` rounds the cosine BEFORE ranking (applied in stage 1
    too, so the local top-k agrees with the final order) — cross-engine
    deterministic ranks with the id tie-break.

    Output: (query_id, neighbor_id, cosine, rank) — excludes self-matches.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    cos = cosine(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cos.alias("cosine")
    )
    return topk_per_key(scored, "query_id", "cosine", "neighbor_id", k).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def _plane_component(seed: str):
    """Single-argument lambda factory: a two-parameter lambda (even with a
    default, e.g. ``lambda d, p=p``) is treated by PySpark's transform as
    (element, index) — the index Column would silently shadow the seed and
    make the plane depend on internal plan ids (r2 bug: persisted and
    recomputed IVF cells disagreed)."""

    def fn(d):
        return (
            F.pmod(F.xxhash64(d.cast("string"), F.lit(seed)), F.lit(2001)) - 1000
        ).cast("double") / 1000.0

    return fn


def _lsh_cell(vec_col, num_planes: int):
    dim_planes = F.array(
        *[
            F.transform(
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                _plane_component(f"ivf{p}"),
            )
            for p in range(num_planes)
        ]
    )
    return F.aggregate(
        F.transform(
            dim_planes,
            lambda plane: F.when(_dot(plane, F.col(vec_col)) > 0, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, bit: acc * 2 + bit,
    )


def assign_ivf_cells(
    df: DataFrame, vec_col: str = "embedding", num_planes: int = 6
) -> DataFrame:
    """Cell assignment (see build_ivf_index for the persisted form)."""
    return df.withColumn("_cell", _lsh_cell(vec_col, num_planes))


def build_ivf_index(
    df: DataFrame,
    index_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
) -> None:
    """Write-time IVF index: the corpus persisted as parquet PARTITIONED BY
    its LSH cell. At 100 TB this is the scale path the transient
    ``cosine_topk_ivf`` only simulates: a query probe becomes a
    partition-pruned scan of |probed cells| directories instead of a full
    corpus scan — Spark's dynamic partition pruning drives the skip from
    the (broadcast) probe side at runtime."""
    out = assign_ivf_cells(df, vec_col, num_planes).select(
        F.col(id_col), F.col(vec_col), "_cell"
    )
    # one file per cell directory (cells ≈ 2^num_planes, each ~N/cells rows)
    out.repartition(F.col("_cell")).write.mode("overwrite").partitionBy(
        "_cell"
    ).parquet(index_root)


def cosine_topk_ivf_indexed(
    spark,
    index_root: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 6,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k over a persisted IVF index (build_ivf_index): the probe
    joins the broadcast query cells against the partition column, so the
    parquet scan reads ONLY the probed cell directories (dynamic partition
    pruning — asserted by plan test). num_planes must match the index."""
    corpus = spark.read.parquet(index_root)
    q0 = assign_ivf_cells(queries, vec_col, num_planes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "_cell"
    )
    probes = [F.col("_cell")]
    for b in range(min(multiprobe, num_planes)):
        probes.append(F.col("_cell").bitwiseXOR(F.lit(1 << b)))
    q = q0.withColumn("_probe", F.explode(F.array(*probes))).drop("_cell")
    scored = corpus.join(
        F.broadcast(q),
        (F.col("_cell") == F.col("_probe")) & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qv"), F.col(vec_col)).alias("cosine"),
    )
    deduped = scored.dropDuplicates(["query_id", "neighbor_id"])
    return topk_per_key(deduped, "query_id", "cosine", "neighbor_id", k).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 6,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k: probe the query's LSH cell (plus ``multiprobe`` neighbor
    cells by single-bit flips). Candidate set is |cell|·probes ≪ N."""
    c = assign_ivf_cells(corpus, vec_col, num_planes).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "_cell"
    )
    q0 = assign_ivf_cells(queries, vec_col, num_planes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "_cell"
    )
    probes = [F.col("_cell")]
    for b in range(min(multiprobe, num_planes)):
        probes.append(F.col("_cell").bitwiseXOR(F.lit(1 << b)))
    q = q0.withColumn("_probe", F.explode(F.array(*probes))).drop("_cell")
    scored = c.join(
        F.broadcast(q),
        (F.col("_cell") == F.col("_probe")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    deduped = scored.dropDuplicates(["query_id", "neighbor_id"])  # multiprobe overlap
    return topk_per_key(deduped, "query_id", "cosine", "neighbor_id", k).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def cosine_topk_kmeans_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 1,
    scale: int = 10_000,
) -> DataFrame:
    """TRUE IVF ANN (the FAISS coarse-quantizer shape): the corpus is
    assigned once to its nearest k-means centroid (``clustering.kmeans_fit``
    — quantized, exact-integer, partitioning-invariant); each query probes
    its ``nprobe`` nearest centroids and ranks ONLY those clusters'
    members by cosine. Because both the corpus assignment and the probe
    selection are exact int64 arithmetic, the candidate set — unlike the
    hyperplane-LSH cells of ``cosine_topk_ivf`` — is deterministic AND
    exactly replayable by a SQL oracle; only the final cosine is float
    (rounded, like ``cosine_topk_brute``'s contract).

    Scale: assignment and probe selection are map-only JVM folds; the
    probe list (queries × nprobe rows) broadcasts into the join, so the
    corpus never shuffles; the exact top-k is the two-stage reduction
    (≤ k rows per (query, partition) cross the one exchange).
    """
    from .clustering import _dist_sq, quantize_embedding

    if not centroids:
        raise ValueError("cosine_topk_kmeans_ivf: centroids must be non-empty")
    if not 1 <= nprobe <= len(centroids):
        raise ValueError(
            f"cosine_topk_kmeans_ivf: nprobe must be in [1, {len(centroids)}]"
        )
    # score in DOUBLE end-to-end (float folds drift in the 8th decimal
    # and would break the rounded-cosine contract vs a double engine)
    from .dedup import _bind

    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # rebalance before the heavy assignment + scoring map work: everything
    # downstream is map-side against broadcast probes, so a one-file input
    # would otherwise run the whole candidate-scoring stage on ONE task.
    src = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    c = src.select(
        F.col(id_col).alias("neighbor_id"),
        dbl.alias("cv"),
        quantize_embedding(vec_col, scale).alias("__qv"),
    )
    dists = F.array(*[_dist_sq(F.col("__qv"), ct) for ct in centroids])
    # _bind: the k distance folds are interpreted HOFs (no codegen CSE) —
    # evaluate the array once, not once per reference.
    c = c.select(
        "neighbor_id",
        "cv",
        _bind(
            dists,
            lambda ds: (F.array_position(ds, F.array_min(ds)) - F.lit(1)).cast(
                "long"
            ),
        ).alias("cluster"),
    )
    qq = queries.select(
        F.col(id_col).alias("query_id"),
        dbl.alias("qv"),
        quantize_embedding(vec_col, scale).alias("__qv"),
    )
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    _dist_sq(F.col("__qv"), ct).alias("d"),
                    F.lit(i).cast("long").alias("i"),
                )
                for i, ct in enumerate(centroids)
            ]
        )
    )
    probes = F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])
    q = qq.select(
        "query_id", "qv", F.explode(probes).alias("cluster")
    )
    scored = c.join(
        F.broadcast(q),
        ["cluster"],
    ).where(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 9).alias("cos_sim"),
    )
    return topk_per_key(scored, "query_id", "cos_sim", "neighbor_id", k).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )
