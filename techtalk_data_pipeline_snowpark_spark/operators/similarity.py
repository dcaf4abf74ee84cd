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


def cosine_topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k: broadcast the (small) query side, score every corpus
    row JVM-side (zip_with/aggregate dot product), two-stage top-k.

    Output: (query_id, neighbor_id, cosine, rank) — excludes self-matches.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _lsh_cell(vec_col, num_planes: int):
    dim_planes = F.array(
        *[
            F.transform(
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                lambda d, p=p: (
                    F.pmod(F.xxhash64(d.cast("string"), F.lit(f"ivf{p}")), F.lit(2001)) - 1000
                ).cast("double")
                / 1000.0,
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
    """Write-time cell assignment (at scale: persisted + partitioned by
    cell so a probe is a partition-pruned scan)."""
    return df.withColumn("_cell", _lsh_cell(vec_col, num_planes))


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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
