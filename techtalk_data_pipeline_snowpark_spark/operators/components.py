"""Distributed connected components — the clustering step of the dedup
family.

``minhash_lsh_candidates`` / ``simhash_candidates`` /
``blocked_jaccard_near_dups`` produce verified near-duplicate PAIRS; actual
deduplication needs CLUSTERS: the transitive closure of the pair graph,
one canonical document per component. (Reference scope: the pipelines in
`/root/reference` stop at per-row transforms — components is part of the
beyond-reference training-data family the brief asks for.)

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the
shuffle-native formulation:

* **large-star**: every node connects its *larger* neighbors to the
  minimum of its neighborhood (including itself).
* **small-star**: every node connects its *smaller-or-equal* neighbors
  (and itself) to the minimum of those.

Both steps are one groupBy + one join each; the edge set converges to a
star forest (every node → its component's minimum id) in O(log² n)
rounds — unlike naive label propagation, whose round count is the graph
DIAMETER (a 10⁶-node chain would need 10⁶ rounds; large/small-star needs
~20). Each round ends in ``localCheckpoint`` to cut lineage, and
convergence is detected by a (count, xxhash-sum) signature of the edge
set — two aggregate scalars per round, no driver-side edge collection.

At 100 TB: every round is two shuffles keyed on node id over a set that
SHRINKS monotonically toward one edge per non-root node; the hooks are
plain groupBy/join, so AQE handles skew (a mega-component's hub key is
exactly the skew-join case AQE splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "assign_components"]


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set, canonical orientation u > v, self-loops and
    null endpoints dropped, distinct."""
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")).where(
        F.col("_u").isNotNull() & F.col("_v").isNotNull()
    )
    return (
        e.select(
            F.greatest("_u", "_v").alias("u"), F.least("_u", "_v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node n over the SYMMETRIZED neighborhood Γ(n):
    m = min(Γ(n) ∪ {n}); emit (x, m) for every x ∈ Γ(n) with x > n."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("_mn", F.col("u")).alias("m"))
    out = (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _small_star(e: DataFrame) -> DataFrame:
    """Orient u > v; for each u: m = min of its smaller neighbors; connect
    u and every smaller neighbor (≠ m) to m."""
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    to_m = (
        o.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_m = mins.select("u", F.col("m").alias("v"))
    out = to_m.union(self_m)
    return out.where(F.col("u") != F.col("v")).distinct()


def _signature(e: DataFrame) -> tuple:
    """Order-independent (count, hash-sum) fingerprint of an edge set —
    two scalars, computed distributed."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: immune to long overflow under ANSI mode
        F.sum(
            F.xxhash64(F.col("u").cast("string"), F.col("v").cast("string"))
            .cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Component label for every node that appears in ``edges``.

    Returns ``(node, component)`` where ``component`` is the MINIMUM id in
    the node's connected component (the canonical representative — stable,
    deterministic, no tie-breaking needed). Every node of the edge set
    appears exactly once, including each component's root (labelled with
    itself). Works for any orderable id type (long, string, ...).

    ``stats`` (optional dict) receives ``{"iterations": k}`` — tests use it
    to assert O(log n) convergence on a chain.

    Raises ``RuntimeError`` if the star forest hasn't converged after
    ``max_iterations`` alternations (log²-round bound: 50 covers any
    realistic graph; a non-converging run indicates a bug, not data).
    """
    e = _canon(edges, src, dst).localCheckpoint(eager=True)
    # nodes derives from the CHECKPOINTED edges — the final roots anti-join
    # must not re-execute the caller's (possibly expensive) pair pipeline.
    nodes = e.select(F.col("u").alias("node")).union(
        e.select(F.col("v").alias("node"))
    ).distinct()
    if e.isEmpty():
        return e.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )

    prev_sig = None
    iters = 0
    for i in range(max_iterations):
        e_next = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = _signature(e_next)
        e = e_next
        iters = i + 1
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "large/small-star rounds"
        )
    if stats is not None:
        stats["iterations"] = iters

    # converged star forest: u > v and v is u's component min. Roots don't
    # appear on the left — union them in labelled with themselves.
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = nodes.join(
        labels.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return labels.union(roots)


def assign_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 50,
) -> DataFrame:
    """Cluster assignment for EVERY row of ``df``: rows untouched by any
    pair are singleton clusters (their own canonical). Output:
    ``(id_col, cluster_id, is_canonical)`` — downstream dedup keeps the
    ``is_canonical`` rows; a broadcast-sized label table joins back to the
    corpus without shuffling it when components are few."""
    comp = connected_components(
        pairs, src=src, dst=dst, max_iterations=max_iterations
    ).withColumnRenamed("node", id_col)
    out = df.select(id_col).join(comp, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
    ).withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
