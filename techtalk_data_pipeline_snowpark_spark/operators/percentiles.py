"""Exact distributed percentiles — percentile_disc without a global sort.

Corpus profiling (doc-length cutoffs, token-budget planning, outlier
thresholds) wants EXACT discrete percentiles, not `approx_percentile`'s
±ε answers. The textbook plans both die at 10^10 rows: `sort + limit`
funnels everything through one ordered shuffle, and a global
`row_number()` window is a single partition by construction.

This operator computes exact percentile_disc for any list of fractions in
three bounded distributed steps (beyond-reference; the reference pipelines
never aggregate — e.g. tt-dps-pipeline-rest/src/main/scala/com/
griddynamics/pipeline/IngestOrdersFromRawToFlat.scala:44-66 is row-wise):

1. **Collapse to distinct values**: ``groupBy(value).count()`` — partial
   aggregation collapses duplicates map-side, so the shuffle carries one
   row per distinct value per task, not one per row.
2. **Distributed prefix sum over the distinct values** (the same
   two-phase scheme as `sharding.pack_shards`): range-repartition by
   value (RangePartitioner: partition order == global value order),
   per-partition running counts via a partition-LOCAL window, plus a
   ≤num_partitions-row collected offset map. No global-sort partition
   anywhere; ``n`` = the offsets' total, no extra pass.
3. **One final aggregate**: for each requested fraction p the answer is
   the smallest value whose inclusive cumulative count ≥ ceil(p·n) —
   ``min(when(cum >= rank_p, value))`` per p, all fractions in a single
   partial-aggregated pass.

Definition (matches the oracle's explicit-rank SQL, engine-neutral):
``percentile_disc(p) = min{ v : |{x ≤ v}| ≥ ceil(p·n) }`` with p in
(0, 1]; nulls are excluded SQL-style, float NaN is rejected loudly (NaN
sorts above +inf in Spark but below nothing in portable SQL — no silent
cross-engine divergence).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

__all__ = ["exact_percentiles", "exact_percentiles_by_group"]


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    fractions: Sequence[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact discrete percentiles of ``value_col`` at each fraction.

    Returns a DataFrame ``(p: double, value)`` with one row per requested
    fraction (input order not guaranteed — order by ``p``). Empty input
    (or all-null) yields zero rows.
    """
    fr = [float(p) for p in fractions]
    if not fr:
        raise ValueError("fractions must be non-empty")
    for p in fr:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"fractions must be in (0, 1], got {p}")

    vals = df.select(F.col(value_col).alias("__v")).where(F.col("__v").isNotNull())
    if isinstance(vals.schema["__v"].dataType, (T.FloatType, T.DoubleType)):
        # fail loudly rather than return an engine-specific NaN ordering
        vals = vals.withColumn(
            "__v",
            F.when(
                F.isnan("__v"),
                F.raise_error(F.lit("exact_percentiles: NaN in " + value_col)),
            ).otherwise(F.col("__v")),
        )

    n_parts = num_partitions or vals.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    counts = vals.groupBy("__v").agg(F.count(F.lit(1)).alias("__c"))
    # eager localCheckpoint pins the sampled range boundaries for both
    # passes and leaves no CacheManager entry behind (same rationale as
    # sharding.pack_shards)
    ranged = (
        counts.repartitionByRange(int(n_parts), F.col("__v"))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid").agg(F.sum("__c").alias("t")).collect()
    }
    n = int(sum(totals.values()))
    if n == 0:
        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("p", T.DoubleType()),
                    T.StructField("value", vals.schema["__v"].dataType),
                ]
            ),
        )
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])
    pairs = []
    for pid, off in offsets.items():
        pairs.extend([F.lit(pid), F.lit(off)])
    w = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.element_at(F.create_map(*pairs), F.col("__pid")) + F.sum("__c").over(w)
    with_cum = ranged.withColumn("__cum", cum)
    aggs = [
        F.min(F.when(F.col("__cum") >= F.lit(math.ceil(p * n)), F.col("__v"))).alias(
            f"__q{i}"
        )
        for i, p in enumerate(fr)
    ]
    row = with_cum.agg(*aggs)
    parts = [
        row.select(F.lit(p).cast("double").alias("p"), F.col(f"__q{i}").alias("value"))
        for i, p in enumerate(fr)
    ]
    out = parts[0]
    for nxt in parts[1:]:
        out = out.unionAll(nxt)
    return out


def exact_percentiles_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    fractions: Sequence[float],
) -> DataFrame:
    """Exact discrete percentiles of ``value_col`` PER GROUP (one row per
    group × fraction; groups whose values are all null are absent).

    Scale shape differs from the global case: the per-group window is
    already parallel across groups, and after the distinct-value collapse
    it sorts **distinct values per group** — bounded by value cardinality,
    not row count — so the global prefix-sum machinery isn't needed. One
    shuffle on the group key carries (group, distinct value, count) rows;
    the hottest group costs O(its distinct values log same), never O(its
    rows). All fractions ride one pass as conditional aggregates.
    """
    fr = [float(p) for p in fractions]
    if not fr:
        raise ValueError("fractions must be non-empty")
    for p in fr:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"fractions must be in (0, 1], got {p}")
    gcols = [F.col(c) for c in group_cols]
    vals = df.select(*gcols, F.col(value_col).alias("__v")).where(
        F.col("__v").isNotNull()
    )
    if isinstance(vals.schema["__v"].dataType, (T.FloatType, T.DoubleType)):
        vals = vals.withColumn(
            "__v",
            F.when(
                F.isnan("__v"),
                F.raise_error(F.lit("exact_percentiles: NaN in " + value_col)),
            ).otherwise(F.col("__v")),
        )
    counts = vals.groupBy(*group_cols, "__v").agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    ranked = counts.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wall)
    )
    # per fraction: the first distinct value whose inclusive cum ≥ ceil(p·n);
    # ALL fractions as conditional aggregates of ONE pass over the windowed
    # rows (partial-aggregated), then a per-group-row unpivot (cheap: one
    # row per group by then)
    agged = ranked.groupBy(*group_cols).agg(
        *[
            F.min(
                F.when(
                    F.col("__cum") >= F.ceil(F.lit(p) * F.col("__n")), F.col("__v")
                )
            ).alias(f"__q{i}")
            for i, p in enumerate(fr)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(p).cast("double").alias("p"), F.col(f"__q{i}").alias("value")
            )
            for i, p in enumerate(fr)
        ]
    )
    return agged.select(*group_cols, F.explode(pairs).alias("__pv")).select(
        *group_cols, F.col("__pv.p").alias("p"), F.col("__pv.value").alias("value")
    )
