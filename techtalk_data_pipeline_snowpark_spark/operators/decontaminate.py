"""Benchmark decontamination — n-gram overlap between a training corpus
and a held-out/benchmark set.

The standard pre-training hygiene step (C4/Dolma-style): a training
document that shares any word n-gram with a benchmark document leaks the
benchmark into the training set and must be flagged or dropped. Part of
the beyond-reference training-data family (the reference pipelines in
`/root/reference` stop at per-row transforms).

Shape at 100 TB: the training side explodes to one row per distinct
n-gram — large but map-local; the benchmark side is small by construction
(benchmarks are thousands of documents, not billions), so its distinct
n-gram set is BROADCAST and the contamination probe is a map-side
left-semi join. No big-side shuffle at all: explode → broadcast-semi →
distinct on doc_id (the only shuffle, keyed on the already-unique id).
When the "benchmark" is genuinely large, pass ``broadcast_bench=False``
and the semi join becomes a plain shuffled hash join on the gram key —
uniform by construction (grams are near-unique), so no skew handling is
needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from techtalk_data_pipeline_snowpark_spark.operators.dedup import word_shingles

__all__ = ["contaminated_ids", "flag_contaminated", "decontaminate"]


def contaminated_ids(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    bench_text_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Distinct ids of training docs sharing ≥1 word n-gram with bench."""
    grams_t = train.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    )
    grams_b = bench.select(
        F.explode(word_shingles(bench_text_col or text_col, n)).alias("gram")
    ).distinct()
    if broadcast_bench:
        grams_b = F.broadcast(grams_b)
    return grams_t.join(grams_b, "gram", "left_semi").select(id_col).distinct()


def flag_contaminated(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    flag_col: str = "contaminated",
    **kw,
) -> DataFrame:
    """Every training row, stamped with a boolean contamination flag."""
    hits = contaminated_ids(train, bench, id_col, text_col, n, **kw).withColumn(
        flag_col, F.lit(True)
    )
    return train.join(hits, id_col, "left").withColumn(
        flag_col, F.coalesce(F.col(flag_col), F.lit(False))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    **kw,
) -> DataFrame:
    """Training rows with contaminated documents removed (left-anti)."""
    hits = contaminated_ids(train, bench, id_col, text_col, n, **kw)
    return train.join(hits, id_col, "left_anti")
