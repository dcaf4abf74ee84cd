"""Corpus vocabulary + coverage scoring (CCNet-style quality signal).

CCNet/RefinedWeb bucket documents by how well their tokens are covered by
a reference vocabulary built from the corpus itself (the cheap stand-in
for LM perplexity when no model is available). Two passes, both
Spark-first:

* **top_vocabulary** — global token counts (one partial-agg'd shuffle:
  map-side combine collapses each partition's repeats, so the exchange
  carries distinct-tokens-per-partition rows, not occurrences) followed by
  a rank-based top-V cut via ``orderBy().limit(V)`` — Spark compiles that
  to TakeOrderedAndProject: each task keeps a local V-row heap and the
  driver merges P·V rows, never a global sort. The (count desc, token asc)
  order is total, so the cut is deterministic and exactly mirrored in SQL.
  For a threshold-based vocabulary (``count > f·n``) use
  ``operators/heavyhitters.frequent_values``, which avoids even the
  long-tail shuffle.

* **vocab_coverage** — score every document by the fraction of its token
  OCCURRENCES that fall inside the vocabulary. The ≤V-row vocab broadcasts
  into a left-semi join against the exploded tokens (map-side, no big-side
  shuffle); the per-doc count partial-aggregates to ~1 row per (doc,
  partition) before its exchange. Output stays hash-exact across engines:
  integer counts plus ONE double division (same ints → same IEEE double),
  never a float sum whose order could drift.

Empty tokens (from empty/whitespace-only text) are filtered on both sides
so ``''`` can neither enter the vocabulary nor count as an occurrence.
Beyond-reference family (the reference pipelines in `/root/reference`
stop at per-row transforms); oracle-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["top_vocabulary", "vocab_coverage"]


def _tokens(text_col: str) -> Column:
    """Lowered whitespace tokens with empties removed — shared by vocab
    build, coverage scoring, and the DuckDB oracles (list_filter over
    regexp_split_to_array)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def top_vocabulary(df: DataFrame, text_col: str, size: int) -> DataFrame:
    """The corpus's ``size`` most frequent tokens: (token, cnt), cut by the
    total order (cnt desc, token asc)."""
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    occ = df.select(F.explode(_tokens(text_col)).alias("token"))
    counts = occ.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(size)


def vocab_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 1000,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, in_vocab_tokens, coverage) per document.

    ``coverage`` = in-vocabulary token occurrences / total tokens (NULL for
    token-less docs). Pass a prebuilt single-column ``vocab`` DataFrame
    (column ``token``) to score against a frozen vocabulary — the
    incremental shape, where the vocab is built once on the reference
    corpus and new batches are scored against it."""
    if vocab is None:
        vocab = top_vocabulary(df, text_col, vocab_size).select("token")
    else:
        vocab = vocab.select("token")
    toks = df.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    occ = toks.select(F.col(id_col), F.explode("__toks").alias("token"))
    inv = (
        occ.join(F.broadcast(vocab), "token", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("in_vocab_tokens"))
    )
    totals = toks.select(F.col(id_col), F.size("__toks").cast("long").alias("n_tokens"))
    joined = totals.join(inv, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.coalesce(F.col("in_vocab_tokens"), F.lit(0)).cast("long").alias("in_vocab_tokens"),
    )
    return joined.select(
        id_col,
        "n_tokens",
        "in_vocab_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.col("in_vocab_tokens").cast("double") / F.col("n_tokens").cast("double"),
        ).alias("coverage"),
    )
