"""DSIR-style importance resampling — select raw docs that look like a
target corpus.

The published method (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): featurize every document as hashed
n-gram counts over B buckets, fit two smoothed bag-of-words models —
p̂_target on a small trusted corpus, p̂_raw on the big raw corpus — and
resample raw documents with probability proportional to the importance
weight w(x) = p̂_target(x)/p̂_raw(x). It is the standard cheap stand-in
for LM-perplexity filtering when curating pre-training data, and the
missing half next to this repo's vocab-coverage score (CCNet-shaped).

Spark-first shape, and why it holds at 100 TB:

- featurization is ONE explode over lowered whitespace tokens + their
  bigrams, mapped to ``conv(md5-prefix) % B`` buckets — pure JVM
  expressions, no Python anywhere;
- both corpus models are partial-aggregated bucket counts (≤ B rows
  each after the map-side combine);
- the per-bucket log-ratio table is ≤ B rows and BROADCASTS into the
  per-doc scoring join — the raw corpus never shuffles for the model;
- the per-doc log-weight is an exact DECIMAL dot product
  Σ_b count_b · ratio_b (counts are ints; the double log-ratio is
  rounded once to 9 decimals and fixed as DECIMAL), so the sum is
  order-independent — bit-identical on any partitioning, and an exact
  SQL twin (the repo's cross-engine determinism rule for sums);
- selection is Gumbel-top-k: key = logw + Gumbel(md5(id‖salt)) samples
  k docs WITHOUT replacement with probability ∝ exp(logw) — a pure
  function of (doc, salt), reproducible on any cluster size; the final
  cut is a TakeOrdered (map-side partial top-k), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sharding import _hash_prefix
from .vocab import _tokens

__all__ = [
    "bucket_log_ratios",
    "dsir_select",
    "hashed_bucket_counts",
    "ngram_features",
]


def ngram_features(text_col: str, ngram_max: int = 2) -> Column:
    """Array of unigram + bigram strings over the shared tokenization
    (vocab._tokens: lowered whitespace tokens, empties removed — change
    it there or nowhere). ``ngram_max=1`` keeps unigrams only."""
    if ngram_max not in (1, 2):
        raise ValueError(f"ngram_max must be 1 or 2, got {ngram_max}")
    toks = _tokens(text_col)
    if ngram_max == 1:
        return toks
    # sequence(2, n) DESCENDS when n < 2 — guard short docs explicitly
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(toks)),
            lambda i: F.concat_ws(" ", F.element_at(toks, i - 1), F.element_at(toks, i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucket(term: Column, num_buckets: int) -> Column:
    # sharding._hash_prefix is THE shared decision hash (its contract:
    # change it there or nowhere); here its 32 hex-prefix bits become an
    # integer bucket id — the same conv() both DuckDB oracles replay
    return F.conv(_hash_prefix(term, ""), 16, 10).cast("long") % num_buckets


def hashed_bucket_counts(
    df: DataFrame,
    text_col: str,
    num_buckets: int,
    id_col: str | None = None,
    ngram_max: int = 2,
) -> DataFrame:
    """Hashed n-gram counts: per (id, bucket) when ``id_col`` is given
    (document features), per bucket otherwise (a corpus model). Both are
    one explode + one partial-aggregated shuffle."""
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    occ = df.select(
        *( [F.col(id_col)] if id_col else [] ),
        F.explode(ngram_features(text_col, ngram_max)).alias("_term"),
    ).select(
        *( [F.col(id_col)] if id_col else [] ),
        _bucket(F.col("_term"), num_buckets).alias("bucket"),
    )
    keys = [id_col, "bucket"] if id_col else ["bucket"]
    return occ.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def bucket_log_ratios(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    num_buckets: int,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, ratio): ratio_b = ln p̂_target(b) − ln p̂_raw(b) under
    add-``alpha`` smoothing, rounded once to 9 decimals and FIXED as
    DECIMAL(22,9) so downstream dot products are exact and
    order-independent. ≤ B rows — broadcast material."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    tt = target_counts.agg(F.sum("cnt")).first()[0] or 0
    tr = raw_counts.agg(F.sum("cnt")).first()[0] or 0
    a, ab = float(alpha), float(alpha) * num_buckets
    joined = raw_counts.withColumnRenamed("cnt", "rc").join(
        target_counts.withColumnRenamed("cnt", "tc"), "bucket", "full_outer"
    )
    ratio = F.log(
        (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(a)) / F.lit(float(tt) + ab)
    ) - F.log(
        (F.coalesce(F.col("rc"), F.lit(0)) + F.lit(a)) / F.lit(float(tr) + ab)
    )
    return joined.select(
        "bucket", F.round(ratio, 9).cast("decimal(22,9)").alias("ratio")
    )


def _gumbel(ident: Column, salt: str) -> Column:
    """Gumbel(0,1) noise as a pure function of (id, salt): invert the
    32-bit uniform from the shared decision hash (sharding._hash_prefix).
    +0.5 keeps u strictly inside (0, 1)."""
    u = (
        F.conv(_hash_prefix(ident, salt), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "",
    ngram_max: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """The ``k`` raw documents Gumbel-top-k-sampled ∝ their importance
    weight toward ``target``: (id, logw, sel_key), sel_key descending.

    Docs with NO features (empty text) still carry logw = 0 (an empty
    product of likelihood ratios) and compete through their Gumbel noise
    alone — they are not silently dropped. sel_key is rounded to 6
    decimals with the id as tie-break so the cut is deterministic and
    has an exact SQL twin.

    ``materialize=True`` (default) persists the shared intermediates and
    eagerly materializes the ≤k-row result (one featurize pass per
    corpus); ``materialize=False`` returns the lazy one-shot plan for
    ``.explain()``/plan assertions and further composition."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def _plan(doc_counts: DataFrame, raw_model: DataFrame, target_model: DataFrame):
        ratios = bucket_log_ratios(target_model, raw_model, num_buckets, alpha)
        scored = (
            doc_counts.join(F.broadcast(ratios), "bucket")
            .groupBy(id_col)
            # cnt as DECIMAL(9,0): the product stays inside DECIMAL(38,·)
            # in BOTH engines (a bare BIGINT × DECIMAL(22,9) overflows
            # DuckDB's 38-digit cap and would silently fall back to DOUBLE)
            .agg(
                F.sum(F.col("cnt").cast("decimal(9,0)") * F.col("ratio")).alias("_logw")
            )
        )
        # feature-less docs: logw = 0, selected on Gumbel noise alone
        scored = raw.select(id_col).join(scored, id_col, "left").select(
            F.col(id_col),
            F.coalesce(F.col("_logw"), F.lit(0).cast("decimal(22,9)")).alias("_logw"),
        )
        key = F.round(F.col("_logw").cast("double") + _gumbel(F.col(id_col), salt), 6)
        return (
            scored.select(
                F.col(id_col),
                F.col("_logw").cast("double").alias("logw"),
                key.alias("sel_key"),
            )
            .orderBy(F.col("sel_key").desc(), F.col(id_col).asc())
            .limit(k)
        )

    doc_counts = hashed_bucket_counts(
        raw, text_col, num_buckets, id_col=id_col, ngram_max=ngram_max
    )
    raw_model = doc_counts.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    target_model = hashed_bucket_counts(
        target, text_col, num_buckets, ngram_max=ngram_max
    )
    if not materialize:
        # lazy single plan — for .explain()/plan tests; re-featurizes the
        # corpus once per consumer of doc_counts (the materialized path
        # below is the scale posture)
        return _plan(doc_counts, raw_model, target_model)

    # Persist barriers (the signatures-table convention, dedup.py): the
    # per-doc bucket counts feed BOTH the raw model and the scoring join,
    # and each model is consumed by its total (.first()) and the ratio
    # join — without them the raw corpus featurizes three times and the
    # target twice. The ≤k-row result is materialized eagerly so the
    # barriers release before returning; the final orderBy re-states the
    # (sel_key desc, id) order on the checkpointed k rows.
    from pyspark import StorageLevel

    doc_counts = doc_counts.persist(StorageLevel.MEMORY_AND_DISK)
    raw_model = doc_counts.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).persist(
        StorageLevel.MEMORY_AND_DISK
    )  # ≤ B rows
    target_model = target_model.persist(StorageLevel.MEMORY_AND_DISK)  # ≤ B rows
    try:
        out = _plan(doc_counts, raw_model, target_model).localCheckpoint(eager=True)
    finally:
        doc_counts.unpersist()
        raw_model.unpersist()
        target_model.unpersist()
    return out.orderBy(F.col("sel_key").desc(), F.col(id_col).asc())
