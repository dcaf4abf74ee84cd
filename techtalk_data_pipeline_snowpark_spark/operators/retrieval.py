"""Lexical retrieval + term weighting: TF-IDF and BM25 over a corpus.

The lexical counterpart of `similarity.py`'s embedding search — the other
half of a hybrid retrieval stack, and the classic corpus-analysis signal
(keyword extraction via per-document top TF-IDF terms). The reference has
no retrieval surface (it compiles pipelines to Snowflake SQL and leaves
search to the warehouse); these operators are beyond-reference additions
for the training-data use case: surfacing what a document is "about"
(tfidf_top_terms) and pulling the top-k documents for a query without an
embedding model in the loop (bm25_topk).

Formulas (public, standard):
- TF-IDF (sklearn-style smooth idf): ``tf * (ln((N+1)/(df+1)) + 1)``
- BM25 (Lucene/Robertson): ``sum_t idf_t * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
  with ``idf_t = ln(1 + (N-df+0.5)/(df+0.5))``, distinct query terms.

Scale posture:
- One explode → partial-agg'd groupBy(doc, term) produces the tf table;
  the (doc, term) key is uniform by construction (docs are unique, terms
  bounded per doc) — no skew.
- BM25 filters the exploded stream to the query's term set BEFORE any
  aggregation (an `isin` literal pushed to the scan side), so only
  matching occurrences ever shuffle; per-term document frequencies for a
  ≤|query|-row side broadcast back.
- Corpus scalars (N, avgdl) ride a broadcast one-row crossJoin — they
  stay in the plan, nothing collects to the driver.
- Global top-k uses orderBy+limit — Spark's TakeOrderedAndProject, a
  map-side partial top-k with no full sort. Per-doc term ranking windows
  partition by doc_id (uniform, bounded rows per partition).
- Scores round to 6 decimals BEFORE ranking in both engines so ranks are
  cross-engine deterministic (the house cosine/kmeans convention).

All doubles here come from ln/division — rounded to 6 the values are
exact SQL twins, so both entries carry full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .vocab import _tokens

__all__ = ["doc_term_freqs", "tfidf_top_terms", "bm25_topk", "rrf_fuse"]


def doc_term_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id_col, term, tf, dl) per distinct document term: one explode and
    one partial-agg'd shuffle on the uniform (doc, term) key. ``dl``
    (document length in tokens) is computed before the explode and carried
    through the aggregation (``max`` — constant within the group)."""
    if id_col in ("term", "tf", "dl"):
        raise ValueError(f"id_col collides with an output column: {id_col}")
    toks = _tokens(text_col)
    # spread the tokenize+explode across all cores (the minhash-signature
    # rebalance): a small input (one parquet file → one partition) would
    # otherwise pin the whole stage to a single task; at corpus scale the
    # input arrives many-partitioned and this is a cheap rebalance.
    src = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    occ = src.select(
        F.col(id_col),
        F.size(toks).alias("_dl"),
        F.explode(toks).alias("term"),
    )
    return occ.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("_dl").alias("dl")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 3
) -> DataFrame:
    """Per-document top-``top_n`` terms by smooth TF-IDF:
    (id, term, tfidf, rank), ranked by (tfidf desc, term asc) on the
    ROUNDED score.

    Plan: tf table (one shuffle), document frequencies from it (partial
    agg on term), join back on term (co-keyed), corpus size via a
    broadcast one-row crossJoin, then a per-doc row_number window —
    partitioned by doc_id, so each task holds one document's distinct
    terms (bounded by document length), never a global sort."""
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    ranked, tf = _tfidf_ranked(df, id_col, text_col, top_n)
    try:
        # materialize eagerly (output is docs × top_n rows) so the
        # persisted tf barrier can be released here rather than leaking
        # block-store state for the session — the minhash_lsh_candidates
        # release pattern.
        return ranked.localCheckpoint(eager=True)
    finally:
        tf.unpersist()


def _tfidf_ranked(df, id_col, text_col, top_n):
    """Lazy TF-IDF plan: (ranked frame, persisted tf barrier). The tf
    persist is load-bearing (the minhash-signature convention): tf feeds
    BOTH the score projection and the document-frequency aggregation —
    without it the corpus explode + (doc, term) shuffle run twice. At
    corpus scale this is the persisted term-frequency table a lexical
    index keeps anyway."""
    from pyspark import StorageLevel

    tf = doc_term_freqs(df, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_n
    )
    return ranked, tf


def bm25_topk(
    df: DataFrame,
    query: str,
    id_col: str,
    text_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25: (id, score, rank),
    ordered by (score desc, id asc) on the ROUNDED score. Documents
    sharing no term with the query never enter the ranking (standard
    BM25 — their score is 0).

    The query tokenizes driver-side (it is a plain string); DISTINCT
    query terms each contribute once. The exploded corpus stream filters
    to those terms before aggregating, per-term document frequencies
    (≤ |query terms| rows) broadcast back, corpus N/avgdl ride a second
    broadcast one-row crossJoin, and the final cut is orderBy+limit —
    TakeOrderedAndProject, a map-side partial top-k."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    terms = sorted({t for t in query.strip().lower().split() if t})
    if not terms:
        raise ValueError("query must contain at least one token")
    ranked, tf = _bm25_ranked(df, terms, id_col, text_col, k, k1, b)
    try:
        # ≤ k rows: materialize eagerly and release the tf barrier (the
        # minhash_lsh_candidates release pattern — no leaked cache).
        return ranked.localCheckpoint(eager=True)
    finally:
        tf.unpersist()


def _bm25_ranked(df, terms, id_col, text_col, k, k1, b):
    """Lazy BM25 plan: (ranked frame, persisted tf barrier). The
    query-filtered tf (≤ |docs|·|terms| rows, tiny) feeds both the score
    and the per-term document frequencies; without the barrier the
    full-corpus explode runs twice just to re-filter to the query's
    terms."""
    from pyspark import StorageLevel

    tf = (
        doc_term_freqs(df, id_col, text_col)
        .where(F.col("term").isin(terms))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    stats = df.select(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.size(_tokens(text_col))).alias("_avgdl"),
    )
    idf = F.log(
        1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)), tf


def rrf_fuse(
    lists: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k_const: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher): fuse N ranked
    lists into one by ``sum_i 1/(k_const + rank_i)``, items missing from
    a list contributing 0 for it. The standard hybrid-search combiner —
    score scales never need calibrating because only ranks enter.

    Output: (id, rank_0..rank_{N-1} nullable, rrf, rank), ordered by
    (rrf desc, id asc) on the 9-decimal-rounded fusion (IEEE division of
    small ints — an exact cross-engine value).

    Scale: inputs are top-k lists (≤ k rows each) — the full-outer join
    chain and the final window are metadata-sized no matter the corpus."""
    if len(lists) < 2:
        raise ValueError(f"rrf_fuse needs at least 2 lists, got {len(lists)}")
    if k_const <= 0 or top <= 0:
        raise ValueError("k_const and top must be positive")
    sides = [
        df.select(F.col(id_col), F.col(rank_col).alias(f"rank_{i}"))
        for i, df in enumerate(lists)
    ]
    joined = sides[0]
    for s in sides[1:]:
        joined = joined.join(s, id_col, "full_outer")
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k_const)) + F.col(f"rank_{i}")),
            F.lit(0.0),
        )
        for i in range(len(sides))
    ]
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    fused = joined.withColumn("rrf", F.round(score, 9))
    cut = fused.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(top)
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return cut.withColumn("rank", F.row_number().over(w))
