"""Training-corpus quality & hygiene — Gopher-style repetition stats and
PII redaction.

Two pre-training hygiene steps every large-scale text pipeline runs
(beyond-reference: the reference pipelines stop at per-row transforms —
tt-dps-pipeline-rest/src/main/scala/com/griddynamics/pipeline/
IngestOrdersFromRawToFlat.scala:44-66 is a flatten/cast, never a
cross-document or intra-document statistical measure):

* **Repetition stats** (Rae et al., Gopher, arXiv:2112.11446 §A1.1):
  per-document duplicate-token / top-2-gram / duplicate-3-gram measures.
  Documents dominated by a few repeated phrases are boilerplate and get
  filtered before training.
* **PII redaction**: regex scrub of emails / IPv4 addresses / phone-like
  digit runs to placeholder tags, with per-document match counts.

Shape at 100 TB: both are MAP-ONLY — pure JVM expressions (higher-order
array functions and `regexp_replace`) inside whole-stage codegen, zero
shuffle, zero Python. The per-document n-gram counting deliberately does
NOT explode: every document's grams live in one array cell and the
duplicate accounting runs as an `aggregate` lambda over the SORTED gram
array (run-length encoding in an O(1) struct accumulator), so a 10^10-row
corpus never pays a (doc, gram)-keyed shuffle just to count within-row
duplicates. All emitted measures are exact INTEGERS; thresholds compare in
integer arithmetic (``top2 * 5 > n`` ≡ frac > 0.2) so cross-engine float
drift cannot exist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["repetition_stats", "redact_pii", "PII_PATTERNS"]


def _tokens(col: Column) -> Column:
    # null text reads as empty: Spark's null-swallowing higher-order
    # builtins (greatest, concat_ws) would otherwise mix null and
    # non-null stats for the same document
    return F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"\s+")


def _grams(toks: Column, k: int) -> Column:
    """Non-distinct k-gram array (same partial-tail convention as
    `dedup.word_shingles`: shorter-than-k texts yield one short gram)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )


def _max_run(arr_sorted: Column) -> Column:
    """Length of the longest run of equal adjacent elements — i.e. the
    occurrence count of the most frequent element. O(1) lambda state."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    return F.aggregate(
        arr_sorted,
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _dup_occurrences(arr_sorted: Column) -> Column:
    """Number of elements whose value occurs >= 2 times (counting every
    occurrence) — the numerator of Gopher's duplicate-n-gram fraction."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("dup"),
    )
    flush = lambda acc: acc["dup"] + F.when(acc["run"] >= 2, acc["run"]).otherwise(
        F.lit(0)
    )
    return F.aggregate(
        arr_sorted,
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.when(x.eqNullSafe(acc["prev"]), acc["dup"]).otherwise(flush(acc)).alias(
                "dup"
            ),
        ),
        flush,
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append exact integer repetition measures per document.

    Added columns:
      n_tokens, n_distinct_tokens           — whitespace tokens
      n_2grams, top_2gram_count             — most frequent 2-gram's count
      n_3grams, dup_3gram_count             — occurrences of repeated 3-grams
      repetitive (boolean)                  — Gopher-ish flag, integer math:
          top_2gram_count * 5 > n_2grams  (top-2-gram frac > 0.20)
          OR dup_3gram_count * 2 > n_3grams (dup-3-gram frac > 0.50)

    Map-only: no shuffle, no Python, no explode (tests assert plan shape).
    Null text is treated as empty text (single empty token).
    """
    toks = _tokens(F.col(text_col))
    g2 = F.array_sort(_grams(toks, 2))
    g3 = F.array_sort(_grams(toks, 3))
    out = (
        df.withColumn("__toks", toks)
        .withColumn("n_tokens", F.size(F.col("__toks")))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(F.col("__toks"))))
        .withColumn("__g2", g2)
        .withColumn("__g3", g3)
        .withColumn("n_2grams", F.size(F.col("__g2")))
        .withColumn("top_2gram_count", _max_run(F.col("__g2")))
        .withColumn("n_3grams", F.size(F.col("__g3")))
        .withColumn("dup_3gram_count", _dup_occurrences(F.col("__g3")))
        .drop("__toks", "__g2", "__g3")
    )
    return out.withColumn(
        "repetitive",
        (F.col("top_2gram_count") * 5 > F.col("n_2grams"))
        | (F.col("dup_3gram_count") * 2 > F.col("n_3grams")),
    )


# --------------------------------------------------------------- PII scrub

# Deliberately simple patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB) so the oracle can replay them verbatim: no lookaround, no
# backreferences, \b supported by both.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Replace each PII kind with ``<KIND>`` and count matches per doc.

    Adds ``{out_col}`` (redacted text) and one integer ``n_{kind}`` column
    per kind. Counting happens BEFORE redaction of that kind (kinds are
    applied in the given order, so an email's host never double-counts as
    an IP unless it textually survives earlier passes). Pure
    `regexp_replace` / `regexp_count` — map-only JVM, zero Python.
    """
    out_col = out_col or text_col
    cur: Column = F.col(text_col)
    counts: list[tuple[str, Column]] = []
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        counts.append((f"n_{kind}", F.regexp_count(cur, F.lit(pat))))
        cur = F.regexp_replace(cur, pat, f"<{kind.upper()}>")
    out = df
    for name, c in counts:
        out = out.withColumn(name, c)
    return out.withColumn(out_col, cur)
