"""Corpus-level duplicate-line removal — the C4 dedup step.

C4 (Raffel et al., arXiv:1910.10683 §2.2) removes every occurrence but the
FIRST of any three-sentence span repeated across the whole corpus; the
widely-used variant (ccnet, Dolma) does it per line/paragraph. This module
implements the line-grain variant over an arbitrary separator: an
occurrence of a line survives iff it is the corpus-wide first occurrence
under the total order (id, position).

Beyond-reference: the pipelines in `/root/reference` stop at per-row
transforms; cross-document mutual information like this needs a shuffle
plan, which is exactly what Snowpark pushdown cannot express cheaply.

Shape at 100 TB — the skew-safe decomposition:

1. ``posexplode`` lines (map-local).
2. Winner per line = ``min(struct(id, pos))`` via ``groupBy(line)`` — a
   PARTIAL-AGGREGATED reduction, so a boilerplate line duplicated 10^9
   times collapses to one row per map task before the shuffle. The naive
   alternative (``row_number() OVER (PARTITION BY line)``) funnels every
   occurrence of the hottest line through one task's sort; the aggregation
   does not.
3. Survivors = occurrences joining their line's winner on (line, id, pos).
   The probe side still shuffles by line (AQE skew-join splits the hot
   partitions); the winner side is exactly one row per distinct line.
4. Reassemble per doc: ``collect_list(struct(pos, line))`` → sort →
   ``concat_ws`` — bounded by the document length, keyed on the unique id.

Docs whose every line was claimed elsewhere survive with empty text (the
caller decides whether to drop them); null text reads as empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["remove_duplicate_lines", "chunk_words_as_lines"]


def chunk_words_as_lines(text_col: str, words_per_line: int, sep: str = "\n"):
    """Re-chunk whitespace tokens into fixed-width pseudo-lines (for
    corpora without natural line breaks). Pure JVM expression."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    k = words_per_line
    lines = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(toks) + (k - 1)) / k).cast("int") - 1),
        lambda j: F.concat_ws(" ", F.slice(toks, j * k + 1, k)),
    )
    return F.concat_ws(sep, lines)


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    sep: str = "\n",
    out_col: str | None = None,
    drop_empty: bool = False,
    min_chars: int = 1,
) -> DataFrame:
    """Keep only the corpus-wide FIRST occurrence of every line.

    First = minimal (id, position) over the whole corpus; deterministic
    for any orderable id. Lines shorter than ``min_chars`` (default:
    empty lines, i.e. paragraph breaks) bypass dedup and always survive.
    Returns the input columns with ``out_col`` (default: ``text_col``
    replaced) holding the surviving lines re-joined by ``sep``;
    ``n_lines_kept`` / ``n_lines_dropped`` count the change. With
    ``drop_empty=True`` docs that lost every line are removed. Note
    ``sep`` is a regex for the split and a literal for the re-join —
    identical for the plain ``"\\n"`` default.
    """
    out_col = out_col or text_col
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), sep)).alias(
            "__pos", "__line"
        ),
    )
    eligible = F.length(F.col("__line")) >= min_chars
    winners = lines.where(eligible).groupBy("__line").agg(
        F.min(F.struct("__id", "__pos")).alias("__w")
    )
    kept = (
        lines.join(winners, "__line", "left")
        .where(
            (~eligible)
            | ((F.col("__id") == F.col("__w.__id")) & (F.col("__pos") == F.col("__w.__pos")))
        )
        .select("__id", "__pos", "__line")
    )
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias("__out"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    n_in = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), sep))
    out = (
        df.withColumn("__n_in", n_in)
        .join(rebuilt, F.col(id_col) == F.col("__id"), "left")
        .withColumn(out_col, F.coalesce(F.col("__out"), F.lit("")))
        .withColumn("n_lines_kept", F.coalesce(F.col("n_lines_kept"), F.lit(0)))
        .withColumn("n_lines_dropped", F.col("__n_in") - F.col("n_lines_kept"))
        .drop("__id", "__out", "__n_in")
    )
    if drop_empty:
        out = out.where(F.col("n_lines_kept") > 0)
    return out
