"""URL / domain hygiene — extraction and blocklist filtering.

The C4 pipeline (Raffel et al., arXiv:1910.10683 §2.2) removes every page
sourced from a curated blocklist of domains before any text-level
filtering; Dolma and RefinedWeb keep the same step. The reference
pipelines stop at per-row casts (tt-dps-pipeline-rest/src/main/scala/com/
griddynamics/pipeline/IngestOrdersFromRawToFlat.scala:44-66), so this is
beyond-reference — part of the training-data operator family the brief
asks for.

Two operators:

* **extract_domains** — per-document array of normalized (lowercased,
  ``www.``-stripped) registrable hostnames found in http(s) URLs inside
  the text. Pure JVM ``regexp_extract_all`` over a pattern deliberately
  valid in BOTH Java regex and RE2 so the DuckDB oracle replays it
  verbatim (no lookaround, no backreferences).

* **flag_blocklisted_domains** — mark (or drop) documents mentioning any
  blocklisted domain. Plan shape at 100 TB: the per-doc DISTINCT domain
  list explodes (bounded by URLs-per-doc, not corpus size), the blocklist
  — thousands of rows, never corpus-sized — BROADCASTs into a map-side
  LEFT SEMI join, and the hit ids join back un-hinted (AQE broadcasts
  the usual sliver; a pathological all-matching blocklist degrades to a
  plain shuffled join instead of an OOM). With
  ``include_subdomains=True`` the semi-join key is the exploded suffix
  chain of each hostname (``a.b.c.com`` → ``a.b.c.com``, ``b.c.com``,
  ``c.com``), still bounded per URL, so ``ads.tracker.com`` matches a
  blocklist entry ``tracker.com`` without any prefix-match join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["URL_DOMAIN_PATTERN", "extract_domains", "flag_blocklisted_domains"]

# Group 1 = hostname. Valid in Java regex AND RE2 (oracle replays it):
# character classes and a capture group only.
URL_DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def _normalize(host: Column) -> Column:
    h = F.lower(host)
    return F.when(h.startswith("www."), F.substring(h, 5, 2**30)).otherwise(h)


def domains_expr(text: Column) -> Column:
    """Distinct normalized domains in ``text`` (array<string>, no nulls)."""
    return F.array_distinct(
        F.transform(
            F.regexp_extract_all(text, F.lit(URL_DOMAIN_PATTERN), F.lit(1)),
            _normalize,
        )
    )


def extract_domains(
    df: DataFrame, text_col: str = "text", out_col: str = "domains"
) -> DataFrame:
    """Append the distinct normalized domain list per document (map-only)."""
    return df.withColumn(out_col, domains_expr(F.col(text_col)))


def _suffixes(domain: Column) -> Column:
    """All dot-suffix chains of a hostname down to 2 labels (a single-label
    host yields itself): ``a.b.c.com`` -> [``a.b.c.com``, ``b.c.com``,
    ``c.com``]."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(".", F.slice(parts, i, n)),
    )


def flag_blocklisted_domains(
    df: DataFrame,
    id_col: str,
    blocklist: DataFrame | Sequence[str],
    text_col: str = "text",
    flag_col: str = "blocklisted",
    include_subdomains: bool = False,
    action: str = "flag",
) -> DataFrame:
    """Flag (``action="flag"``) or drop (``action="drop"``) documents whose
    text contains a URL on a blocklisted domain.

    ``blocklist`` is a single-column DataFrame or a plain sequence of
    domain strings (matched after the same normalization extraction
    applies). The blocklist side always broadcasts — it is a curated list,
    never corpus-sized.
    """
    if action not in ("flag", "drop"):
        raise ValueError(f"action must be 'flag' or 'drop', got {action!r}")
    spark = df.sparkSession
    if isinstance(blocklist, DataFrame):
        bcol = blocklist.columns[0]
        block = blocklist.select(_normalize(F.col(bcol)).alias("__bad"))
    else:
        block = spark.createDataFrame(
            [(d,) for d in blocklist], "d: string"
        ).select(_normalize(F.col("d")).alias("__bad"))
    block = block.where(F.col("__bad").isNotNull()).distinct()

    doms = df.select(
        F.col(id_col).alias("__id"),
        F.explode(domains_expr(F.col(text_col))).alias("__dom"),
    )
    key = (
        doms.select("__id", F.explode(_suffixes(F.col("__dom"))).alias("__bad"))
        if include_subdomains
        else doms.withColumnRenamed("__dom", "__bad")
    )
    hits = (
        key.join(F.broadcast(block), "__bad", "left_semi").select("__id").distinct()
    )
    # join-back deliberately UN-hinted: hit ids are usually a sliver (AQE
    # broadcasts them), but a pathological blocklist can match most of the
    # corpus — forcing broadcast there would OOM the driver at scale
    flagged = df.join(
        hits.withColumn("__hit", F.lit(True)),
        F.col(id_col) == F.col("__id"),
        "left",
    ).withColumn(flag_col, F.coalesce(F.col("__hit"), F.lit(False))).drop(
        "__id", "__hit"
    )
    if action == "drop":
        return flagged.where(~F.col(flag_col)).drop(flag_col)
    return flagged
