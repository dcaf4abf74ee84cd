"""Corpus-level duplicate-line removal (`operators/linedup.py`) — the C4
dedup step: keep only the corpus-wide first (id, pos) occurrence of every
line."""

from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.linedup import (
    chunk_words_as_lines,
    remove_duplicate_lines,
)

DOCS = [
    (1, "alpha\nbeta\n\ngamma"),
    (2, "beta\ndelta\n\nalpha"),
    (3, "delta\ndelta\nepsilon"),
    (4, ""),
    (5, None),
]


def _brute(rows, min_chars=1):
    seen = set()
    out = {}
    for did, text in sorted(rows):
        lines = (text or "").split("\n")
        kept = []
        for ln in lines:
            if len(ln) < min_chars:
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[did] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


def test_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in remove_duplicate_lines(df, "doc_id").collect()
    }
    assert got == _brute(DOCS)


def test_empty_lines_bypass_dedup(spark):
    # both docs keep their paragraph break even though "" repeats
    df = spark.createDataFrame([(1, "a\n\nb"), (2, "c\n\nd")], ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(df, "doc_id").collect()}
    assert got == {1: "a\n\nb", 2: "c\n\nd"}


def test_within_doc_duplicates_removed(spark):
    df = spark.createDataFrame([(1, "x\nx\nx\ny")], ["doc_id", "text"])
    r = remove_duplicate_lines(df, "doc_id").collect()[0]
    assert r["text"] == "x\ny" and r["n_lines_dropped"] == 2


def test_drop_empty_docs(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x")], ["doc_id", "text"])
    out = remove_duplicate_lines(df, "doc_id", drop_empty=True)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_deterministic_under_partitioning(spark):
    rows = [(i, f"line{i % 7}\nline{(i * 3) % 5}\nuniq{i}") for i in range(50)]
    df1 = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(13)
    df2 = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
    a = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(df1, "doc_id").collect()}
    b = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(df2, "doc_id").collect()}
    assert a == b == {k: v[0] for k, v in _brute(rows).items()}


def test_winner_agg_is_partial(spark):
    """The skew-load-bearing reduction (winner per line) must be a partial
    aggregation (map-side combine before the exchange), not a window sort:
    a boilerplate line duplicated 10^9 times collapses per map task."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = (
        remove_duplicate_lines(df, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_min" in plan or "partial_first" in plan
    assert "Window" not in plan


def test_chunk_words_as_lines(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h"), (2, "x"), (3, "")], ["i", "text"])
    got = {r["i"]: r["c"] for r in df.select("i", chunk_words_as_lines("text", 3).alias("c")).collect()}
    assert got[1] == "a b c\nd e f\ng h"
    assert got[2] == "x"
    assert got[3] == ""
