"""Gopher-style repetition stats + PII redaction (`operators/quality.py`)."""

import collections

from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.quality import (
    PII_PATTERNS,
    redact_pii,
    repetition_stats,
)

DOCS = [
    (1, "a b a b a b c"),
    (2, "x y z w"),
    (3, ""),
    (4, "q"),
    (5, "a a a a a a"),
    (6, "one two three four five six seven eight nine ten"),
    (7, None),
]


def _brute(t):
    toks = t.strip().lower().split() if (t or "").strip() else [""]

    def grams(k):
        n = max(len(toks) - k + 1, 1)
        return [" ".join(toks[i : i + k]) for i in range(n)]

    g2, g3 = grams(2), grams(3)
    c2, c3 = collections.Counter(g2), collections.Counter(g3)
    return (
        len(toks),
        len(set(toks)),
        len(g2),
        max(c2.values()),
        len(g3),
        sum(v for v in c3.values() if v >= 2),
    )


COLS = [
    "n_tokens",
    "n_distinct_tokens",
    "n_2grams",
    "top_2gram_count",
    "n_3grams",
    "dup_3gram_count",
]


def test_repetition_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r[c] for c in COLS) for r in repetition_stats(df).collect()}
    for did, t in DOCS:
        assert got[did] == _brute(t), (did, t)  # null text == empty text


def test_repetitive_flag_integer_thresholds(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for r in rows.values():
        exp = (r["top_2gram_count"] * 5 > r["n_2grams"]) or (
            r["dup_3gram_count"] * 2 > r["n_3grams"]
        )
        assert r["repetitive"] == exp
    assert rows[5]["repetitive"] and not rows[6]["repetitive"]


def test_repetition_is_map_only(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or a.b-c@sub.ex.org here"),
            (2, "host 10.1.2.3 and 255.255.255.0 up"),
            (3, "call 555-123-4567 or 555.123.4567"),
            (4, "clean text with an at sign @ alone and 1.2 version"),
            (5, None),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["text"] == "mail <EMAIL> or <EMAIL> here"
    assert got[2]["n_ipv4"] == 2 and got[2]["text"] == "host <IPV4> and <IPV4> up"
    assert got[3]["n_phone"] == 2 and got[3]["text"] == "call <PHONE> or <PHONE>"
    assert got[4]["text"] == "clean text with an at sign @ alone and 1.2 version"
    assert got[4]["n_email"] == got[4]["n_ipv4"] == got[4]["n_phone"] == 0
    assert got[5]["text"] is None  # null text passes through null


def test_redact_order_email_host_not_double_counted(spark):
    # after email redaction the host digits are gone, so the IP pass
    # cannot re-match inside a redacted address
    df = spark.createDataFrame([(1, "x 1.2.3.4@example.com y")], ["doc_id", "text"])
    r = redact_pii(df).collect()[0]
    assert r["n_email"] == 1 and r["n_ipv4"] == 0


def test_redact_is_map_only_jvm(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_patterns_duckdb_compatible():
    """The oracle replays the same regexes in DuckDB (RE2): every pattern
    must avoid Java-only syntax (lookaround, backreferences)."""
    for pat in PII_PATTERNS.values():
        assert "(?<" not in pat and "(?=" not in pat and "\\1" not in pat
