"""URL/domain extraction + blocklist filtering (`operators/urls.py`)."""

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.urls import (
    extract_domains,
    flag_blocklisted_domains,
)


def _docs(spark):
    rows = [
        (1, "intro https://www.Ads.Tracker.COM/path?q=1 outro"),
        (2, "see http://news.example.org/a and https://news.example.org/b"),
        (3, "plain text, no links at all"),
        (4, "bare www.nohttp.com is not a URL; ftp://old.scheme.net either"),
        (5, "multi http://a.com http://b.co.uk https://www.a.com/x"),
        (6, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_extract_domains_normalizes_and_dedups(spark):
    got = {
        r["doc_id"]: (None if r["domains"] is None else sorted(r["domains"]))
        for r in extract_domains(_docs(spark)).collect()
    }
    assert got[1] == ["ads.tracker.com"]  # lowercased, www. stripped
    assert got[2] == ["news.example.org"]  # distinct across two URLs
    assert got[3] == []
    assert got[4] == []  # no scheme / wrong scheme -> no match
    assert got[5] == ["a.com", "b.co.uk"]  # www.a.com collapses into a.com
    assert got[6] is None  # null text -> null array (SQL semantics)


def test_flag_exact_match_only(spark):
    out = flag_blocklisted_domains(_docs(spark), "doc_id", ["tracker.com", "a.com"])
    got = {r["doc_id"]: r["blocklisted"] for r in out.collect()}
    # exact mode: ads.tracker.com does NOT match blocklist entry tracker.com
    assert got == {1: False, 2: False, 3: False, 4: False, 5: True, 6: False}


def test_flag_subdomains(spark):
    out = flag_blocklisted_domains(
        _docs(spark), "doc_id", ["tracker.com"], include_subdomains=True
    )
    got = {r["doc_id"]: r["blocklisted"] for r in out.collect()}
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False, 6: False}
    # but never a bare-TLD match: blocklisting 'com' must hit nothing
    # (suffix chains stop at 2 labels)
    out2 = flag_blocklisted_domains(
        _docs(spark), "doc_id", ["com"], include_subdomains=True
    )
    assert not any(r["blocklisted"] for r in out2.collect())


def test_drop_action_and_blocklist_df(spark):
    block = spark.createDataFrame([("NEWS.example.org",), (None,)], ["dom"])
    out = flag_blocklisted_domains(_docs(spark), "doc_id", block, action="drop")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4, 5, 6]
    assert "blocklisted" not in out.columns
    with pytest.raises(ValueError, match="action"):
        flag_blocklisted_domains(_docs(spark), "doc_id", ["x.com"], action="nuke")


def test_schema_and_row_preservation(spark):
    """Flag mode must keep every input row and column exactly once."""
    docs = _docs(spark).withColumn("extra", F.lit("k"))
    out = flag_blocklisted_domains(docs, "doc_id", ["a.com"])
    assert out.columns == ["doc_id", "text", "extra", "blocklisted"]
    assert out.count() == docs.count()


def test_blocklist_broadcast_plan(spark):
    """The curated-blocklist semi-join must be broadcast (map-side); the
    hit-id join-back must NOT be force-broadcast."""
    out = flag_blocklisted_domains(
        _docs(spark), "doc_id", ["tracker.com"], include_subdomains=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
