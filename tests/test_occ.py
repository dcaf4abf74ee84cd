"""Optimistic commit rebase (Iceberg-style retryable commits).

A writer that loses the conditional-put race reuses its already-staged
data files and retries the metadata commit against the new latest
snapshot — appends always commute; remove-carrying commits (MERGE)
rebase only when the key-partitioned bucket layout proves the racing
commits touched disjoint keys. Reference parity note: the reference
delegates all write concurrency to Snowflake's transactional MERGE
(SnowflakeUtilsOld.scala:84-109); this is the lake-format equivalent.
"""

import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import (
    ConcurrentCommitError,
    LakeTable,
    bucket_expr,
)
from techtalk_data_pipeline_snowpark_spark.lake.merge import merge_into

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)

N_BUCKETS = 8


def _mk(spark, tmp_path, ids=range(40)):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["id"], num_buckets=N_BUCKETS
    )
    t.append(_df(spark, ids))
    return t


def _df(spark, ids, v_mult=2):
    return spark.createDataFrame(
        [(int(i), int(i) * v_mult) for i in ids], SCHEMA
    )


def _ids_by_bucket(spark):
    """id → bucket under the table's layout, grouped."""
    rows = (
        spark.range(200)
        .select("id", bucket_expr(["id"], N_BUCKETS, SCHEMA).alias("b"))
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r["b"], []).append(r["id"])
    return by


def _rows(t):
    return sorted((r["id"], r["v"]) for r in t.read().collect())


# --------------------------------------------------------------- appends
def test_append_rebase_wins_lost_race(spark, tmp_path):
    t = _mk(spark, tmp_path)
    stale = t.snapshot()
    adds = t._stage_dataframe(
        _df(spark, range(100, 110)), stale.schema, N_BUCKETS, ["id"]
    )
    entry = {
        "operation": "append",
        "add": adds,
        "remove": [],
        "properties": {},
        "summary": {},
    }
    # a racing writer takes stale.version + 1 out from under us
    LakeTable(spark, t.root).append(_df(spark, range(200, 210)))
    res = t._commit_or_rebase(entry, stale, key_disjoint=False)
    assert res.summary["rebased_over"] == 1
    got = {i for i, _ in _rows(t)}
    assert set(range(40)) | set(range(100, 110)) | set(range(200, 210)) == got


def test_append_rebase_threaded_race(spark, tmp_path):
    t = _mk(spark, tmp_path, ids=range(10))
    barrier = threading.Barrier(2)
    errs = []

    def writer(lo):
        try:
            handle = LakeTable(spark, t.root)
            barrier.wait()
            handle.append(_df(spark, range(lo, lo + 10)), rebase=True)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(lo,)) for lo in (300, 400)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errs
    assert {i for i, _ in _rows(t)} == (
        set(range(10)) | set(range(300, 310)) | set(range(400, 410))
    )


def test_append_rebase_refuses_ddl_underneath(spark, tmp_path):
    t = _mk(spark, tmp_path)
    stale = t.snapshot()
    adds = t._stage_dataframe(
        _df(spark, range(100, 105)), stale.schema, N_BUCKETS, ["id"]
    )
    entry = {
        "operation": "append",
        "add": adds,
        "remove": [],
        "properties": {},
        "summary": {},
    }
    # racing overwrite carries schema — DDL, not rebase-able over
    LakeTable(spark, t.root).overwrite(_df(spark, range(5)))
    with pytest.raises(ConcurrentCommitError, match="DDL"):
        t._commit_or_rebase(entry, stale)


def test_append_rebase_refuses_property_contention(spark, tmp_path):
    t = _mk(spark, tmp_path)
    stale = t.snapshot()
    adds = t._stage_dataframe(
        _df(spark, range(100, 105)), stale.schema, N_BUCKETS, ["id"]
    )
    entry = {
        "operation": "append",
        "add": adds,
        "remove": [],
        "properties": {"cdc.last_lsn": "7"},
        "summary": {},
    }
    # the exactly-once guard: a racing commit advancing the same watermark
    # property must keep conflicting loudly (competing CDC replayers)
    LakeTable(spark, t.root).append(
        _df(spark, range(200, 205)), properties={"cdc.last_lsn": "9"}
    )
    with pytest.raises(ConcurrentCommitError, match="properties"):
        t._commit_or_rebase(entry, stale)


# ---------------------------------------------------------------- merges
def test_merge_rebase_over_disjoint_bucket_append(spark, tmp_path):
    by = _ids_by_bucket(spark)
    buckets = sorted(by)
    merge_ids = by[buckets[0]][:4]
    other_ids = [i for i in by[buckets[1]] if i >= 40][:4]
    t = _mk(spark, tmp_path)
    stale = t.snapshot()
    # racing append lands in a DIFFERENT bucket than the merge touches
    LakeTable(spark, t.root).append(_df(spark, other_ids, v_mult=5))
    res = merge_into(
        t, _df(spark, merge_ids, v_mult=9), on=["id"], snap=stale, rebase=True
    )
    assert res.summary["rebased_over"] == 1
    rows = dict(_rows(t))
    for i in merge_ids:
        assert rows[i] == i * 9  # merge applied
    for i in other_ids:
        assert rows[i] == i * 5  # racing append survived


def test_merge_rebase_refuses_overlapping_bucket(spark, tmp_path):
    by = _ids_by_bucket(spark)
    b = sorted(by)[0]
    merge_ids = by[b][:4]
    same_bucket_new = [i for i in by[b] if i >= 40][:4]
    t = _mk(spark, tmp_path)
    stale = t.snapshot()
    LakeTable(spark, t.root).append(_df(spark, same_bucket_new))
    with pytest.raises(ConcurrentCommitError, match="bucket overlap"):
        merge_into(
            t, _df(spark, merge_ids, v_mult=9), on=["id"], snap=stale, rebase=True
        )


def test_merge_rebase_refuses_racing_rewrite(spark, tmp_path):
    by = _ids_by_bucket(spark)
    merge_ids = by[sorted(by)[0]][:4]
    t = _mk(spark, tmp_path)
    t.append(_df(spark, range(40, 80)))  # second file per bucket
    stale = t.snapshot()
    # compaction rewrites every file — the merge's removes are stale
    n = LakeTable(spark, t.root).compact()
    assert n.summary.get("files_rewritten") or n.version > stale.version
    with pytest.raises(ConcurrentCommitError, match="rewrote"):
        merge_into(
            t, _df(spark, merge_ids, v_mult=9), on=["id"], snap=stale, rebase=True
        )


def test_merge_without_rebase_still_conflicts(spark, tmp_path):
    """Default behavior unchanged: the CDC engine's competing-replayer
    exactly-once relies on the loud conflict."""
    by = _ids_by_bucket(spark)
    merge_ids = by[sorted(by)[0]][:4]
    t = _mk(spark, tmp_path)
    stale = t.snapshot()
    LakeTable(spark, t.root).append(_df(spark, [150]))
    with pytest.raises(ConcurrentCommitError):
        merge_into(t, _df(spark, merge_ids, v_mult=9), on=["id"], snap=stale)


def test_rebase_gives_up_after_max_retries(spark, tmp_path):
    t = _mk(spark, tmp_path)
    stale = t.snapshot()
    adds = t._stage_dataframe(
        _df(spark, range(100, 103)), stale.schema, N_BUCKETS, ["id"]
    )
    entry = {
        "operation": "append",
        "add": adds,
        "remove": [],
        "properties": {},
        "summary": {},
    }
    other = LakeTable(spark, t.root)
    real = t._commit

    def always_raced(e, expected_version=None):
        # someone else takes every version we aim for
        other.append(_df(spark, [500 + expected_version]))
        return real(e, expected_version=expected_version)

    t._commit = always_raced
    try:
        with pytest.raises(ConcurrentCommitError, match="gave up"):
            t._commit_or_rebase(
                entry, stale, max_rebase_retries=2, key_disjoint=False
            )
    finally:
        t._commit = real


# ------------------------------------------------------------- compaction
def test_compact_rebase_over_same_bucket_append(spark, tmp_path):
    """Background compaction must not lose to the ingest stream: a racing
    append — even into a bucket being compacted — coexists, because
    compaction preserves rows."""
    t = _mk(spark, tmp_path)
    t.append(_df(spark, range(40, 80)))  # 2 files/bucket → victims exist
    before = _rows(t)

    other = LakeTable(spark, t.root)
    real = t._commit
    raced = {}

    def race_once(e, expected_version=None):
        if not raced:
            raced["y"] = other.append(_df(spark, range(100, 140)))
        return real(e, expected_version=expected_version)

    t._commit = race_once
    try:
        res = t.compact(rebase=True)
    finally:
        t._commit = real
    assert res.summary["rebased_over"] == 1
    assert res.summary["files_compacted"] > 0
    # every pre-compact row AND the racing append's rows survive
    assert _rows(t) == sorted(before + [(i, i * 2) for i in range(100, 140)])
    # changelog invariant holds across a rebased compact: no net change
    assert t.read_changelog(res.version, res.version).count() == 0


def test_compact_rebase_refuses_racing_merge_on_victim(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, range(40, 80)))
    other = LakeTable(spark, t.root)
    real = t._commit

    def race_once(e, expected_version=None):
        if e.get("operation") == "compact" and "raced" not in e.get("summary", {}):
            e.setdefault("summary", {})["raced"] = True
            # racing MERGE rewrites victim files in-place
            merge_into(other, _df(spark, [0, 1, 2], v_mult=7), on=["id"])
        return real(e, expected_version=expected_version)

    t._commit = race_once
    try:
        with pytest.raises(ConcurrentCommitError, match="rewrote"):
            t.compact(rebase=True)
    finally:
        t._commit = real


# ------------------------------------------------- review-found edge cases
def test_merge_rebase_claims_read_set_not_just_writes(spark, tmp_path):
    """A no-op merge (nothing matched, inserts suppressed) still DECIDED
    'these keys are absent' against its base — a racing insert of one of
    those keys must refuse the rebase, or re-running the merge would have
    updated the racer's row and the stale commit silently loses that."""
    by = _ids_by_bucket(spark)
    b_a, b_b = sorted(by)[:2]
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["id"], num_buckets=N_BUCKETS
    )
    t.append(_df(spark, by[b_a][:5]))  # bucket b_b stays empty
    stale = t.snapshot()
    probe = by[b_b][:2]
    # racing writer inserts one of the probe keys
    LakeTable(spark, t.root).append(_df(spark, probe[:1], v_mult=5))
    with pytest.raises(ConcurrentCommitError, match="bucket overlap"):
        merge_into(
            t,
            _df(spark, probe, v_mult=9),
            on=["id"],
            when_not_matched_insert=False,
            snap=stale,
            rebase=True,
        )


def test_merge_rebase_requires_sound_pruning(spark, tmp_path):
    """Expression-ON / non-bucket-key merges have no metadata disjointness
    proof — rebase=True fails fast at the call."""
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="bucket-pruned"):
        merge_into(
            t,
            _df(spark, range(5), v_mult=9).withColumnRenamed("id", "k"),
            on=F.expr("t.id = s.k"),
            rebase=True,
        )
    with pytest.raises(ValueError, match="bucket-pruned"):
        merge_into(t, _df(spark, range(5), v_mult=9), on=["v"], rebase=True)


def test_merge_rebase_over_intervening_add_then_compact(spark, tmp_path):
    """A file appended AND compacted away by intervening commits lives in
    neither snapshot — its bucket comes from the adding entry, so a
    provably-disjoint rebase still succeeds (no spurious None refusal)."""
    by = _ids_by_bucket(spark)
    b_merge, b_noise = sorted(by)[:2]
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["id"], num_buckets=N_BUCKETS
    )
    t.append(_df(spark, by[b_merge][:4] + by[b_noise][:4]))
    stale = t.snapshot()
    other = LakeTable(spark, t.root)
    noise_new = [i for i in by[b_noise] if i >= 100][:4]
    other.append(_df(spark, noise_new[:2]))   # bucket b_noise: 2 files
    other.append(_df(spark, noise_new[2:]))   # bucket b_noise: 3 files
    res_c = other.compact()                   # rewrites b_noise (and b_merge? no: 1 file)
    assert res_c.summary["files_compacted"] > 0
    res = merge_into(
        t, _df(spark, by[b_merge][:4], v_mult=9), on=["id"], snap=stale, rebase=True
    )
    assert res.summary["rebased_over"] == 3
    rows = dict(_rows(t))
    for i in by[b_merge][:4]:
        assert rows[i] == i * 9
    for i in noise_new:
        assert rows[i] == i * 2


# ---------------------------------------------------------- interleaving soak
def _run_interleaving_soak(spark, root, salt):
    """One soak run: three writers on key-disjoint id ranges, randomly
    interleaving rebase-enabled appends, merges, and compactions; merges
    that refuse a rebase re-run against a fresh snapshot (the documented
    caller contract). Asserts the state invariant unconditionally and
    returns how many commits genuinely rebased (scheduler-dependent)."""
    import random

    t = LakeTable.create(
        spark, root, SCHEMA, key_cols=["id"], num_buckets=N_BUCKETS
    )
    ranges = {0: range(0, 30), 1: range(1000, 1030), 2: range(2000, 2030)}
    expected = {}  # id -> v, maintained per-writer serially
    lock = threading.Lock()
    errs = []
    barrier = threading.Barrier(3)

    def writer(wid):
        rng = random.Random(salt * 104729 + wid * 7919)
        ids = list(ranges[wid])
        handle = LakeTable(spark, t.root)
        try:
            barrier.wait()
            for step in range(6):
                op = rng.choice(["append", "merge", "merge", "compact"])
                if op == "append":
                    fresh = [i for i in ids if i not in expected][:5]
                    if not fresh:
                        op = "merge"
                    else:
                        handle.append(_df(spark, fresh), rebase=True)
                        with lock:
                            expected.update({i: i * 2 for i in fresh})
                if op == "merge":
                    pick = rng.sample(ids, 4)
                    mult = step + 3
                    for _ in range(20):  # refused rebases re-run fresh
                        try:
                            merge_into(
                                handle, _df(spark, pick, v_mult=mult),
                                on=["id"], rebase=True,
                            )
                            break
                        except ConcurrentCommitError:
                            continue
                    else:  # pragma: no cover
                        raise RuntimeError("merge starved")
                    with lock:
                        expected.update({i: i * mult for i in pick})
                if op == "compact":
                    for _ in range(20):
                        try:
                            handle.compact(rebase=True)
                            break
                        except ConcurrentCommitError:
                            continue
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append((wid, e))

    threads = [threading.Thread(target=writer, args=(w,)) for w in ranges]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errs, errs
    assert dict(_rows(t)) == expected
    return sum(
        1
        for e in t.log_entries()
        if (e.get("summary") or {}).get("rebased_over")
    )


def test_occ_interleaving_soak(spark, tmp_path):
    """Whatever interleaving the scheduler produces, the final state must
    equal the per-writer serial expectation (asserted on every run). The
    rebase-actually-happened signal is scheduler-dependent — on a loaded
    host the threads can serialize — so the soak re-runs on a fresh table
    until a run contains a real race (almost always the first; bounded at
    three). Deterministic rebase coverage lives in the targeted tests
    above; scripts/occ_soak.py scales this to 5 writers for soak runs."""
    for attempt in range(3):
        rebased = _run_interleaving_soak(
            spark, str(tmp_path / f"t{attempt}"), salt=attempt
        )
        if rebased >= 1:
            return
    # three serialized runs in a row: state parity held every time; the
    # race-exercising coverage is carried by the deterministic tests
    pytest.skip("scheduler serialized 3 soak runs — no race to observe")


def test_rebase_degrades_to_conflict_when_metadata_vacuumed(spark, tmp_path):
    """A long-stalled writer whose intervening log entries were pruned by
    a racing vacuum_metadata gets the ordinary ConcurrentCommitError (redo
    against fresh state), not a raw FileNotFoundError crash."""
    t = _mk(spark, tmp_path)
    stale = t.snapshot()
    adds = t._stage_dataframe(
        _df(spark, range(100, 105)), stale.schema, N_BUCKETS, ["id"]
    )
    entry = {
        "operation": "append",
        "add": adds,
        "remove": [],
        "properties": {},
        "summary": {},
    }
    LakeTable(spark, t.root).append(_df(spark, range(200, 205)))
    real = t.log_entries

    def pruned(start=1, end=None):
        if start > 1:  # the validate range; snapshot() replays from 1
            raise FileNotFoundError("log entry pruned by vacuum_metadata")
        return real(start, end)

    t.log_entries = pruned
    try:
        with pytest.raises(ConcurrentCommitError, match="vacuumed"):
            t._commit_or_rebase(entry, stale, key_disjoint=False)
    finally:
        t.log_entries = real
