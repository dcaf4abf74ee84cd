"""Crash-point sweep over the commit protocol: a store wrapper dies after a
budget of state-changing operations (including HALFWAY through a finalize
batch), and every possible crash point of a MERGE / MoR-delete /
checkpoint-writing commit must leave the table either exactly PRE-state or
exactly POST-state — readable, never partial — with a plain retry
converging and vacuum reclaiming the orphans. This is the atomicity claim
of the single-conditional-put commit (lake/store.py) tested by exhaustion
rather than by argument."""

import shutil

import pytest
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable, merge_into
from techtalk_data_pipeline_snowpark_spark.lake.merge import mor_delete_keys
from techtalk_data_pipeline_snowpark_spark.lake.store import PosixStore

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


class CrashError(RuntimeError):
    pass


class CrashyStore(PosixStore):
    """Dies (raises CrashError) once ``budget`` state-changing store
    operations have happened — finalize decrements PER MOVE, so the sweep
    also hits mid-batch crash points (half the staged files renamed)."""

    def __init__(self, root: str, budget: int):
        super().__init__(root)
        self.budget = budget

    def _spend(self):
        if self.budget <= 0:
            raise CrashError("injected crash")
        self.budget -= 1

    def put_if_absent(self, rel, data):
        self._spend()
        return super().put_if_absent(rel, data)

    def finalize(self, moves):
        for mv in moves:
            self._spend()
            super().finalize([mv])

    def delete(self, rel):
        self._spend()
        super().delete(rel)

    def delete_dir(self, rel):
        self._spend()
        super().delete_dir(rel)


def _rows(t) -> set:
    return set(map(tuple, t.read().collect()))


def _sweep(spark, base_root, tmp_path, mutate, pre_rows, post_rows):
    """For every crash budget k until a run completes uninjured: restore a
    pristine copy of the base table, run ``mutate`` under a CrashyStore(k),
    then assert all-or-nothing, retry-converges, vacuum-safe."""
    k = 0
    while True:
        root = str(tmp_path / f"sweep{k}")
        shutil.copytree(base_root, root)
        t = LakeTable(spark, root, store=CrashyStore(root, budget=k))
        crashed = False
        try:
            mutate(t)
        except CrashError:
            crashed = True
        # the table must be readable and exactly pre or post
        clean = LakeTable(spark, root)
        state = _rows(clean)
        assert state in (pre_rows, post_rows), (
            f"budget {k}: partial state ({len(state)} rows)"
        )
        if not crashed:
            assert state == post_rows, f"budget {k}: completed but not post"
        if state == pre_rows:
            # plain retry converges
            mutate(clean)
            assert _rows(clean) == post_rows, f"budget {k}: retry diverged"
        # vacuum reclaims crash orphans without corrupting the state
        clean.vacuum(retain_versions=0, staging_grace_sec=0)
        assert _rows(LakeTable(spark, root)) in (pre_rows, post_rows)
        if not crashed:
            return k  # the full op sequence fit in the budget — swept all
        k += 1
        assert k < 120, "crash sweep did not terminate"


@pytest.fixture()
def base_table(spark, tmp_path):
    root = str(tmp_path / "base")
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    t.enable_blooms()  # bloom sidecar puts are crash points too
    t.append(spark.createDataFrame([(f"k{i}", i) for i in range(200)], SCHEMA))
    return root


def test_merge_crash_points(spark, tmp_path, base_table):
    src_rows = [("k5", 500), ("k6", 600), ("knew", 1)]

    def mutate(t):
        merge_into(
            t, t.spark.createDataFrame(src_rows, SCHEMA), on=["k"]
        )

    pre = _rows(LakeTable(spark, base_table))
    post = (pre - {("k5", 5), ("k6", 6)}) | set(src_rows)
    ops = _sweep(spark, base_table, tmp_path, mutate, pre, post)
    assert ops > 3  # the sweep actually exercised multiple crash points


def test_mor_delete_crash_points(spark, tmp_path, base_table):
    def mutate(t):
        keys = t.spark.createDataFrame([("k7",), ("k8",)], "k string")
        mor_delete_keys(t, keys, ["k"])

    pre = _rows(LakeTable(spark, base_table))
    post = pre - {("k7", 7), ("k8", 8)}
    ops = _sweep(spark, base_table, tmp_path, mutate, pre, post)
    assert ops > 1


class CheckpointCrashStore(PosixStore):
    """Dies exactly on checkpoint puts — deterministic, no budget guessing
    (the staged-file count varies run to run, so op-count targeting of the
    checkpoint put is flaky by construction)."""

    def put_if_absent(self, rel, data):
        if ".checkpoint." in rel:
            raise CrashError("injected checkpoint crash")
        return super().put_if_absent(rel, data)


def test_checkpoint_crash_is_harmless(spark, tmp_path, base_table, monkeypatch):
    # force a checkpoint write on the next commit and crash INSIDE it: the
    # commit itself must stay durable (checkpoints are pure optimization)
    import techtalk_data_pipeline_snowpark_spark.lake.table as table_mod

    # base table sits at version 3 (create + enable_blooms + append) — the
    # merge commits version 4, which CHECKPOINT_EVERY=4 makes a checkpoint
    monkeypatch.setattr(table_mod, "CHECKPOINT_EVERY", 4)
    root = str(tmp_path / "cp")
    shutil.copytree(base_table, root)
    t = LakeTable(spark, root, store=CheckpointCrashStore(root))
    merge_into(t, spark.createDataFrame([("k1", 11)], SCHEMA), on=["k"])
    clean = LakeTable(spark, root)
    assert ("k1", 11) in _rows(clean)
    assert clean.snapshot().version == 4
    assert clean._available_checkpoints() == []  # the checkpoint never landed
    # the next eligible commit (clean store) writes the checkpoint fine
    monkeypatch.setattr(table_mod, "CHECKPOINT_EVERY", 5)
    merge_into(clean, spark.createDataFrame([("k2", 22)], SCHEMA), on=["k"])
    assert clean._available_checkpoints() == [5]
    assert ("k2", 22) in _rows(clean)
