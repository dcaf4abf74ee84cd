"""Incremental view maintenance for JOINS — the hard IVM case.

``IncrementalAggView`` (lake/ivm.py) folds changelog deltas algebraically;
a JOIN view cannot: one changed left row invalidates an unbounded set of
result rows. ``IncrementalJoinView`` maintains a materialized equi INNER
JOIN by DELTA-SCOPED RECOMPUTE of the affected join region — the strategy
production incremental pipelines use:

1. dirty keys = distinct SOURCE keys in each side's changelog window
   (touched-file-scoped reads; the changelog's key-based classification
   makes every change type carry its key).
2. new region = (a_dirty JOIN b@vb) UNION (a_clean JOIN b_dirty): the
   first term re-derives every pair a dirty left row participates in, the
   second every pair a dirty right row does — minus the both-dirty
   overlap, which term 1 already produced (a_clean excludes dirty a-keys,
   so no pair is emitted twice). When a dirty set is small it becomes an
   IN-list predicate pushed to the parquet scan and AQE broadcasts that
   side: the big table costs ONE column-pruned map-side pass, no shuffle
   of the clean giant.
3. tombstones = affected view rows (dirty on either side) whose pair no
   longer exists in the new region.
4. ONE MERGE applies upserts + tombstones; BOTH covered source versions
   ride the same atomic commit, so refresh is exactly-once and safe under
   competing refreshers (same optimistic version pin as the agg view).

Result-row identity = a.key_cols + b.key_cols (prefixed ``a_``/``b_`` in
the view), so duplicate join-column values on either side stay exact —
every (left row, right row) pair is its own view row. Null join columns
match nothing (equi-join semantics). The view is itself a LakeTable, so
time travel, changelog, cursors, blooms, and vacuum all apply to the
maintained result — and chaining works: an ``IncrementalAggView`` over a
join view's changelog is a two-stage maintained DAG with no extra code.

``how="left"`` maintains a LEFT OUTER join: unmatched left rows carry a
null-extended b side (their identity keys off the a keys alone — the
merge's eqNullSafe key join keeps them exact). Left refresh uses the
dirty-JOIN-VALUE formulation: a b-side change can create or destroy an
a-row's null-extension, so every a-row whose join value appears in b's
changelog window (update preimages included — a moved b row names its old
value only there) is re-derived with a LEFT join against b at the pinned
version; a-rows changed by key are re-derived the same way.

Reference parity: the reference recomputes its joined analytics per DAG
tick (e.g. the 3-way join of DataQuality.scala re-runs in full); at 10^10
rows a maintained join costs the epoch's dirty region, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import merge_into
from .table import LakeTable

PROP_SOURCE_VERSION_A = "ivm.source_version.a"
PROP_SOURCE_VERSION_B = "ivm.source_version.b"


class IncrementalJoinView:
    """Maintained ``SELECT <select> FROM a JOIN b ON <on>``.

    ``on``: equi-join column names (present on both sides).
    ``select``: {output_col: ("a"|"b", source_col)} payload projection;
    the prefixed source keys are always included automatically.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_a: LakeTable,
        source_b: LakeTable,
        root: str,
        on: list[str],
        select: dict[str, tuple[str, str]],
        num_buckets: int = 8,
        dirty_inlist_cap: int = 10_000,
        how: str = "inner",
    ):
        if how not in ("inner", "left"):
            raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
        self.spark = spark
        self.a = source_a
        self.b = source_b
        self.root = root
        self.on = list(on)
        self.select = dict(select)
        self.num_buckets = num_buckets
        self.dirty_inlist_cap = dirty_inlist_cap
        self.how = how
        ka = source_a.snapshot().key_cols
        kb = source_b.snapshot().key_cols
        if not ka or not kb:
            raise ValueError("both join-view sources need key columns")
        self.a_keys = [f"a_{k}" for k in ka]
        self.b_keys = [f"b_{k}" for k in kb]
        self._ka, self._kb = list(ka), list(kb)
        for out, (side, _) in self.select.items():
            if side not in ("a", "b"):
                raise ValueError(f"select side must be 'a' or 'b': {out}")
            if out in self.a_keys + self.b_keys:
                raise ValueError(f"select output collides with a key column: {out}")

    # --------------------------------------------------------------- state
    def table(self) -> LakeTable:
        return LakeTable(self.spark, self.root)

    def applied_source_versions(self) -> tuple[int, int]:
        t = self.table()
        if not t.exists():
            return 0, 0
        p = t.snapshot().properties
        return (
            int(p.get(PROP_SOURCE_VERSION_A, 0)),
            int(p.get(PROP_SOURCE_VERSION_B, 0)),
        )

    def read(self) -> DataFrame:
        return self.table().read()

    # ------------------------------------------------------------- helpers
    def _project(self, a_df: DataFrame, b_df: DataFrame, how: str = "inner") -> DataFrame:
        j = a_df.alias("a").join(
            b_df.alias("b"),
            on=[F.col(f"a.{c}") == F.col(f"b.{c}") for c in self.on],
            how=how,
        )
        cols = [F.col(f"a.{k}").alias(o) for k, o in zip(self._ka, self.a_keys)]
        cols += [F.col(f"b.{k}").alias(o) for k, o in zip(self._kb, self.b_keys)]
        cols += [
            F.col(f"{side}.{col}").alias(out)
            for out, (side, col) in self.select.items()
        ]
        return j.select(*cols)

    def _dirty(
        self,
        src: LakeTable,
        keys: list[str],
        last: int,
        upto: int,
        emit_preimages: bool = False,
        drop_null: bool = False,
    ):
        """(dirty-key DataFrame or None, driver-side tuples if under cap).

        ``emit_preimages=True`` when collecting dirty JOIN-COLUMN values: a
        keyed update that MOVES a row's join value names the old value only
        in the update preimage. ``drop_null`` excludes null join values —
        they match nothing under equi-join semantics, so they can't dirty
        the other side (and None breaks IN-list literals)."""
        if upto <= last:
            return None, None
        ch = src.read_changelog(last, upto, emit_preimages=emit_preimages)
        ch = ch.select(*keys).distinct()
        if drop_null:
            for k in keys:
                ch = ch.where(F.col(k).isNotNull())
        head = ch.limit(self.dirty_inlist_cap + 1).collect()
        if len(head) <= self.dirty_inlist_cap:
            return ch, [tuple(r[k] for k in keys) for r in head]
        return ch, None

    # composite keys can't use Column.isin (no struct literals); an
    # OR-of-conjunctions stays pushdown-friendly but must stay small
    _COMPOSITE_PRED_CAP = 200

    @staticmethod
    def _key_pred(keys: list[str], vals: list[tuple]):
        """Literal predicate over the key tuple — single column is a plain
        pushdown-able IN; composite keys expand to OR-of-conjunctions.

        Null-safe like the composite path's eqNullSafe: a bare ``isin``
        returns NULL for a null-keyed row, and its negation (the clean-side
        filter) is also NULL — the row would silently vanish from BOTH the
        dirty and clean sets. ``isNotNull & isin`` is never NULL (both
        conjuncts remain pushdown-able scan filters), and a null literal in
        the dirty set (possible on non-key join columns) ORs in ``isNull``.
        """
        if not vals:
            return F.lit(False)
        if len(keys) == 1:
            col = F.col(keys[0])
            nn = [v[0] for v in vals if v[0] is not None]
            pred = (col.isNotNull() & col.isin(nn)) if nn else F.lit(False)
            if len(nn) < len(vals):
                pred = pred | col.isNull()
            return pred
        pred = F.lit(False)
        for v in vals:
            conj = F.lit(True)
            for k, x in zip(keys, v):
                conj = conj & (F.col(k).eqNullSafe(F.lit(x)))
            pred = pred | conj
        return pred

    def _filter_dirty(
        self, df: DataFrame, keys: list[str], dirty, vals, keep: bool
    ) -> DataFrame:
        """Rows whose key IS (keep=True) / IS NOT (False) in the dirty set.
        Small sets → literal predicate (scan pushdown + broadcastable
        result); big sets → [anti-]semi-join on the dirty-key frame."""
        if dirty is None:
            return df.where(F.lit(not keep))
        if vals is not None and (
            len(keys) == 1 or len(vals) <= self._COMPOSITE_PRED_CAP
        ):
            pred = self._key_pred(keys, vals)
            return df.where(pred if keep else ~pred)
        how = "left_semi" if keep else "left_anti"
        return df.join(dirty, on=keys, how=how)

    # ------------------------------------------------------------- refresh
    def refresh(self, _retries: int = 5) -> dict:
        from .table import ConcurrentCommitError

        last_err = None
        for _ in range(_retries):
            va, vb = self.a.latest_version(), self.b.latest_version()
            vt = self.table()
            vsnap = None
            la = lb = 0
            if vt.exists():
                vsnap = vt.snapshot()
                la = int(vsnap.properties.get(PROP_SOURCE_VERSION_A, 0))
                lb = int(vsnap.properties.get(PROP_SOURCE_VERSION_B, 0))
            if va <= la and vb <= lb:
                return {"refreshed": False, "source_versions": (la, lb)}
            a1, b1 = self.a.read(version=va), self.b.read(version=vb)
            props = {
                PROP_SOURCE_VERSION_A: str(va),
                PROP_SOURCE_VERSION_B: str(vb),
            }
            if vsnap is None:
                full = self._project(a1, b1, self.how)
                try:
                    vt = LakeTable.create(
                        self.spark,
                        self.root,
                        full.schema,
                        key_cols=self.a_keys + self.b_keys,
                        num_buckets=self.num_buckets,
                    )
                except (FileExistsError, ConcurrentCommitError):
                    continue  # rival created it — re-read stamps
                vsnap = vt.snapshot()
                try:
                    res = merge_into(
                        vt, full, on=self.a_keys + self.b_keys,
                        properties=props, snap=vsnap,
                    )
                except ConcurrentCommitError as e:
                    last_err = e
                    continue
                return {
                    "refreshed": True,
                    "source_versions": (va, vb),
                    "initial": True,
                    "merge": res.summary,
                }
            da, da_vals = self._dirty(self.a, self._ka, la, va)
            view_df = vt.read(version=vsnap.version)
            if self.how == "left":
                # LEFT join needs the dirty-JOIN-VALUE formulation: a b-side
                # change can create OR destroy an a-row's null-extension, so
                # every a-row whose join value appears in b's changelog
                # (preimages included — a moved b row names its OLD value
                # only there) is re-derived with a LEFT join against b@vb.
                djk, djk_vals = self._dirty(
                    self.b, self.on, lb, vb, emit_preimages=True, drop_null=True
                )
                aff_by_key = self._filter_dirty(a1, self._ka, da, da_vals, keep=True)
                aff_by_jk = self._filter_dirty(a1, self.on, djk, djk_vals, keep=True)
                affected_a = aff_by_key.unionByName(aff_by_jk).dropDuplicates(
                    self._ka
                )
                new_region = self._project(affected_a, b1, "left")
                # every view row derived from an affected a-row is stale;
                # the view's a-keys name them (works whether the old row was
                # a pair or a null-extension). DELETED a-rows are not in a1,
                # so their keys come from the changelog dirty set directly —
                # without them a dropped left row's view rows would survive
                # as ghosts.
                aff_keys = affected_a.select(
                    *[F.col(k).alias(o) for k, o in zip(self._ka, self.a_keys)]
                )
                if da is not None:
                    aff_keys = aff_keys.unionByName(da.toDF(*self.a_keys))
                affected = view_df.join(
                    aff_keys.distinct(), on=self.a_keys, how="left_semi"
                )
            else:
                db, db_vals = self._dirty(self.b, self._kb, lb, vb)
                a_dirty = self._filter_dirty(a1, self._ka, da, da_vals, keep=True)
                a_clean = self._filter_dirty(a1, self._ka, da, da_vals, keep=False)
                b_dirty = self._filter_dirty(b1, self._kb, db, db_vals, keep=True)
                new_region = self._project(a_dirty, b1).unionByName(
                    self._project(a_clean, b_dirty)
                )
                # affected old pairs: view rows citing a dirty key on either side
                da_view = da.toDF(*self.a_keys) if da is not None else None
                db_view = db.toDF(*self.b_keys) if db is not None else None
                aff_a = self._filter_dirty(
                    view_df, self.a_keys, da_view, da_vals, keep=True
                )
                aff_b = self._filter_dirty(
                    view_df, self.b_keys, db_view, db_vals, keep=True
                )
                affected = aff_a.unionByName(aff_b).dropDuplicates(
                    self.a_keys + self.b_keys
                )
            # NB: merge existence detection keys off the FIRST merge key,
            # which is an a-side key — never null even for left-join
            # null-extension rows. The anti-join below must be NULL-SAFE:
            # a null-extension row's b-keys are null, and a plain equality
            # anti-join would tombstone it even while it still exists in
            # the new region (null never equals null), producing a
            # duplicate-key merge source.
            nr = new_region.select(*self.a_keys, *self.b_keys).alias("nr")
            aff = affected.alias("aff")
            anti = F.lit(True)
            for k in self.a_keys + self.b_keys:
                anti = anti & F.col(f"aff.{k}").eqNullSafe(F.col(f"nr.{k}"))
            tombstones = aff.join(nr, on=anti, how="left_anti").select("aff.*")
            src = new_region.withColumn("__op", F.lit("upsert")).unionByName(
                tombstones.withColumn("__op", F.lit("delete"))
            )
            try:
                res = merge_into(
                    vt,
                    src,
                    on=self.a_keys + self.b_keys,
                    when_matched_delete=F.col("s.__op") == "delete",
                    when_not_matched_insert=F.col("s.__op") != "delete",
                    properties=props,
                    snap=vsnap,
                )
            except ConcurrentCommitError as e:
                last_err = e
                continue
            return {
                "refreshed": True,
                "source_versions": (va, vb),
                "merge": res.summary,
            }
        raise last_err or RuntimeError("join-view refresh retries exhausted")
