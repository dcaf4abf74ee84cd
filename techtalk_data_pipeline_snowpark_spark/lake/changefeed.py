"""Durable change-feed cursors: downstream (CDC-out) consumption of a
LakeTable's row-level changelog with a resumable, atomically-advancing
offset.

The engine's ingest side tails a binlog INTO the lake (``cdc/engine.py``);
this module is the symmetric surface OUT: a search indexer, cache
invalidator, or replica sink reads each commit's changes in commit order,
resumably. The reference consumes Snowflake streams the same way — a
stream read advances the stream offset transactionally with the DML that
consumes it (SnowflakeUtils.scala:46-66, DataLoader.scala:21-38); here
the offset is an explicit NAMED cursor persisted beside the table's log,
so any number of independent downstream consumers each keep their own
position without touching the table.

Positioning model
-----------------
A cursor named ``n`` on table root ``R`` is a directory ``R/_cursors/n/``
of ack files ``ack-{from:020d}.json`` (content: the ``to`` version the
ack covered). Advance is linearized by ``TableStore.put_if_absent`` on
the from-named file: two consumers that both polled at position ``p``
race to create ``ack-{p}.json`` — exactly one wins; the loser gets
:class:`CursorConflict` and must re-poll from the new position. Position
is the max ``to`` across ack files (every legal ack's ``from`` equals the
previous ack's ``to``, so the max is the chain tip); non-tip files are
pruned best-effort after each advance, so the directory stays O(1).

Delivery guarantees
-------------------
*At-least-once* delivery: a consumer that crashes after processing but
before :meth:`ChangeBatch.ack` re-reads the same range on restart.
*Exactly-once* cursor advance: the conditional put makes double-acks and
competing acks loud, never silent duplicates. End-to-end exactly-once
follows when the sink is idempotent over redelivery — e.g. a keyed MERGE
into another LakeTable, or any sink keyed on (``_commit_version``, key) —
the same argument as the ingest engine's epoch manifest.

Scale: ``poll`` reads only the commits in (position, to] via
``read_changelog`` — touched-file-scoped, never a full-table diff — and
``max_versions`` chunks a long catch-up into bounded batches.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from .table import LakeTable

CURSORS_DIR = "_cursors"


class CursorConflict(RuntimeError):
    """Another consumer advanced this cursor past the polled position."""


@dataclass
class ChangeBatch:
    """One polled slice of the change feed: rows of ``read_changelog`` for
    (from_version, to_version], plus the ack that advances the cursor."""

    df: DataFrame
    from_version: int
    to_version: int
    _ack: Callable[[], None] = field(repr=False)

    def ack(self) -> None:
        """Durably advance the cursor to ``to_version``. Raises
        :class:`CursorConflict` if a competing consumer advanced first —
        the caller must re-poll (and must treat its own side effects as
        possibly-duplicated, per the at-least-once contract)."""
        self._ack()


class ChangelogCursor:
    """Named, durable position on a LakeTable's changelog (CDC-out)."""

    def __init__(self, table: LakeTable, name: str):
        if table._is_branch_handle():
            raise ValueError(
                "cursors track the main lineage: branch versions renumber "
                "on publish, so a branch-scoped cursor position would not "
                "survive the squash"
            )
        LakeTable._check_ref_name(name)
        self.table = table
        self.name = name
        self._dir = f"{CURSORS_DIR}/{name}"
        table.store.ensure_dir(self._dir)

    # ------------------------------------------------------------ position
    def position(self) -> int:
        """Last acked version (0 = nothing consumed: the next poll starts
        at the table's first commit)."""
        best = 0
        for fn in self.table.store.list_dir(self._dir):
            if not (fn.startswith("ack-") and fn.endswith(".json")):
                continue
            to = json.loads(self.table.store.read_bytes(f"{self._dir}/{fn}"))[
                "to"
            ]
            best = max(best, int(to))
        return best

    # ---------------------------------------------------------------- poll
    def poll(
        self,
        max_versions: int | None = None,
        emit_preimages: bool = False,
    ) -> ChangeBatch | None:
        """Read the next unconsumed slice of the change feed, or ``None``
        when the cursor is caught up. The returned batch covers
        (position, min(latest, position + max_versions)]; call
        :meth:`ChangeBatch.ack` after the sink durably holds the rows."""
        frm = self.position()
        latest = self.table.latest_version()
        to = latest if max_versions is None else min(latest, frm + max_versions)
        if to <= frm:
            return None
        df = self.table.read_changelog(frm, to, emit_preimages=emit_preimages)
        return ChangeBatch(
            df=df,
            from_version=frm,
            to_version=to,
            _ack=lambda: self._advance(frm, to),
        )

    # ------------------------------------------------------------- advance
    def _advance(self, frm: int, to: int) -> None:
        payload = json.dumps({"from": frm, "to": to}).encode()
        won = self.table.store.put_if_absent(
            f"{self._dir}/ack-{frm:020d}.json", payload
        )
        pos = self.position()
        if not won or pos > to:
            # lost the race outright, or a pruned-then-recreated stale ack
            # "succeeded" without moving the tip — either way the polled
            # range is no longer the frontier.
            raise CursorConflict(
                f"cursor {self.name!r}: ack for ({frm}, {to}] lost to a "
                f"competing advance (position is now {pos})"
            )
        # best-effort prune: keep only the chain tip
        for fn in self.table.store.list_dir(self._dir):
            if (
                fn.startswith("ack-")
                and fn.endswith(".json")
                and fn != f"ack-{frm:020d}.json"
            ):
                entry = json.loads(
                    self.table.store.read_bytes(f"{self._dir}/{fn}")
                )
                if int(entry["to"]) < to:
                    self.table.store.delete(f"{self._dir}/{fn}")

    # --------------------------------------------------------------- reset
    def drop(self) -> None:
        """Forget the cursor entirely (next consumer restarts from the
        beginning of the retained log)."""
        self.table.store.delete_dir(self._dir)
