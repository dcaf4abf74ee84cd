"""Persisted view catalog — parity with Snowpark ``createOrReplaceView``
(TopRestaurantsLast30Days.scala:38; SURVEY.md §2.1 S9).

Snowflake persists views server-side; here a view definition (SQL text) is
stored in a tiny JSON catalog next to the lake tables (same atomic
write-then-rename protocol), and ``attach()`` re-registers everything into
any SparkSession: lake tables become temp views, then each catalog view is
created with CREATE OR REPLACE TEMPORARY VIEW. Catalyst inlines the view
text into consuming plans — a view costs nothing at runtime and pushdown /
pruning work through it unchanged.

Views may reference lake tables and each other; ``attach`` resolves
dependencies by fixed-point retry (no explicit DAG needed for the
dimension-scale catalogs this serves).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable

VIEWS_DIR = "_views"


class ViewCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, VIEWS_DIR), exist_ok=True)

    def _path(self, name: str) -> str:
        if not name.replace("_", "").isalnum():
            raise ValueError(f"invalid view name: {name!r}")
        return os.path.join(self.root, VIEWS_DIR, f"{name}.json")

    # ------------------------------------------------------------------ DDL
    def create_or_replace(self, name: str, sql_text: str) -> None:
        """Persist the view definition and register it in this session."""
        payload = {"name": name, "sql": sql_text, "updated_at": time.time()}
        tmp = os.path.join(self.root, VIEWS_DIR, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(name))  # atomic create-or-replace
        self.spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql_text}")

    def drop(self, name: str) -> bool:
        try:
            os.unlink(self._path(name))
        except FileNotFoundError:
            return False
        self.spark.catalog.dropTempView(name)
        return True

    def names(self) -> list[str]:
        d = os.path.join(self.root, VIEWS_DIR)
        return sorted(
            e[:-5] for e in os.listdir(d) if e.endswith(".json") and not e.startswith(".")
        )

    def definition(self, name: str) -> str:
        with open(self._path(name)) as f:
            return json.load(f)["sql"]

    # ---------------------------------------------------------------- attach
    def attach(self, tables: dict[str, LakeTable | DataFrame] | None = None) -> list[str]:
        """Register lake tables + all persisted views into the session
        (the 'open the database' step a new session runs once). Returns
        the view names registered, in resolution order."""
        for tname, t in (tables or {}).items():
            df = t.read() if isinstance(t, LakeTable) else t
            df.createOrReplaceTempView(tname)
        pending = {n: self.definition(n) for n in self.names()}
        done: list[str] = []
        while pending:
            progressed = False
            errors: dict[str, Exception] = {}
            for n, sql_text in list(pending.items()):
                try:
                    self.spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {n} AS {sql_text}")
                except Exception as e:  # unresolved dependency → retry later
                    errors[n] = e
                    continue
                done.append(n)
                del pending[n]
                progressed = True
            if not progressed:
                bad = ", ".join(f"{n}: {e}" for n, e in errors.items())
                raise ValueError(f"unresolvable view definitions: {bad}")
        return done

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)
