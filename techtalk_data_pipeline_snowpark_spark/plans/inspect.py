"""Turn Spark physical plans into assertable facts."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read by each parquet scan (ReadSchema)."""
    cols: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        body = m.group(1)
        names = [p.split(":")[0].strip() for p in body.split(",") if ":" in p]
        cols.append([n for n in names if n])
    return cols


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (each is a full data shuffle)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning",
                          simple_plan(df)))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def hash_aggregate_count(df: DataFrame) -> int:
    """Aggregate node count across physical strategies (hash, object-hash,
    sort — Catalyst picks sort-agg for var-width buffers like max_by over
    structs); a partial+final pair (≥2) shows map-side combine is active."""
    return len(
        re.findall(
            r"\bHashAggregate\b|\bObjectHashAggregate\b|\bSortAggregate\b",
            simple_plan(df),
        )
    )


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan contains a partial (map-side) aggregate phase."""
    return "partial_" in simple_plan(df)


def wholestage_codegen_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", simple_plan(df)))


def column_shuffle_count(
    df: DataFrame,
    col_name: str,
    struct_markers: tuple[str, ...] = ("valueWithExtremumOrdering",),
) -> int:
    """Number of shuffle Exchange nodes whose input carries ``col_name`` —
    e.g. how many times the payload 'content' column actually crosses a
    shuffle (broadcast exchanges and key-only shuffles don't count).

    ``struct_markers``: attribute names that wrap whole payload rows into a
    struct and so hide the column name — max_by/min_by partial aggregation
    shuffles its buffer as ``valueWithExtremumOrdering`` (Spark's
    MaxByAndMinBy aggregate buffer); an Exchange carrying one of these IS a
    payload shuffle."""
    plan = formatted_plan(df)
    n = 0
    # formatted explain prints each node as "(k) Exchange" followed by an
    # "Input [n]: [attrs...]" line and an "Arguments: hashpartitioning(...)"
    for m in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\s*\nArguments: (\w+)",
        plan,
    ):
        attrs, kind = m.group(1), m.group(2)
        if not kind.startswith(("hashpartitioning", "rangepartitioning")):
            continue
        if re.search(rf"\b{re.escape(col_name)}#", attrs) or any(
            mk in attrs for mk in struct_markers
        ):
            n += 1
    return n
