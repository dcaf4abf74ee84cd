"""Physical-plan inspection helpers.

The reference delegates all optimization to Snowflake (SURVEY.md §4); on
Spark the equivalents (predicate pushdown, column pruning, broadcast
selection, partial aggregation, whole-stage codegen) come from Catalyst —
but only if the plans we build actually trigger them. These helpers turn
`.explain("formatted")` into assertable facts so tests lock the plan
shape in, not just the results.
"""

from .inspect import (
    column_shuffle_count,
    formatted_plan,
    has_partial_aggregation,
    has_broadcast_hash_join,
    hash_aggregate_count,
    pushed_filters,
    scan_read_columns,
    shuffle_exchange_count,
    wholestage_codegen_count,
)

__all__ = [
    "column_shuffle_count",
    "formatted_plan",
    "has_partial_aggregation",
    "has_broadcast_hash_join",
    "hash_aggregate_count",
    "pushed_filters",
    "scan_read_columns",
    "shuffle_exchange_count",
    "wholestage_codegen_count",
]
