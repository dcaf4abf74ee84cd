"""Snowpark-semantics shims (SURVEY.md §2.8, §4 item 5).

The reference's client API has a handful of semantics that differ from
Spark's defaults; each shim is a thin Column/DataFrame-level wrapper so the
difference is explicit and unit-tested rather than silently wrong:

- ``substring1``       Snowflake SUBSTRING is 1-based and treats 0 as 1
                       (SampleStream.scala:49-54 uses ``substring(col,0,2)``)
- ``union_dedup``      Snowpark ``union`` = SQL UNION (dedups); Spark
                       ``union`` = UNION ALL
                       (IngestPaymentsStreamFromStage.scala:61-63)
- ``get_ignore_case``  case-insensitive field extraction from parsed JSON
                       (com/snowflake/snowpark/Implicits.scala:18-23)
- ``json_array_to_exploded_fields``  flatten a JSON-array string column to
                       typed columns (Implicits.scala:27-38
                       ``jsonArrayToExplodedFields``)
- ``dateadd`` / ``sysdate``  Snowflake date helpers
                       (TopRestaurantsLast30Days.scala:23-25)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def substring1(col: Column | str, pos: int, length: int) -> Column:
    """Snowflake-compatible substring: 1-based; pos 0 behaves like 1."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, max(pos, 1), length)


def union_dedup(a: DataFrame, b: DataFrame) -> DataFrame:
    """Snowpark ``union`` parity: SQL UNION (distinct rows)."""
    return a.union(b).dropDuplicates()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Snowpark ``unionAll`` parity (same as Spark union)."""
    return a.union(b)


def _ci_map_lookup(parsed: Column, field: str) -> Column:
    """First map entry whose key matches ``field`` case-insensitively.

    filter-over-entries instead of rebuilding a lowercased map: keys that
    collide after lowercasing (both "k" and "K" present) would make
    map_from_arrays throw under the default mapKeyDedupPolicy=EXCEPTION;
    here the first match in payload order wins. ``F.get`` (0-based, total)
    instead of ``element_at`` — ANSI mode (Spark 4 default) makes
    element_at raise on a miss."""
    return F.get(
        F.filter(
            F.map_entries(parsed), lambda e: F.lower(e["key"]) == F.lit(field.lower())
        ),
        0,
    )["value"]


def get_ignore_case(json_col: Column, field: str) -> Column:
    """Case-insensitive JSON field extraction — FULL, including nested
    values.

    The reference parses payloads with ``parse_json`` (→ Snowflake VARIANT)
    then extracts fields case-insensitively (Implicits.scala:19). Spark's
    ``get_json_object`` is case-sensitive, so parse the object to
    map<string, variant> (Spark 4 VariantType — the open-source VARIANT)
    and probe the entries case-insensitively; all JVM-side expressions.

    The variant value casts to string with exactly the semantics we want:
    scalars unquote (``"7"`` → ``7``, ``"x"`` → ``x`` — same shape the old
    map<string,string> path produced), while nested objects/arrays render
    back to their JSON text — so chained extraction
    ``get_ignore_case(get_ignore_case(c, "outer"), "inner")`` walks nested
    payloads case-insensitively at every level. The ``get_json_object``
    fallback only matters for inputs the variant parser rejects outright.
    """
    parsed = F.from_json(json_col, T.MapType(T.StringType(), T.VariantType()))
    return F.coalesce(
        _ci_map_lookup(parsed, field).cast("string"),
        F.get_json_object(json_col, f"$.{field}"),
    )


def json_array_to_exploded_fields(
    df: DataFrame, schema: T.StructType, json_col: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """Flatten a column holding a JSON *array* of records into typed columns.

    Parity with ``jsonArrayToExplodedFields`` (Implicits.scala:27-38): the
    reference lands the raw REST payload (a JSON array) in one VARIANT
    column, lateral-flattens it, then per-field ``get_ignore_case`` + cast.
    Spark-first: ``from_json`` to array<map<string, variant>> + ``explode``
    (Jackson field binding in a plain StructType parse would be
    case-SENSITIVE; the entry probe is not). Variant values mean a record
    carrying nested objects/arrays still parses — extra nested fields are
    ignored and declared StringType fields receive the JSON text.
    """
    keep = [F.col(c) for c in (keep_cols or [])]
    parsed = df.select(
        *keep,
        F.explode(
            F.from_json(F.col(json_col), T.ArrayType(T.MapType(T.StringType(), T.VariantType())))
        ).alias("_rec"),
    )
    # per-field case-insensitive entry probe (see _ci_map_lookup: avoids the
    # lowercased-key collision throw and ANSI element_at misses); variant →
    # string → declared type keeps the exact cast semantics the old
    # map<string,string> path had
    fields = [
        _ci_map_lookup(F.col("_rec"), f.name).cast("string").cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return parsed.select(*[F.col(c) for c in (keep_cols or [])], *fields)


def dateadd(part: str, amount: Column | int, ts: Column) -> Column:
    """Snowflake DATEADD parity for the parts the reference uses."""
    amt = F.lit(amount) if isinstance(amount, int) else amount
    part = part.lower()
    if part == "day":
        return F.date_add(ts, amt)
    if part == "month":
        return F.add_months(ts, amt)
    if part == "year":
        return F.add_months(ts, amt * 12)
    raise ValueError(f"unsupported dateadd part: {part}")


def sysdate(as_of: str | None = None) -> Column:
    """Snowflake SYSDATE parity; inject ``as_of`` (ISO timestamp string) for
    deterministic tests of the 30-day window (SURVEY.md §6 hard part e)."""
    return F.to_timestamp(F.lit(as_of)) if as_of else F.current_timestamp()
