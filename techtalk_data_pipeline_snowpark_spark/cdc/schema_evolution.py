"""Metadata-driven schema reconciliation before each merge-apply
(north_star: "schema evolution (column add/widen) handled by a
metadata-driven reconciliation pass before each merge-apply").

Compares the incoming batch schema against the table schema and computes
the evolved table schema:

- column in batch but not table  → ADD COLUMN (old files read as null)
- batch type wider than table    → widen (int→long, float→double,
  int→double); old parquet files upcast on read (verified in test_lake)
- batch type narrower than table → batch is cast up at merge time
- incompatible change            → SchemaEvolutionError

Runs BEFORE any vectorized transform so pandas UDFs never see a schema that
is about to shift under them (SURVEY.md §6 hard part c).
"""

from __future__ import annotations

from pyspark.sql import types as T

_WIDENING: dict[tuple[str, str], str] = {
    ("integer", "long"): "long",
    ("short", "integer"): "integer",
    ("short", "long"): "long",
    ("byte", "short"): "short",
    ("byte", "integer"): "integer",
    ("byte", "long"): "long",
    ("float", "double"): "double",
    ("integer", "double"): "double",
    ("long", "double"): "double",
    ("date", "timestamp"): "timestamp",
}


class SchemaEvolutionError(ValueError):
    pass


def _widened(table_t: T.DataType, batch_t: T.DataType) -> T.DataType | None:
    """Widest of the two if convertible, else None.

    Recurses into nested types: struct fields reconcile field-by-field
    (batch-only fields are ADDED to the struct; table-only fields are
    kept — old rows read them as null either way), array element types and
    map value types widen recursively. Parquet reads old files under the
    evolved nested schema with the same null/upcast semantics as top-level
    columns (vectorized reader schema evolution)."""
    if table_t == batch_t:
        return table_t
    a, b = table_t.typeName(), batch_t.typeName()
    if (a, b) in _WIDENING:
        return batch_t
    if (b, a) in _WIDENING:
        return table_t
    if isinstance(table_t, T.StructType) and isinstance(batch_t, T.StructType):
        by_lower = {f.name.lower(): f for f in table_t.fields}
        out = {f.name: f for f in table_t.fields}
        for bf in batch_t.fields:
            tf = by_lower.get(bf.name.lower())
            if tf is None:
                out[bf.name] = T.StructField(bf.name, bf.dataType, True)
                continue
            w = _widened(tf.dataType, bf.dataType)
            if w is None:
                return None
            out[tf.name] = T.StructField(tf.name, w, True)
        return T.StructType(list(out.values()))
    if isinstance(table_t, T.ArrayType) and isinstance(batch_t, T.ArrayType):
        w = _widened(table_t.elementType, batch_t.elementType)
        return T.ArrayType(w, True) if w is not None else None
    if isinstance(table_t, T.MapType) and isinstance(batch_t, T.MapType):
        if table_t.keyType != batch_t.keyType:
            return None
        w = _widened(table_t.valueType, batch_t.valueType)
        return T.MapType(table_t.keyType, w, True) if w is not None else None
    return None


# Key-column widenings that leave the bucket function invariant: integral
# family members all hash AS LONG and float/double AS DOUBLE (bucket_expr
# normalization), so these re-type without re-mapping any bucket id.
_KEY_SAFE_FAMILIES = (
    {"byte", "short", "integer", "long"},
    {"float", "double"},
)


def reconcile(
    table_schema: T.StructType,
    batch_schema: T.StructType,
    engine_cols: set[str] | None = None,
    key_cols: list[str] | None = None,
) -> tuple[T.StructType, list[str], list[tuple[str, str, str]]]:
    """Return (evolved_schema, added_cols, widened [(col, old, new)]).

    Column matching is case-insensitive (reference `get_ignore_case`
    semantics); the table's existing casing wins.

    ``key_cols``: bucketing keys. A key column may only re-type within a
    hash-stable family (integral→long, float→double — bucket_expr hashes
    those normalized); any other change (int→double, date→timestamp) would
    silently re-map every file's bucket id, so it raises instead of
    corrupting merge pruning.
    """
    engine_cols = engine_cols or set()
    key_lower = {k.lower() for k in (key_cols or [])}
    by_lower = {f.name.lower(): f for f in table_schema.fields}
    added: list[str] = []
    widened: list[tuple[str, str, str]] = []
    out_fields = {f.name: f for f in table_schema.fields}
    for bf in batch_schema.fields:
        if bf.name.lower() in {c.lower() for c in engine_cols}:
            continue
        tf = by_lower.get(bf.name.lower())
        if tf is None:
            out_fields[bf.name] = T.StructField(bf.name, bf.dataType, True)
            added.append(bf.name)
            continue
        new_t = _widened(tf.dataType, bf.dataType)
        if new_t is None:
            raise SchemaEvolutionError(
                f"incompatible type change for column {tf.name}: "
                f"{tf.dataType.simpleString()} vs {bf.dataType.simpleString()}"
            )
        if new_t != tf.dataType:
            if tf.name.lower() in key_lower:
                fam = (tf.dataType.typeName(), new_t.typeName())
                if not any(
                    fam[0] in f and fam[1] in f for f in _KEY_SAFE_FAMILIES
                ):
                    raise SchemaEvolutionError(
                        f"key column {tf.name} cannot change "
                        f"{tf.dataType.simpleString()}→{new_t.simpleString()}: "
                        "the bucket hash is not invariant under it"
                    )
            widened.append((tf.name, tf.dataType.simpleString(), new_t.simpleString()))
            out_fields[tf.name] = T.StructField(tf.name, new_t, True)
    return T.StructType(list(out_fields.values())), added, widened
