"""File-level zone maps (min/max column stats) for LakeTable.

Plays the role Snowflake micro-partition metadata plays in the reference
(each micro-partition carries per-column min/max that the server uses to
prune scans; SampleCrud.scala's UPDATE/DELETE get that pruning for free).
Here:

- **collect**: at stage time, per-file min/max/null-count are read from the
  parquet FOOTERS the write already produced (pyarrow metadata read — a few
  KB per file, no data pages). They ride the commit's add-entries, so the
  snapshot has them driver-side with zero extra scans.
- **prune**: a mutation/scan predicate is compiled ONCE into a conservative
  "may this file contain a matching row?" closure by walking the Catalyst
  expression tree (And/Or/comparisons/In/IsNull/StartsWith). Anything the
  walker doesn't understand keeps the file — pruning is an optimization,
  never a correctness filter (the real predicate still runs on every
  surviving row).

Scale posture: at 100 TB a `DELETE ... WHERE ts > X` touches a handful of
files; without zone maps the discovery scan opens every footer+pages of the
table. With them, non-overlapping files are skipped driver-side before any
parquet I/O. Footer collection is threaded (it would live inside the write
tasks on a real cluster — same seam as Delta's stats collection).
"""

from __future__ import annotations

import datetime
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column
from pyspark.sql import types as T

# Stats are collected for the first STATS_MAX_COLS eligible (primitive,
# orderable, reliably-footer-stat'd) columns — Delta's
# dataSkippingNumIndexedCols, same rationale: wide tables shouldn't bloat
# the log with stats nobody filters on.
STATS_MAX_COLS = 32
_STR_CAP = 64
_MAX_CHAR = chr(0x10FFFF)

_ELIGIBLE = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.BooleanType,
)

_EPOCH_DT = datetime.datetime(1970, 1, 1)
_EPOCH_D = datetime.date(1970, 1, 1)


def stats_columns(schema: T.StructType) -> list[str]:
    out = []
    for f in schema.fields:
        if isinstance(f.dataType, _ELIGIBLE):
            out.append(f.name)
            if len(out) >= STATS_MAX_COLS:
                break
    return out


def _norm(v, is_min: bool):
    """Normalize a pyarrow stats value to a JSON-safe, Catalyst-comparable
    scalar: timestamps → UTC epoch micros (Catalyst literal encoding),
    dates → epoch days, strings capped at _STR_CAP chars with outward
    widening (a truncated min is a valid lower bound; a truncated max gets
    a max-codepoint suffix to stay an upper bound). None = unusable."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if v != v:  # NaN poisons ordering — drop the column's stats
            return None
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, datetime.datetime):
        # parquet stores timestamps UTC-normalized; pyarrow returns naive
        # (or tz-aware) datetimes — treat naive as UTC
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return int((v - _EPOCH_DT).total_seconds() * 1_000_000)
    if isinstance(v, datetime.date):
        return (v - _EPOCH_D).days
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        if len(v) > _STR_CAP:
            v = v[:_STR_CAP] + ("" if is_min else _MAX_CHAR)
        return v
    return None


def collect_file_stats(abs_path: str, cols: list[str]):
    """(num_rows, {col: {"min","max","nc"}}) from the parquet footer only."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    idx = {}
    for i in range(md.num_columns):
        # path_in_schema == name for flat (non-nested) columns
        idx.setdefault(md.schema.column(i).path, i)
    out: dict[str, dict] = {}
    for c in cols:
        ci = idx.get(c)
        if ci is None:
            continue
        mn = mx = None
        nc: int | None = 0
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None:
                ok = False
                break
            if st.null_count is None:
                nc = None
            elif nc is not None:
                nc += st.null_count
            if not st.has_min_max:
                # an all-null row group has no min/max but the column can
                # still prune on IsNull/IsNotNull via null counts
                continue
            lo, hi = _norm(st.min, True), _norm(st.max, False)
            if lo is None or hi is None:
                ok = False
                break
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
        if not ok:
            continue
        ent: dict = {}
        if mn is not None:
            ent["min"] = mn
            ent["max"] = mx
        if nc is not None:
            ent["nc"] = nc
        if ent:
            out[c] = ent
    return md.num_rows, out


def enrich_adds_with_stats(root: str, adds: list[dict], schema: T.StructType) -> None:
    """Fill rows + stats into staged add-entries, in place. Threaded footer
    reads; any failure degrades to a stat-less entry (never blocks the
    commit)."""
    import os

    cols = stats_columns(schema)

    def _one(a):
        try:
            n, st = collect_file_stats(os.path.join(root, a["path"]), cols)
            a["rows"] = n
            if st:
                a["stats"] = st
        except Exception:
            pass

    if not adds:
        return
    with ThreadPoolExecutor(max_workers=min(16, len(adds))) as ex:
        list(ex.map(_one, adds))


# --------------------------------------------------------------- pruning
#
# Spark 4 Columns wrap sql.internal ColumnNode trees (UnresolvedFunction /
# UnresolvedAttribute / Literal) — walked once via py4j at compile time,
# zero py4j traffic in the per-file loop.


def _args(e):
    s = e.arguments()
    return [s.apply(i) for i in range(s.size())]


def _attr_name(e) -> str | None:
    if e.getClass().getSimpleName() == "UnresolvedAttribute":
        parts = e.nameParts()
        return str(parts.apply(parts.size() - 1))
    return None


def _literal(e):
    """(value, ok) normalized to the same encoding _norm stored: python
    scalars as-is, java.sql.Timestamp → epoch micros, java.sql.Date →
    epoch days."""
    if e.getClass().getSimpleName() != "Literal":
        return None, False
    v = e.productElement(0)
    if v is None or isinstance(v, (bool, int, float, str)):
        return v, True
    if hasattr(v, "getClass"):
        cn = v.getClass().getName()
        if cn == "java.sql.Timestamp":
            # epoch-instant compare: both sides (stats and literal) went
            # through the same session-tz naive→instant conversion
            seconds = int(v.getTime()) // 1000
            return seconds * 1_000_000 + int(v.getNanos()) // 1000, True
        if cn == "java.sql.Date":
            d = datetime.date.fromisoformat(str(v.toString()))
            return (d - _EPOCH_D).days, True
    return None, False


def _cmp_closure(kind: str, name: str, lit):
    def fn(stats: dict, rows):
        st = stats.get(name)
        if st is None:
            return True
        mn, mx = st.get("min"), st.get("max")
        if mn is None or mx is None:
            # min/max unknown; only all-null files lack them when nc known
            nc = st.get("nc")
            return not (nc is not None and rows is not None and nc >= rows)
        try:
            if kind == "gt":
                return mx > lit
            if kind == "ge":
                return mx >= lit
            if kind == "lt":
                return mn < lit
            if kind == "le":
                return mn <= lit
            if kind == "eq":
                return mn <= lit <= mx
            if kind == "startswith":
                return mx >= lit and mn <= lit + _MAX_CHAR
        except TypeError:
            return True  # incomparable literal/stat types → keep
        return True

    return fn


_FLIP = {"gt": "lt", "ge": "le", "lt": "gt", "le": "ge", "eq": "eq"}
_CMP = {">": "gt", ">=": "ge", "<": "lt", "<=": "le", "=": "eq", "==": "eq", "<=>": "eq"}

_KEEP = lambda s, n: True  # noqa: E731 — the conservative default


def _null_possible(name):
    return lambda s, n, _c=name: (
        s.get(_c) is None or s[_c].get("nc") is None or s[_c]["nc"] > 0
    )


def _compile(e):
    """ColumnNode → may-match closure (stats, rows) -> bool. Conservative:
    unknown shapes compile to 'keep'."""
    cls = e.getClass().getSimpleName()
    if cls == "Literal":
        v, ok = _literal(e)
        if ok and isinstance(v, bool):
            return lambda s, n: v
        if ok and v is None:
            return lambda s, n: False  # WHERE NULL matches nothing
        return _KEEP
    if cls == "UnresolvedAttribute":
        # bare boolean column as predicate: prune files whose max is False
        name = _attr_name(e)

        def fn(s, n, _c=name):
            st = s.get(_c)
            return st is None or st.get("max") is not False

        return fn
    if cls != "UnresolvedFunction":
        return _KEEP
    fname = str(e.functionName())
    kids = _args(e)
    if fname == "and":
        l, r = _compile(kids[0]), _compile(kids[1])
        return lambda s, n: l(s, n) and r(s, n)
    if fname == "or":
        l, r = _compile(kids[0]), _compile(kids[1])
        return lambda s, n: l(s, n) or r(s, n)
    if fname == "!":
        # NOT of a bare boolean column: prune files whose min is True.
        name = _attr_name(kids[0])
        if name is not None:

            def fn(s, n, _c=name):
                st = s.get(_c)
                return st is None or st.get("min") is not True

            return fn
        return _KEEP  # NOT of a general predicate: no interval inversion
    if fname in _CMP:
        name, (lit, ok) = _attr_name(kids[0]), _literal(kids[1])
        if name is not None and ok:
            if lit is None:
                # col OP NULL: <=> matches null rows; others match none
                return _null_possible(name) if fname == "<=>" else (lambda s, n: False)
            return _cmp_closure(_CMP[fname], name, lit)
        name, (lit, ok) = _attr_name(kids[1]), _literal(kids[0])
        if name is not None and ok and lit is not None:
            return _cmp_closure(_FLIP[_CMP[fname]], name, lit)
        return _KEEP
    if fname == "in":
        name = _attr_name(kids[0])
        vals = []
        for k in kids[1:]:
            v, ok = _literal(k)
            if not ok:
                return _KEEP
            if v is not None:
                vals.append(v)
        if name is None:
            return _KEEP
        eqs = [_cmp_closure("eq", name, v) for v in vals]
        return lambda s, n: any(f(s, n) for f in eqs) if eqs else False
    if fname == "isNull":
        name = _attr_name(kids[0])
        return _null_possible(name) if name is not None else _KEEP
    if fname == "isNotNull":
        name = _attr_name(kids[0])
        if name is None:
            return _KEEP
        return lambda s, n, _c=name: (
            s.get(_c) is None
            or s[_c].get("nc") is None
            or n is None
            or s[_c]["nc"] < n
        )
    if fname == "startswith":
        name, (lit, ok) = _attr_name(kids[0]), _literal(kids[1])
        if name is not None and ok and isinstance(lit, str):
            return _cmp_closure("startswith", name, lit)
        return _KEEP
    return _KEEP


def compile_skipping_predicate(condition: Column | None):
    """Column → (stats: dict, rows: int|None) -> bool, or None when the
    predicate yields no skipping power (then skip the per-file loop)."""
    if condition is None:
        return None
    try:
        tree = condition._jc.node()
        return _compile(tree)
    except Exception:
        return None


def prune_files(files: dict[str, dict], condition: Column | None) -> list[str]:
    """Relative paths of files that MAY contain a matching row. Files
    without stats (pre-zone-map commits, unstatted columns) always
    survive."""
    pred = compile_skipping_predicate(condition)
    if pred is None:
        return list(files)
    out = []
    for p, meta in files.items():
        st = meta.get("stats")
        if not st or pred(st, meta.get("rows")):
            out.append(p)
    return out
