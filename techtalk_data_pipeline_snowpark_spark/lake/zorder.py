"""Z-order clustering expression — multi-column data layout for zone maps.

``compact(sort_by=[c])`` gives one-dimensional clustering: range-disjoint
files on c, so zone maps prune scans on c to ~1 file per bucket — and prune
NOTHING on any other column. Real read workloads filter on more than one
column; the classic fix (Delta ``OPTIMIZE ... ZORDER BY``, public Iceberg
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')``)
is to sort by a space-filling curve over all cluster columns: each output
file then covers a small HYPER-RECTANGLE of the value space instead of a
thin slab, so a predicate on ANY clustered column skips most files.

Construction (everything below is driver-side planning + one JVM-side
expression — zero Python runs per row):

1. **Rank-normalize** each column to a ``2**bits_per_col``-cell grid using
   approximate quantile cut points (Greenwald-Khanna via
   ``DataFrame.approxQuantile`` — a single sample-based pass, constant-size
   driver result; this is the same rank-before-interleave move as Delta's
   range-partition-id, and what makes the curve robust to skew: equi-WIDTH
   cells would put 99% of a zipfian column in one cell and cluster
   nothing).
2. **Bit-interleave** the per-column cell ids into one z-value with
   ``shiftleft``/``shiftright``/``bitwiseAND`` — a plain Catalyst integer
   expression, codegen-friendly.
3. The existing staged write sorts each bucket by the z-value and slices
   the sorted run with ``maxRecordsPerFile`` into z-range-disjoint files;
   the existing parquet-footer zone maps (lake/stats.py) then carry narrow
   per-column min/max per file. No read-side change at all — ``read_where``
   prunes on every clustered column automatically.

At 100 TB: the quantile pass is one scan with a tiny aggregate; the rewrite
itself is the same bucket-parallel staged write every compact does. Cost is
one extra pass over the victims, amortized over every future pruned scan.

Reference parity: the reference's Snowflake tables get this from
``CLUSTER BY`` server-side (no client code to mirror); this follows the
public Delta/Iceberg z-order design instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RANKABLE_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _numeric_view(name: str, dt: T.DataType) -> Column:
    """An order-preserving double view of the column, for quantile cuts.
    Dates/timestamps map to epoch numbers; numerics cast directly."""
    c = F.col(name)
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if isinstance(dt, T.TimestampType):
        return c.cast("double")  # epoch seconds (fractional)
    if isinstance(dt, _RANKABLE_NUMERIC):
        return c.cast("double")
    raise ValueError(
        f"zorder: column {name!r} has type {dt.simpleString()}; z-order "
        "clustering needs a rank-normalizable type (numeric/date/timestamp)"
    )


def _cell_expr(numeric: Column, cuts: list[float]) -> Column:
    """Cell id 0..len(cuts) from quantile cut points — a chained-when
    binary-search substitute (len(cuts) <= 15 for the default 4 bits, so
    the codegen'd comparison chain is tiny). NULLs fall through every
    `when` to the top cell: they cluster together at the curve's end."""
    cell: Column = F.lit(len(cuts))
    for i in reversed(range(len(cuts))):
        cell = F.when(numeric <= F.lit(cuts[i]), F.lit(i)).otherwise(cell)
    return cell


def _numerics_for(schema: T.StructType, cols: list[str]) -> list[Column]:
    by_name = {f.name.lower(): f.dataType for f in schema.fields}
    numerics = []
    for c in cols:
        dt = by_name.get(c.lower())
        if dt is None:
            raise ValueError(f"zorder: unknown column {c!r}")
        numerics.append(_numeric_view(c, dt))
    return numerics


def zorder_cuts(
    df: DataFrame, cols: list[str], bits_per_col: int = 4
) -> list[list[float]]:
    """One approxQuantile pass over ``df`` → per-column cut points (the
    rank-normalization grid). The driver result is tiny
    (``cols × (2**bits_per_col - 1)`` floats) and JSON-serializable, so a
    table can PERSIST it (``lake.cluster_by`` property) and later writers
    can rebuild the identical curve without rescanning — slightly stale
    quantiles still cluster; the grid just drifts off the true ranks."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use plain sort_by for 1)")
    n_cells = 1 << bits_per_col
    numerics = _numerics_for(df.schema, cols)
    probs = [i / n_cells for i in range(1, n_cells)]
    qdf = df.select(
        *[num.alias(f"_zq{i}") for i, num in enumerate(numerics)]
    )
    all_cuts = qdf.approxQuantile(
        [f"_zq{i}" for i in range(len(cols))], probs, 0.001
    )
    out: list[list[float]] = []
    for cuts in all_cuts:
        # skew dedupe: a heavy value repeats across quantiles — identical
        # cuts collapse into one boundary (its mass shares a cell, which is
        # the best any total-order layout can do for one value)
        uniq: list[float] = []
        for v in cuts:
            if v is not None and (not uniq or v > uniq[-1]):
                uniq.append(v)
        out.append(uniq)
    return out


def zorder_expr_from_cuts(
    schema: T.StructType,
    cols: list[str],
    all_cuts: list[list[float]],
    bits_per_col: int = 4,
) -> Column:
    """The pure-JVM z-value Column from precomputed cut points — usable
    against any DataFrame carrying the same column names/types (merge
    rewrites reuse a compact's persisted cuts this way)."""
    cell_exprs = [
        _cell_expr(num, cuts)
        for num, cuts in zip(_numerics_for(schema, cols), all_cuts)
    ]
    # bit-interleave: z = ... b1 a1 b0 a0 (bit i of column j lands at
    # position i*len(cols)+j) — the standard Morton encoding
    z: Column = F.lit(0)
    for bit in range(bits_per_col):
        for j, cell in enumerate(cell_exprs):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + j,
                )
            )
    return z.alias("_zorder")


def zorder_expr(
    df: DataFrame, cols: list[str], bits_per_col: int = 4
) -> Column:
    """Build the z-value Column for ``cols`` over ``df``'s distribution.

    Runs one approxQuantile pass on ``df`` (driver gets ``2**bits_per_col``
    cut points per column), returns a pure-JVM integer expression usable as
    a sort key against any DataFrame carrying the same column names."""
    return zorder_expr_from_cuts(
        df.schema, cols, zorder_cuts(df, cols, bits_per_col), bits_per_col
    )


def zorder_slice_expr(
    z: Column, n_cols: int, bits_per_col: int, target_files: int
) -> tuple[Column, int]:
    """Aligned file slicing: the top ``log2(target_files)`` bits of the
    z-value. Splitting the curve at ALIGNED prefix boundaries (not at
    row-count boundaries) is what makes every file an exact subcube of the
    grid — a run sliced purely by ``maxRecordsPerFile`` drifts across cube
    boundaries and smears one dimension's min/max over neighboring files.
    Returns (slice Column, number of slices <= target_files)."""
    total_bits = bits_per_col * n_cols
    slice_bits = max(0, min(total_bits, target_files.bit_length() - 1))
    return (
        F.shiftright(z, total_bits - slice_bits).alias("_zs"),
        1 << slice_bits,
    )
