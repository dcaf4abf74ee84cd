"""Training-corpus sharding — deterministic splits and token-budget packing.

Two operators every large-scale training-data pipeline needs downstream of
dedup/quality filtering (beyond-reference family the brief asks for; the
reference pipelines in `/root/reference` stop at per-row transforms):

* **hash_split** — assign every document to train/val/test by hashing its
  id. The assignment is a pure function of (id, salt): stable across runs,
  cluster sizes, and row order; adding documents never moves an existing
  one between splits. Implemented as lexicographic threshold comparison on
  the first 8 hex chars of md5 — fixed-width lowercase hex compares
  exactly like the underlying 32-bit integer, so the same rule is
  expressible verbatim in ANSI SQL (the DuckDB oracle runs the identical
  CASE expression). Map-only: no shuffle, no UDF, whole-stage codegen.

* **pack_shards** — pack documents into fixed-token-budget shards in
  deterministic id order: shard_id = floor(exclusive_prefix_sum(tokens)
  / budget). The textbook formulation is a GLOBAL window (one partition =
  one sorted task = dead at 100 TB); here it's the distributed two-phase
  prefix sum: range-repartition on id (pid order == global key order by
  the RangePartitioner contract), per-partition exclusive cumsum via a
  partition-local window, plus a broadcast map of per-partition offsets
  (one bounded ≤num_partitions-row collect). One shuffle total, every
  window confined to its partition — the plan survives 1000 executors.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "chunk_documents",
    "deterministic_shuffle",
    "hash_split",
    "hash_split_expr",
    "mixture_resample",
    "pack_sequences",
    "pack_shards",
    "stratified_sample",
]

_HEX_WIDTH = 8  # first 8 md5 hex chars = 32 uniform bits; plenty for splits


def _hash_prefix(ident: Column, salt: str) -> Column:
    """The shared decision hash: first _HEX_WIDTH chars of md5(id||salt).
    hash_split and mixture_resample (and their DuckDB oracles) must all
    hash identically — change it here or nowhere."""
    return F.substring(F.md5(F.concat(ident.cast("string"), F.lit(salt))), 1, _HEX_WIDTH)


def _thresholds(weights: Mapping[str, float]) -> list[tuple[str, str]]:
    """(label, exclusive upper hex bound) per split, in declaration order.

    Bounds are cumulative fractions of 16^8 rendered as zero-padded
    lowercase hex so that lexicographic `<` on the md5 prefix equals
    numeric `<` on the hash value.
    """
    if not weights:
        raise ValueError("hash_split needs at least one split weight")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out: list[tuple[str, str]] = []
    acc = 0.0
    for label, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for split {label!r}")
        acc += w / total
        bound = min(int(acc * (16 ** _HEX_WIDTH)), 16 ** _HEX_WIDTH)
        out.append((label, format(min(bound, 16 ** _HEX_WIDTH - 1), "08x")))
    # Last split is the catch-all: its bound is never compared.
    return out


def hash_split_expr(id_col: Column | str, weights: Mapping[str, float], salt: str = "") -> Column:
    """Column expression assigning a split label; see :func:`hash_split`."""
    ident = F.col(id_col) if isinstance(id_col, str) else id_col
    h = _hash_prefix(ident, salt)
    ths = _thresholds(weights)
    expr = F.lit(ths[-1][0])
    for label, bound in reversed(ths[:-1]):
        expr = F.when(h < F.lit(bound), F.lit(label)).otherwise(expr)
    return expr


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Stamp a deterministic train/val/test split label onto every row.

    ``weights`` maps label -> relative weight (normalized; default
    80/10/10 train/val/test). ``salt`` reshuffles the assignment without
    touching the data — bump it to draw a fresh split. Map-only and
    oracle-exact: the same md5-prefix CASE runs in DuckDB.
    """
    w = dict(weights) if weights else {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(split_col, hash_split_expr(id_col, w, salt))


def hash_split_oracle_case(id_col: str, weights: Mapping[str, float], salt: str = "") -> str:
    """The ANSI-SQL CASE equivalent of :func:`hash_split_expr` (DuckDB oracle)."""
    ths = _thresholds(dict(weights))
    h = f"substr(md5({id_col} || '{salt}'), 1, {_HEX_WIDTH})"
    arms = "".join(
        f" WHEN {h} < '{bound}' THEN '{label}'" for label, bound in ths[:-1]
    )
    return f"CASE{arms} ELSE '{ths[-1][0]}' END"


def pack_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    shard_col: str = "shard_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign ``shard_id = floor(exclusive_prefix_sum(tokens) / budget)``
    over rows ordered by ``id_col`` — token-budget shard packing.

    Distributed two-phase prefix sum (no global sort partition):

    1. ``repartitionByRange`` on id — the RangePartitioner guarantees
       every key in partition p sorts before every key in partition p+1,
       so global order = (pid, id) order. The ranged frame is eagerly
       localCheckpoint-ed so the boundary sampling happens exactly once
       for both passes.
    2. Per-partition totals (``groupBy(pid)`` — at most num_partitions
       rows collected) become a literal offset map on the driver.
    3. Each row's exclusive global prefix = its partition's offset + a
       partition-LOCAL exclusive running sum (window partitioned by pid,
       never global).

    Cost: one range shuffle + one bounded collect; scales linearly.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    prefixed = _with_exclusive_prefix(df, id_col, tokens_col, num_partitions)
    return prefixed.withColumn(
        shard_col,
        F.floor(F.col("__prefix") / F.lit(int(budget))).cast("long"),
    ).drop("__prefix")


def _with_exclusive_prefix(
    df: DataFrame, id_col: str, tokens_col: str, num_partitions: int | None
) -> DataFrame:
    """df + ``__prefix`` = exclusive global prefix sum of ``tokens_col``
    over rows ordered by ``id_col`` — the distributed two-phase decomposition
    shared by pack_shards and pack_sequences (see pack_shards docstring)."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    n = int(n)
    # Eager localCheckpoint (not persist): pins the sampled range boundaries
    # so both passes see identical pids, cuts lineage, and — unlike a cache
    # entry, which the CacheManager keeps alive indefinitely — its blocks
    # are reclaimed by the ContextCleaner once the result is unreachable
    # (no per-call storage leak in a long-lived driver).
    ranged = (
        df.repartitionByRange(n, F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid")
        .agg(F.coalesce(F.sum(F.col(tokens_col).cast("long")), F.lit(0)).alias("t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])
    if offsets:
        pairs: list[Column] = []
        for pid, off in offsets.items():
            pairs.extend([F.lit(pid), F.lit(off)])
        off_expr = F.element_at(F.create_map(*pairs), F.col("__pid"))
    else:
        off_expr = F.lit(0)
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_prefix = F.coalesce(F.sum(F.col(tokens_col).cast("long")).over(w), F.lit(0))
    return ranged.withColumn("__prefix", off_expr + local_prefix).drop("__pid")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay all documents end to end in
    ``id_col`` order and cut the token stream into fixed ``seq_len``
    windows — the GPT-style pre-training packing step. Every document gets
    its deterministic position: ``seq_id`` (the window holding its first
    token), ``seq_offset`` (position within that window), and ``n_seqs``
    (how many windows its tokens span — the boundary-crossing docs an
    attention-mask builder needs to know about; 0 for token-less docs).

    Same distributed two-phase prefix sum as `pack_shards` (one range
    shuffle, partition-local windows, ≤num_partitions-row collect — never
    a global sort partition); the chunk arithmetic is pure integer
    expressions, so the operator has an exact SQL oracle."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    prefixed = _with_exclusive_prefix(df, id_col, tokens_col, num_partitions)
    pre = F.col("__prefix")
    toks = F.col(tokens_col).cast("long")
    ln = F.lit(int(seq_len))
    seq_id = F.floor(pre / ln).cast("long")
    return (
        prefixed.withColumn("seq_id", seq_id)
        .withColumn("seq_offset", (pre % ln).cast("long"))
        .withColumn(
            "n_seqs",
            F.when(
                toks > 0, F.floor((pre + toks - 1) / ln).cast("long") - seq_id + 1
            ).otherwise(F.lit(0).cast("long")),
        )
        .drop("__prefix")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    rank_col: str = "shuffle_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Epoch shuffle: a deterministic pseudorandom global ordering of the
    corpus — every row gets ``rank_col`` = its position (0-based) when
    rows are sorted by md5(id‖salt). A training run re-shuffles per epoch
    by changing the salt; the permutation is a pure function of (ids,
    salt), so every worker, run, and cluster size sees the identical
    order — the reproducibility property `hash_split` gives splits,
    applied to ordering.

    The textbook formulation is a global ``row_number`` window (one
    sorted task — dead at scale). Here the rank is the exclusive prefix
    COUNT over the hash order: range-repartition on the unique shuffle
    key (md5 ‖ zero-padded id, so the order is total even under a hash
    collision), then the same two-phase prefix sum as `pack_shards` with
    a constant weight of 1. One range shuffle, partition-local windows,
    bounded collect."""
    key = F.concat(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
        F.lit("-"),
        F.lpad(F.col(id_col).cast("string"), 24, "0"),
    )
    keyed = df.withColumn("__skey", key).withColumn("__one", F.lit(1))
    ranked = _with_exclusive_prefix(keyed, "__skey", "__one", num_partitions)
    return ranked.withColumn(rank_col, F.col("__prefix").cast("long")).drop(
        "__skey", "__one", "__prefix"
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    stride: int | None = None,
    index_col: str = "chunk_id",
    chunk_col: str = "chunk_text",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the per-document counterpart of :func:`pack_sequences` (which concats
    the corpus then chunks): long-context training and embedding indexing
    both want each document cut into ``window``-token pieces advancing by
    ``stride`` tokens (overlap = window − stride), never mixing documents.

    Chunk ``i`` covers whitespace tokens ``[i*stride, i*stride+window)``;
    the chunk count is ``ceil(max(n−window, 0)/stride) + 1`` so the final
    window always reaches the last token (the tail chunk may be shorter
    than ``window``; ``tokens_col`` carries each chunk's true length).
    Token-less documents (NULL/blank text) produce no rows.

    Plan shape: filter → split → explode(sequence) → slice/array_join.
    Map-only — zero shuffles, chunk fan-out bounded per document by
    ``n/stride`` — and pure JVM expressions (whole-stage codegen), so it
    scales as a linear pass over the corpus. Tokenization (strip then
    split on ``\\s+``) matches `functions/text.token_count`, and every
    step is replayable in ANSI SQL, so the operator has an exact oracle.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    stride = window if stride is None else stride
    if stride <= 0:
        raise ValueError("stride must be positive")
    w, s = int(window), int(stride)
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    base = (
        df.where(F.col(text_col).isNotNull())
        .withColumn("__toks", F.split(stripped, r"\s+"))
        .where((F.size("__toks") > 0) & (F.element_at("__toks", 1) != ""))
        .withColumn("__n", F.size("__toks"))
    )
    extra = F.greatest(F.col("__n") - w, F.lit(0))
    last_idx = F.floor((extra + (s - 1)) / s).cast("int")
    start = F.col("__i").cast("int") * s
    return (
        base.withColumn("__i", F.explode(F.sequence(F.lit(0), last_idx)))
        .withColumn(index_col, F.col("__i").cast("long"))
        .withColumn(chunk_col, F.array_join(F.slice("__toks", start + 1, F.lit(w)), " "))
        .withColumn(tokens_col, F.least(F.lit(w), F.col("__n") - start).cast("long"))
        .drop("__toks", "__n", "__i")
    )


def chunk_documents_oracle(
    table: str,
    id_col: str,
    text_col: str,
    window: int,
    stride: int | None = None,
) -> str:
    """The exact DuckDB replay of :func:`chunk_documents` (same strip,
    same ``\\s+`` split, same 1-based inclusive slice arithmetic)."""
    w = int(window)
    s = int(window if stride is None else stride)
    return f"""
WITH stripped AS (
  SELECT *, regexp_split_to_array(
           regexp_replace({text_col}, '^\\s+|\\s+$', '', 'g'), '\\s+') AS toks
  FROM {table}
  WHERE {text_col} IS NOT NULL
), docs AS (
  SELECT *, len(toks) AS n FROM stripped
  WHERE len(toks) > 0 AND toks[1] <> ''
), idx AS (
  SELECT {id_col}, toks, n,
         unnest(generate_series(0, (greatest(n - {w}, 0) + {s - 1}) // {s})) AS i
  FROM docs
)
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_id,
       array_to_string(toks[i*{s}+1 : i*{s}+{w}], ' ') AS chunk_text,
       CAST(least({w}, n - i*{s}) AS BIGINT) AS n_tokens
FROM idx
"""


def _frac_hex(frac: float) -> str:
    """Hex bound for a keep-fraction in [0, 1] (same scheme as splits)."""
    bound = max(0, min(int(frac * (16 ** _HEX_WIDTH)), 16 ** _HEX_WIDTH - 1))
    return format(bound, "08x")


def mixture_resample(
    df: DataFrame,
    group_col: str,
    weights: Mapping[str, float],
    id_col: str,
    salt: str = "",
    default_weight: float = 1.0,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic data-mixture resampling: every row is kept
    ``floor(w)`` times plus one more iff md5(id‖salt) prefix falls under
    the fractional part of its group's weight — so w=0.25 downsamples to
    a quarter, w=2.5 emits 2 or 3 copies, and the realized mix converges
    to the target proportions. Pure function of (id, group, salt): stable
    under corpus growth and row order; map-only (the explosion is a
    per-row ``sequence``/``explode``, no shuffle). Groups absent from
    ``weights`` get ``default_weight``. Output rows carry ``copy_col``
    (0-based) so downstream shuffling/packing can distinguish copies.
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be non-negative")
    h = _hash_prefix(F.col(id_col), salt)

    def _copies(w: float) -> Column:
        full = int(w)
        frac = w - full
        extra = (h < F.lit(_frac_hex(frac))).cast("int") if frac > 0 else F.lit(0)
        return F.lit(full) + extra

    copies = _copies(default_weight)
    for g, w in weights.items():
        copies = F.when(F.col(group_col) == F.lit(g), _copies(w)).otherwise(copies)
    return (
        df.withColumn("__copies", copies)
        .where(F.col("__copies") >= 1)  # guard: Spark sequence(0,-1) would auto-step backwards
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__copies") - 1)))
        .withColumn(copy_col, F.col(copy_col).cast("long"))
        .drop("__copies")
    )


def mixture_resample_oracle(
    table: str,
    group_col: str,
    weights: Mapping[str, float],
    id_col: str,
    salt: str = "",
    default_weight: float = 1.0,
    copy_col: str = "copy_id",
    select: Sequence[str] = (),
) -> str:
    """ANSI-SQL (DuckDB) equivalent of :func:`mixture_resample`."""
    h = f"substr(md5(CAST({id_col} AS VARCHAR) || '{salt}'), 1, {_HEX_WIDTH})"

    def _copies(w: float) -> str:
        full = int(w)
        frac = w - full
        if frac > 0:
            return f"{full} + CASE WHEN {h} < '{_frac_hex(frac)}' THEN 1 ELSE 0 END"
        return str(full)

    arms = "".join(
        f" WHEN {group_col} = '{g}' THEN {_copies(w)}" for g, w in weights.items()
    )
    cols = ", ".join(select) if select else "*"
    return (
        f"SELECT {cols}, CAST(unnest(range(__copies)) AS BIGINT) AS {copy_col} "
        f"FROM (SELECT *, CASE{arms} ELSE {_copies(default_weight)} END AS __copies "
        f"FROM {table})"
    )


def shard_manifest(packed: DataFrame, tokens_col: str, shard_col: str = "shard_id") -> DataFrame:
    """Per-shard doc/token totals — the sanity view a packing run reports."""
    return packed.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"),
    )


def stratified_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically.

    `mixture_resample` hits a target FRACTION per group; eval sets, manual
    audits, and per-source inspection quotas need an exact COUNT. The
    sample is the k ids with the smallest md5(id‖salt) per group — a pure
    function of (id, group membership, salt): stable across runs, cluster
    sizes, and row order, re-drawable with a new salt, and exactly
    expressible as the rank-by-hash definition in ANSI SQL (the oracle).

    A single per-group ``row_number`` window would put every row of the
    hottest group on one task (the r1 scale hazard), so the sample is a
    genuine two-stage exact top-k, ascending by hash: stage 1 is a
    MAP-SIDE ``mapInPandas`` pass (the `heavyhitters.py` phase-1 idiom)
    that reduces each input partition to its local k smallest hashes per
    group BEFORE any exchange — a JVM ``collect_list`` aggregate could
    not do this, because its partial buffers must ship every row for the
    final sort+slice — so the one shuffle carries ≤ k rows per
    (group, partition); stage 2 ranks the ≤ k·P survivors with the
    per-group window. Single-partition inputs skip stage 1 (the window
    alone is already safe there). Returns (group_cols…, id_col,
    sample_rank) with sample_rank 1..min(k, |group|)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    hashed = df.select(*group_cols, F.col(id_col), h.alias("__h"))
    try:
        nparts = hashed.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — conversion quirks never break sampling
        nparts = None
    gcols = list(group_cols)
    sort_cols = ["__h", id_col]
    if nparts != 1:

        def local_topk(batches):
            import pandas as pd

            best = None
            for pdf in batches:
                cur = pd.concat([best, pdf]) if best is not None else pdf
                # mergesort: stable, and (__h, id) is a total order anyway
                cur = cur.sort_values(sort_cols, kind="mergesort")
                # bounded state: ≤ k rows per group survive each batch
                best = cur.groupby(gcols, dropna=False, sort=False).head(k)
            if best is not None and len(best):
                yield best

        hashed = hashed.mapInPandas(local_topk, hashed.schema)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    return (
        hashed.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
        .select(*group_cols, id_col, "sample_rank")
    )
