"""Deterministic, distributed fixture generators — pure Spark expressions.

Replaces the reference's driver-side random bean generators
(rest_beans/Generator.scala:11-39, Order.scala:15-21, Payment.scala:8-14,
Rating.scala:7-12, Restaurant.scala:12-16; value domains from
tt-dps-common/src/main/resources/dataset-domain.yml:1-40) with seeded
generators that scale: `spark.range(n)` + JVM-side expressions, zero
per-row Python, and — critically — **partitioning-independent determinism**:
all randomness derives from `xxhash64(id, seed)`, never `F.rand()` (whose
stream depends on partition layout, which differs between local[8] and
local[32]).

Also generates the BASELINE.json target fixtures:
- ``source_files``  (repo, path, commit, lang, content)
- ``change_events`` CDC log (lsn, op, repo, path, commit, lang, content, ts)
  with zipf-style hot-repo skew, duplicate-delivery injection, and
  schema-evolution episodes (FIXTURES.md §2/2a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH0 = 1704067200  # 2024-01-01T00:00:00Z

_MESSY_LANGS = [
    "Python", "py", "PY3", "python", "Scala", "scala", "JAVA", "java",
    "Go", "golang", "rust", "RS", "Markdown", "md", "unknown",
]


def _u(col, salt: str, seed: int):
    """Deterministic uniform [0,1) from a column + salt + seed."""
    return (F.pmod(F.xxhash64(col, F.lit(salt), F.lit(seed)), F.lit(1_000_000_000))
            .cast("double") / 1_000_000_000.0)


def _h(col, salt: str, seed: int, mod: int):
    return F.pmod(F.xxhash64(col, F.lit(salt), F.lit(seed)), F.lit(mod))


def _repo_expr(idx_col):
    return F.concat(F.lit("org"), (idx_col % 37).cast("string"), F.lit("/repo"), idx_col.cast("string"))


def _path_expr(pidx):
    return F.concat(
        F.lit("src/pkg"), (pidx % 13).cast("string"), F.lit("/mod"), pidx.cast("string"), F.lit(".py")
    )


def _content_expr(key_cols, length_col):
    base = F.sha2(F.concat_ws("|", *key_cols), 256)  # 64 hex chars
    reps = F.ceil(length_col / 64).cast("int") + 1
    return F.substring(F.repeat(base, 70), F.lit(1), length_col)


def change_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 50,
    paths_per_repo: int = 100,
    zipf_s: float = 0.0,
    dup_delivery_rate: float = 0.0,
    seed: int = 42,
    op_mix: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """CDC event log per FIXTURES.md §2. LSNs unique & totally ordered.

    zipf_s > 0 skews repo choice toward repo 0 via inverse-power sampling
    (P[repo 0] grows with s); zipf_s=0 is uniform.
    """
    df = spark.range(n_events).withColumn("lsn", F.col("id") + 1)
    u_repo = _u(F.col("lsn"), "repo", seed)
    if zipf_s > 0:
        ridx = F.floor(F.lit(n_repos) * F.pow(u_repo, F.lit(1.0 + zipf_s))).cast("long")
    else:
        ridx = F.floor(F.lit(n_repos) * u_repo).cast("long")
    ridx = F.least(ridx, F.lit(n_repos - 1))
    pidx = _h(F.col("lsn"), "path", seed, paths_per_repo)

    u_op = _u(F.col("lsn"), "op", seed)
    p_ins, p_upd, _ = op_mix
    op = (
        F.when(u_op < p_ins, "insert")
        .when(u_op < p_ins + p_upd, "update")
        .otherwise("delete")
    )
    length = (F.lit(64) + _h(F.col("lsn"), "len", seed, 4033)).cast("int")
    is_del = op == "delete"
    repo = _repo_expr(ridx)
    path = _path_expr(pidx)
    out = df.select(
        F.col("lsn"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        F.when(is_del, F.lit(None)).otherwise(
            F.substring(F.sha2(F.concat_ws("|", F.col("lsn"), F.lit("commit")), 256), 1, 40)
        ).alias("commit"),
        F.when(is_del, F.lit(None)).otherwise(
            F.element_at(
                F.array(*[F.lit(x) for x in _MESSY_LANGS]),
                (_h(F.col("lsn"), "lang", seed, len(_MESSY_LANGS)) + 1).cast("int"),
            )
        ).alias("lang"),
        F.when(is_del, F.lit(None)).otherwise(
            _content_expr([repo, path, F.col("lsn")], length)
        ).alias("content"),
        F.timestamp_seconds(F.lit(EPOCH0) + F.col("lsn")).alias("ts"),
    )
    if dup_delivery_rate > 0:
        dups = out.where(_u(F.col("lsn"), "dup", seed) < dup_delivery_rate)
        out = out.union(dups)
    return out


def change_events_evolution(
    spark: SparkSession, n_events: int, marker_frac: float = 0.5, seed: int = 42, **kw
) -> tuple[DataFrame, DataFrame]:
    """Schema-evolution episode (FIXTURES.md §2a): phase 1 events carry
    ``size int``; phase 2 (after the marker LSN) adds ``license string`` and
    widens ``size`` to long. Returned as two DataFrames with their own
    schemas — exactly how an upstream producer would deliver them."""
    base = change_events(spark, n_events, seed=seed, **kw)
    marker = int(n_events * marker_frac)
    is_del = F.col("op") == "delete"
    p1 = base.where(F.col("lsn") <= marker).withColumn(
        "size",
        F.when(is_del, F.lit(None)).otherwise(_h(F.col("lsn"), "size", seed, 100000).cast("int")),
    )
    p2 = (
        base.where(F.col("lsn") > marker)
        .withColumn(
            "size",
            F.when(is_del, F.lit(None)).otherwise(
                (_h(F.col("lsn"), "size", seed, 100000) + F.lit(2**33)).cast("long")
            ),
        )
        .withColumn(
            "license",
            F.when(is_del, F.lit(None)).otherwise(
                F.element_at(
                    F.array(F.lit("mit"), F.lit("apache-2.0"), F.lit("gpl-3.0")),
                    (_h(F.col("lsn"), "lic", seed, 3) + 1).cast("int"),
                )
            ),
        )
    )
    return p1, p2


def source_files(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Direct generator for the BASELINE input_hint table shape."""
    df = spark.range(n)
    repo = _repo_expr(_h(F.col("id"), "repo", seed, max(n // 100, 1)))
    path = _path_expr(F.col("id"))
    length = (F.lit(64) + _h(F.col("id"), "len", seed, 4033)).cast("int")
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat_ws("|", F.col("id"), F.lit("c")), 256), 1, 40).alias("commit"),
        F.element_at(
            F.array(*[F.lit(x) for x in _MESSY_LANGS]),
            (_h(F.col("id"), "lang", seed, len(_MESSY_LANGS)) + 1).cast("int"),
        ).alias("lang"),
        _content_expr([repo, path, F.col("id")], length).alias("content"),
    )


# ------------------------------------------------- reference-domain tables
# Value domains: dataset-domain.yml:1-40; bean shapes: Restaurant.scala:12-16,
# Order.scala:15-21, Payment.scala:8-14, Rating.scala:7-12. Dates stored as
# ISO strings, money as double rounded to 2dp (Generator.scala:29-34).

_PREFIXES = ["AA", "AB", "AD", "AM", "BA", "BB", "BD", "BM"]
_PAY_TYPES = ["CASH", "VISA", "AMEX", "MC", "OTHER"]


def _code(idcol, salt, seed, lo, hi):
    pfx = F.element_at(
        F.array(*[F.lit(p) for p in _PREFIXES]), (_h(idcol, salt + "p", seed, 8) + 1).cast("int")
    )
    num = (_h(idcol, salt + "n", seed, hi - lo) + lo).cast("string")
    return F.concat(pfx, num)


def _email(idcol, salt, seed):
    return F.concat(
        F.substring(F.sha2(F.concat_ws("|", idcol, F.lit(salt + "u")), 256), 1, 5),
        F.lit("@"),
        F.substring(F.sha2(F.concat_ws("|", idcol, F.lit(salt + "d")), 256), 1, 4),
        F.lit(".com"),
    )


def _iso_date(idcol, salt, seed, days=120):
    return F.date_format(
        F.date_add(F.lit("2024-01-01").cast("date"), _h(idcol, salt, seed, days).cast("int")),
        "yyyy-MM-dd",
    )


def _money(idcol, salt, seed, lo=5.0, hi=500.0):
    return F.round(F.lit(lo) + _u(idcol, salt, seed) * F.lit(hi - lo), 2)


def restaurants(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    df = spark.range(n)
    return df.select(
        _code(F.col("id"), "rest", seed, 100, 299).alias("restaurantCode"),
        F.concat(F.lit("Restaurant "), F.col("id").cast("string")).alias("restaurantName"),
        (_h(F.col("id"), "cap", seed, 240) + 10).cast("int").alias("peopleCapacity"),
    ).dropDuplicates(["restaurantCode"])


def orders(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    df = spark.range(n)
    return df.select(
        _code(F.col("id"), "ord", seed, 1000, 4000).alias("orderCode"),
        _email(F.col("id"), "ord", seed).alias("customerEmail"),
        _money(F.col("id"), "price", seed).alias("totPrice"),
        _code(F.col("id"), "rest", seed, 100, 299).alias("restaurantCode"),
        _iso_date(F.col("id"), "odate", seed).alias("dateOfOrder"),
    ).dropDuplicates(["orderCode"])


def payments(spark: SparkSession, n: int, seed: int = 42, orders_df: DataFrame | None = None) -> DataFrame:
    df = spark.range(n)
    out = df.select(
        F.sha2(F.concat_ws("|", F.col("id"), F.lit("paycode")), 256).alias("paymentCode"),
        F.element_at(
            F.array(*[F.lit(p) for p in _PAY_TYPES]), (_h(F.col("id"), "ptype", seed, 5) + 1).cast("int")
        ).alias("paymentType"),
        _iso_date(F.col("id"), "pdate", seed).alias("paymentDate"),
        _code(F.col("id"), "ord", seed, 1000, 4000).alias("orderCode"),
        _money(F.col("id"), "amount", seed, 1.0, 300.0).alias("amount"),
    )
    return out


def ratings(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    df = spark.range(n)
    return df.select(
        _code(F.col("id"), "rest", seed, 100, 299).alias("restaurantCode"),
        _h(F.col("id"), "rate", seed, 101).cast("int").alias("ratingInPercentage"),
        _iso_date(F.col("id"), "rdate", seed).alias("dateOfRate"),
        # share the orders email domain (salt "ord") so the reference's
        # 3-way join on (restaurantCode, customerEmail) —
        # PaidWithAmexRatingGt50.scala:33-44 — has real matches, as the
        # shared customer population does in the reference's generator.
        _email(F.col("id"), "ord", seed).alias("customerEmail"),
    )
