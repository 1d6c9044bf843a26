"""Relational operators used by chart assembly (reference §2.3):
group-by aggregation, sort, top-k, positional concat, distinct.

All are thin, declarative wrappers over DataFrame ops so Catalyst keeps
full optimization freedom (pushdown, partial aggregation, AQE). The
wrappers exist to pin the *reference semantics* (column naming, tie
order, NaN policy) in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RID = "__rid"


def group_sum(df: DataFrame, key: str, value_cols: list[str]) -> DataFrame:
    """``sum_bar`` aggregation: groupBy(key).sum over value cols, output
    columns named ``SUM(col)`` (reference ``search.py:949-965``).

    Map-side partial aggregation + single shuffle on ``key``; at scale,
    skewed keys are handled by AQE skew handling (enabled in session).
    """
    aggs = [F.sum(F.col(c)).alias(f"SUM({c})") for c in value_cols]
    return df.groupBy(key).agg(*aggs)


def group_count(df: DataFrame, key: str, out: str = "COUNT") -> DataFrame:
    """``count_bar`` aggregation (reference ``search.py:966-971``)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias(out))


def order_by(df: DataFrame, cols: list[str], ascending: bool = True) -> DataFrame:
    """Chart x-axis sort (reference ``search.py:1195-1197``). Ties broken
    by ``__rid`` when present, matching pandas stable sort."""
    exprs = [F.col(c).asc() if ascending else F.col(c).desc() for c in cols]
    if RID in df.columns:
        exprs.append(F.col(RID).asc())
    return df.orderBy(*exprs)


def rank_first(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """pandas ``rank(method="first")`` (reference ``search.py:1198,1229``):
    row_number over (value, __rid)."""
    tie = [F.col(RID)] if RID in df.columns else []
    w = Window.orderBy(F.col(col), *tie)
    return df.withColumn(out or f"rank {col}", F.row_number().over(w).cast("bigint"))


def top_k(df: DataFrame, order_col: str, k: int, ascending: bool = False, tie_cols: list[str] | None = None) -> DataFrame:
    """Deterministic top-k (reference ``search.py:1262-1278``): total
    order by (score desc, tie cols) then limit. Spark executes this as a
    TakeOrdered — no global sort materialization."""
    exprs = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    exprs += [F.col(c).asc() for c in (tie_cols or [])]
    return df.orderBy(*exprs).limit(k)


def nominalize(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Dense integer codes in sorted-unique order (reference
    ``Tengine.py:109-114``). Implemented as a broadcast join against the
    sorted distinct domain — scales better than a global dense_rank
    window when the domain is small (the nominal case by definition:
    ≤5% distinct)."""
    out = out or f"nominal({col})"
    domain = (
        df.select(col)
        .distinct()
        .withColumn(out, (F.dense_rank().over(Window.orderBy(F.col(col))) - 1).cast("bigint"))
    )
    return df.join(F.broadcast(domain), on=col, how="left")


def rid_concat(left: DataFrame, right: DataFrame) -> DataFrame:
    """Positional column concatenation (``pd.concat(axis=1)``, reference
    ``Tengine.py:114,131``): equi-join on the stable ``__rid``. Both
    sides derived from the same source share partitioning, so AQE
    usually turns this into a local join; across independent sources it
    is one shuffle on ``__rid``."""
    if RID not in left.columns or RID not in right.columns:
        raise ValueError("rid_concat requires __rid on both sides (see sources.with_rid)")
    dup = [c for c in right.columns if c != RID and c in left.columns]
    r = right
    for c in dup:
        r = r.withColumnRenamed(c, f"{c}#r")
    return left.join(r, on=RID, how="inner")


def distinct_domain(df: DataFrame, col: str) -> DataFrame:
    """Sorted distinct domain of a column (reference ``np.unique`` /
    ``set(cc)`` uses, ``spreadsheet.py:86,105``)."""
    return df.select(col).distinct().orderBy(col)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate the build side ``n_salt``
    times and scatter each probe row to one replica, so a hot key's rows
    spread over ``n_salt`` reducers instead of one.

    Same rows as ``probe.join(build, key)`` for inner joins — the salt
    only changes placement, never matching. Use when one join key holds
    a large fraction of the probe rows and AQE's skew-join split isn't
    available/enough; for dimension-sized build sides prefer
    ``F.broadcast`` (no shuffle at all).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    probe2 = probe.withColumn("__salt", salt.cast("int"))
    build2 = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return probe2.join(build2, [key, "__salt"], how).drop("__salt")


def skew_report(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective join/groupBy key: the
    ``top`` most frequent key values with counts and parts-per-million
    share — the report that decides whether a key needs salting
    (``salted_join``), AQE skew handling, or a broadcast.

    One partially-aggregated groupBy (map-side combine collapses each
    partition's repeats) + a ``top``-row TakeOrderedAndProject — never
    a global sort. The ppm share is exact integer arithmetic; the total
    derives from the counts aggregate inside the plan (no eager
    ``df.count()`` action, no second scan of the table).

    Deliberately orderBy().limit() + a window over the ``top``
    survivors, NOT one global row_number window: the former plans as a
    distributed TakeOrderedAndProject (per-partition top-k, k-row
    merge) with the tiny window touching ≤ ``top`` rows, while a
    single global window would single-reducer-sort the entire key
    domain."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    ranked = (
        counts.orderBy(F.col("n").desc(), F.col(key_col))
        .limit(top)
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("n").desc(), F.col(key_col))
        ))
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        F.col(key_col),
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST((n * 1000000) div greatest(__total, 1) AS BIGINT)").alias("ppm"),
    )


def merge_partial_rollup(
    old: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental aggregate maintenance: merge a MATERIALIZED rollup
    (n, sum_value per key group) with the rollup of a new data slice —
    counts add, decimal sums add — producing exactly the rollup a full
    recompute over old∪delta would (partial aggregation is associative;
    decimal addition is order-independent). This is the 100 TB ETL
    pattern: the nightly pipeline re-aggregates only the new partition
    and MERGEs, never rescanning the historical corpus. The merge
    itself is one partially-aggregated groupBy over the two
    metadata-sized aggregate tables."""
    both = old.select(*keys, "n", "sum_value").unionByName(
        delta.select(*keys, "n", "sum_value")
    )
    return both.groupBy(*keys).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_value").alias("sum_value"),
    )
