"""Scalable global ordering primitives.

A ``row_number()`` over an unpartitioned window moves EVERY row to one
reducer — fine at 400 rows (the reference's world, ``MAXSOURCEDATAROWS``
config.py:1), fatal at 100 TB. These helpers compute the same global
ranks with no single-reducer stage:

1. Sample the leading order key once on the driver and freeze ~P
   quantile boundaries as plan LITERALS. (``repartitionByRange`` is not
   usable here: its RangePartitioner seeds sampling from the RDD id, so
   two evaluations of the same plan can disagree on boundaries — the
   offsets collected from pass one would silently corrupt pass two.)
2. ``bucket = Σ (key ≥ boundary_i)`` — a pure, deterministic, codegen'd
   expression of the row, identical in every pass.
3. One counting pass per bucket (count, or locally-distinct count for
   dense ranks — disjoint across buckets because equal keys share a
   bucket) → cumulative offsets, a P-entry driver map.
4. A PARTITIONED window (partition = bucket) for the local rank, plus
   the broadcast offset.

Every stage is parallel; the only global objects are the boundary
literals and the offsets map (P entries each). Cost: two small driver
jobs (sample, counts) before the ranking pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__gr_bucket"
_SAMPLE_TARGET = 20_000


_NUMERIC_BASES = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def _boundaries(df: DataFrame, key: str, num_buckets: int) -> list:
    """~num_buckets-1 quantile boundaries of ``key``, deterministic given
    the input. Numeric keys: ONE percentile_approx aggregate (no count
    job, no driver sample). Other orderable types: seeded-sample
    fallback. Either way the result is frozen into the plan as literals,
    so every later pass agrees on bucket assignment."""
    if num_buckets <= 1:
        return []
    base = dict(df.dtypes)[key].split("(")[0]
    if base in _NUMERIC_BASES:
        probs = [i / num_buckets for i in range(1, num_buckets)]
        row = df.select(
            F.percentile_approx(key, probs, 10_000).alias("q")
        ).collect()[0]
        return sorted({v for v in (row["q"] or []) if v is not None})
    n = df.count()
    if n == 0:
        return []
    fraction = min(1.0, _SAMPLE_TARGET / n)
    vals = sorted(
        r[0]
        for r in df.select(key).filter(F.col(key).isNotNull()).sample(False, fraction, seed=42).collect()
    )
    if not vals:
        return []
    step = max(1, len(vals) // num_buckets)
    return sorted({vals[i] for i in range(step, len(vals), step)})


def _bucket_expr(key: str, bounds: list) -> Column:
    """bucket id = number of boundaries ≤ key (nulls → bucket 0, matching
    Spark's nulls-first default sort order)."""
    if not bounds:
        return F.lit(0)
    expr: Column = F.lit(0)
    for b in bounds:
        expr = expr + F.when(F.col(key) >= F.lit(b), 1).otherwise(0)
    return expr


def global_row_number(
    df: DataFrame,
    order_by: list[str],
    out_col: str,
    dense: bool = False,
    num_partitions: int | None = None,
    zero_based: bool = False,
) -> DataFrame:
    """Append ``out_col`` = global rank of each row under ``order_by``.

    ``dense=False`` → ``row_number`` semantics (pass a unique tie-break
    column as the last order key for determinism). ``dense=True`` →
    ``dense_rank`` semantics (equal keys share a rank, consecutive codes).

    Buckets come from the leading key only, so heavy skew on one value
    concentrates in one bucket — same behavior as any range partitioner;
    refine ``order_by`` or raise ``num_partitions`` if that bites.
    """
    sc = df.sparkSession.sparkContext
    n = num_partitions or sc.defaultParallelism
    lead = order_by[0]
    bounds = _boundaries(df, lead, n)
    part = df.withColumn(_BUCKET, _bucket_expr(lead, bounds))

    if dense:
        # equal keys share a bucket → per-bucket distinct counts are disjoint
        per_part = part.groupBy(_BUCKET).agg(
            F.count_distinct(*[F.col(c) for c in order_by]).alias("__n")
        )
    else:
        per_part = part.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("__n"))
    counts = {r[_BUCKET]: r["__n"] for r in per_part.collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    pairs: list = []
    for b, off in offsets.items():
        pairs.extend([F.lit(b), F.lit(off)])
    w = Window.partitionBy(_BUCKET).orderBy(*[F.col(c) for c in order_by])
    local = F.dense_rank() if dense else F.row_number()
    base = -1 if zero_based else 0
    off_map = F.create_map(*pairs) if pairs else None
    off_col = off_map[F.col(_BUCKET)] if off_map is not None else F.lit(0)
    return (
        part.withColumn(out_col, (local.over(w) + off_col + F.lit(base)).cast("bigint"))
        .drop(_BUCKET)
    )


def attach_global_rank(
    df: DataFrame,
    rid_col: str,
    value_col: str,
    out_col: str,
    dense: bool = False,
) -> DataFrame:
    """Rank one column and join the result back by row id — the scalable
    form of ``row_number().over(Window.orderBy(value))`` as a column
    expression. Shuffle profile: one bucket exchange + one rid join, no
    single-reducer stage.

    ``dense=False`` ranks by (value, rid) — pandas ``rank(method="first")``
    tie order (reference Tengine.py:107-108 with searchthread kwargs).
    ``dense=True`` gives np.unique-sorted dense codes (nominalize,
    reference Tengine.py:109-114), zero-based.
    """
    order = [value_col] if dense else [value_col, rid_col]
    ranked = global_row_number(
        df.select(rid_col, value_col),
        order,
        out_col,
        dense=dense,
        zero_based=dense,
    ).select(rid_col, out_col)
    return df.join(ranked, rid_col)
