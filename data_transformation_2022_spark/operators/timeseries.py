"""Time-series resampling operators over event streams.

The reference has no time-series surface at all; these are part of the
large-scale pipeline extension set: regularizing an irregular event
stream onto a fixed calendar grid (per key) with forward fill — the
standard preprocessing step before windowed feature extraction.

Shape at scale: one window pass keyed by (key, bucket) for the
last-observation reduction, a sequence-explode grid (rows = keys ×
buckets, generated, never shuffled wide), one equi-join back, and one
ordered window per key for the fill — every stage partitions by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    unit: str = "day",
) -> DataFrame:
    """Per-key calendar resampling with forward fill.

    1. last observation per (key, bucket) — deterministic via a
       (ts, tie) descending row_number;
    2. dense per-key grid spanning [key_min, key_max] — one groupBy for
       the per-key bounds, then ``sequence``-generated buckets, no
       driver collect. The grid is bounded by each key's OWN lifetime:
       a key alive one day contributes one row even when another key
       spans years (the global-range crossJoin form generated
       keys × global_buckets dead rows — on a multi-year 100 TB event
       table that is orders of magnitude of never-filled grid);
    3. forward fill with ``last(value, ignorenulls=True)`` over the
       per-key ordered window. Every emitted bucket has an observation
       at or before it, so no NULLs survive the fill.
    """
    day = F.date_trunc(unit, F.col(ts_col)).cast("date")
    w_last = Window.partitionBy(key_col, "bucket").orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    last_per_bucket = (
        events.withColumn("bucket", day)
        .withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(key_col, "bucket", value_col)
    )
    bounds = last_per_bucket.groupBy(key_col).agg(
        F.min("bucket").alias("d0"), F.max("bucket").alias("d1")
    )
    grid = bounds.select(
        key_col, F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("bucket")
    )
    joined = grid.join(last_per_bucket, [key_col, "bucket"], "left")
    w_fill = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return joined.select(
        key_col,
        F.col("bucket"),
        F.last(value_col, ignorenulls=True).over(w_fill).alias(f"{value_col}_ffill"),
    )
