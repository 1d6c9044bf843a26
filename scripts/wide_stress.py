"""Candidate-scale stress for recommend()'s driver submission loop
(r8 verdict item 4).

The reference's widest real workload ("data training m1.csv",
reference search.py test set) is 102 columns whose dim clusters span
~100 numeric columns. This script synthesizes that shape at bench-SF
row counts and measures how the planner + thread-pooled prefetch loop
scale as the submitted-candidate count grows ~10x past the standard
case — the watch item being the driver-side job submission serializing
(each bar group / frame job is a tiny Spark job whose cost is mostly
scheduler latency).

Run: python scripts/wide_stress.py [n_rows]
Prints one line per scenario:
  cols=<c> cap=<cap> cands=<frame+bar jobs> charts=<n> profile=<s>
  enumerate=<s> recommend=<s>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_transformation_2022_spark.engine import recommend  # noqa: E402
from data_transformation_2022_spark.plans.search import (  # noqa: E402
    enumerate_tpaths,
)
from data_transformation_2022_spark.profiler import profile_table  # noqa: E402
from data_transformation_2022_spark.session import get_spark  # noqa: E402


def wide_df(spark, n_rows: int, n_num: int):
    """Deterministic wide numeric table: n_num float columns with
    varied scales/offsets (so the profiler sees distinct distributions)
    plus two nominal grouping columns."""
    base = spark.range(n_rows)
    cols = [
        (
            ((F.col("id") * (2654435761 + 97 * i) + i * i) % 10_000).cast("double")
            / F.lit(float(7 + (i % 13)))
        ).alias(f"m{i:03d}")
        for i in range(n_num)
    ]
    return base.select(
        (F.col("id") % 7).cast("string").alias("g1"),
        (F.col("id") % 13).cast("string").alias("g2"),
        *cols,
    )


def one(spark, n_rows: int, n_num: int, cap: int) -> None:
    df = wide_df(spark, n_rows, n_num)
    t0 = time.time()
    prof = profile_table(df)
    t_prof = time.time() - t0
    t0 = time.time()
    pools = enumerate_tpaths(prof, max_depth=2)
    t_enum = time.time() - t0
    n_pool = {k: len(v) for k, v in pools.items()}
    t0 = time.time()
    res = recommend(
        df,
        profile=prof,
        dm_ts=["pca", "kmeans"],
        sample_cap=500,
        max_channel_candidates=cap,
    )
    t_rec = time.time() - t0
    print(
        f"cols={n_num + 2} cap={cap} pools={n_pool} charts={len(res.charts)} "
        f"profile={t_prof:.2f}s enumerate={t_enum:.2f}s recommend={t_rec:.2f}s",
        flush=True,
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    spark = get_spark(app_name="wide_stress")
    # warm the session (JVM/codegen) on the smallest case, untimed
    one(spark, 1_000, 8, 12)
    print("--- timed scenarios ---", flush=True)
    one(spark, n_rows, 8, 12)      # standard-ish shape (~20 candidates)
    one(spark, n_rows, 100, 12)    # reference m1.csv width, default caps
    one(spark, n_rows, 100, 60)    # ~5x candidate count
    one(spark, n_rows, 100, 120)   # ~10x candidate count
    spark.stop()


if __name__ == "__main__":
    main()
