"""Z-order (Morton) interleaving for multi-dimensional data clustering.

A 100 TB table range-partitioned on ONE column prunes scans only on
that column. Interleaving the bits of two quantized dimensions into a
single Morton key and clustering files by that key gives BOTH columns
tight per-file min/max ranges, so parquet footer stats prune
two-dimensional predicates — the layout trick behind Delta/Databricks
OPTIMIZE ZORDER and the classic UB-tree (Bayer 1997). Everything here
is pure integer/IEEE arithmetic (no UDF, map-only, codegen'd), so an
SQL oracle reproduces the keys bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cx: Column, cy: Column, bits: int) -> Column:
    """Interleave two ``bits``-wide non-negative integers into a
    ``2·bits``-wide Morton key: x occupies the even bit positions, y the
    odd — exactly ``zvalue_nd([cx, cy], bits)`` (one implementation;
    the N=2 round-robin layout is the classic 2-D Morton key)."""
    return zvalue_nd([cx, cy], bits)


def zorder_extent_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 10,
    bucket_bits: int = 4,
) -> DataFrame:
    """Cluster rows by Morton key and report each z-bucket's bounding
    box — the demonstration that z-clustering localizes BOTH dimensions
    at once (each of the ``2^bucket_bits`` buckets covers a small
    rectangle of the grid, so a file written per bucket prunes on either
    column's min/max stats).

    ``x_col`` must be integral — its cell comes from EXACT bigint
    WIDTH-form quantization ``(x - lo) div ceil(span / 2^bits)``: a
    division only, no ``(x-lo)·2^bits`` multiply, so the arithmetic
    cannot overflow int64 for ANY key range (the multiply form wraps
    silently once the range reaches 2^53 — snowflake-style 63-bit ids
    would produce garbage keys with no error). ``y_col`` may be
    floating: IEEE scaling, the identical left-to-right expression on
    both engines, with a constant-column guard (span 0 → cell 0; the
    unguarded divide yields NULL in Spark but errors/∞ in other
    engines). Global min/max enter through a broadcast 1-row
    aggregate, the z-key is a map-only expression, and the report is
    one partially-aggregated groupBy over ``2^bucket_bits`` keys. At
    scale the same key feeds ``df.repartitionByRange(z)`` +
    ``sortWithinPartitions(z)`` before the parquet write; this report
    stage is how you VERIFY the layout paid off (``extent_frac`` ≪ 1
    per bucket)."""
    rep = zorder_extent_report_nd(df, [x_col, y_col], bits=bits, bucket_bits=bucket_bits)
    return rep.select(
        "zbucket",
        "n",
        F.col("min_c0").alias("min_cx"),
        F.col("max_c0").alias("max_cx"),
        F.col("min_c1").alias("min_cy"),
        F.col("max_c1").alias("max_cy"),
        "extent_frac",
    )


def zvalue_nd(cols: list[Column], bits: int) -> Column:
    """Round-robin interleave N ``bits``-wide non-negative integers into
    an ``N·bits``-wide Morton key: dimension j's bit i lands at position
    ``i·N + j`` (the 2-D x-even/y-odd layout is the N=2 case). Flat sum
    of shift/mask terms — constant-folds into one codegen expression.
    ``N·bits`` must stay below 63 (bigint, sign bit untouched)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} dims x {bits} bits = {n * bits} > 62 key bits")
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, b: a + b, terms)


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def zorder_extent_report_nd(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    bucket_bits: int = 4,
) -> DataFrame:
    """N-dimensional generalization of the extent report — the real
    lakehouse layout call signature (OPTIMIZE ZORDER BY (c1, c2, c3)).

    Per-column quantization picks the exact path by dtype: integral
    columns use overflow-free WIDTH-form division ``(x - lo) div
    ceil(span / 2^bits)``; floating columns use the clamped IEEE
    scaling — both identical expressions to the 2-D form, so an SQL
    oracle reproduces every cell bit-for-bit. The z-bucket is the top
    ``bucket_bits`` bits of the N·bits Morton key, which pins
    ``floor((bucket_bits + N-1-j)/N)`` high bits of dimension j — every
    bucket's bounding box covers at most ``prod_j 2^-pinned_j`` of the
    grid, the guarantee that lets parquet min/max stats prune
    N-dimensional predicates. Output: zbucket, n, per-dimension
    min_c{j}/max_c{j}, extent_frac."""
    n = len(cols)
    cells = 1 << bits
    kinds = [df.schema[c].dataType.simpleString() for c in cols]
    aggs = []
    for j, c in enumerate(cols):
        aggs.append(F.min(c).alias(f"__lo{j}"))
        aggs.append(F.max(c).alias(f"__hi{j}"))
    b = df.crossJoin(F.broadcast(df.agg(*aggs)))
    cell_cols = []
    for j, (c, kind) in enumerate(zip(cols, kinds)):
        if kind in _INT_TYPES:
            expr = F.expr(
                f"CAST(({c} - __lo{j})"
                f" div ((__hi{j} - __lo{j} + {cells}) div {cells}) AS BIGINT)"
            )
        else:
            expr = F.when(
                F.col(f"__hi{j}") == F.col(f"__lo{j}"), F.lit(0).cast("bigint")
            ).otherwise(
                F.least(
                    F.lit(cells - 1).cast("bigint"),
                    F.floor(
                        (F.col(c) - F.col(f"__lo{j}"))
                        * F.lit(float(cells))
                        / (F.col(f"__hi{j}") - F.col(f"__lo{j}"))
                    ).cast("bigint"),
                )
            )
        cell_cols.append(expr.alias(f"c{j}"))
    keyed = b.select(*cell_cols).withColumn(
        "zbucket",
        F.shiftright(
            zvalue_nd([F.col(f"c{j}") for j in range(n)], bits),
            n * bits - bucket_bits,
        ),
    )
    frac = reduce(
        lambda a, b2: a * b2,
        [
            (F.max(f"c{j}") - F.min(f"c{j}") + F.lit(1)).cast("double")
            for j in range(n)
        ],
    ) / F.lit(float(cells) ** n)
    per_dim = []
    for j in range(n):
        per_dim.append(F.min(f"c{j}").alias(f"min_c{j}"))
        per_dim.append(F.max(f"c{j}").alias(f"max_c{j}"))
    return keyed.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n"),
        *per_dim,
        F.round(frac, 6).alias("extent_frac"),
    )
