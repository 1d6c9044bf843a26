"""Vector column functions over ``array<float>`` embedding columns.

Dot products and norms fold with a DECIMAL(28,18) accumulator: each
elementwise double product is rounded once to 18 decimals (deterministic)
and decimal addition is associative — so the result is bit-identical
regardless of evaluation order or engine, unlike a raw double sum.
All are higher-order-function expressions (JVM-side); no UDFs, no
explode/shuffle — a narrow per-row computation that scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(28,18)"


def _fold_dec(values: Column) -> Column:
    """Order-insensitive exact sum of an array of doubles."""
    return F.aggregate(
        values,
        F.lit(0).cast(_DEC),
        # merge must return the accumulator type exactly; decimal addition
        # widens precision, so cast back (scale unchanged → no rounding)
        lambda acc, v: (acc + v.cast(_DEC)).cast(_DEC),
    ).cast("double")


def dot_exact(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _fold_dec(prods)


def norm_exact(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_fold_dec(sq))


def cosine_similarity_exact(a: Column, b: Column) -> Column:
    return dot_exact(a, b) / (norm_exact(a) * norm_exact(b))
