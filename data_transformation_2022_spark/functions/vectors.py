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


def quantize_scale_int8(a: Column) -> Column:
    """Per-vector int8 quantization scale: max|x| / 127 (symmetric
    scalar quantization). max is order-free and exact, the division is
    one IEEE op — deterministic on any engine."""
    mx = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    return mx / F.lit(127.0)


def quantize_int8_value(val: Column, scale: Column) -> Column:
    """Quantized code for one element: FLOOR(val/scale + 0.5) clamped to
    [-127, 127]. FLOOR(x+0.5) is round-half-up computed on the exact
    binary double — identical across engines, unlike ROUND (Spark
    rounds the shortest-string decimal of a double, DuckDB the binary;
    they disagree 1 ulp from a .5 boundary)."""
    q = F.floor(val.cast("double") / scale + F.lit(0.5))
    return F.greatest(F.lit(-127), F.least(F.lit(127), q)).cast("bigint")
