"""Vector math over `array<float>` embedding columns.

Everything here is built from JVM-side higher-order functions
(`zip_with` / `aggregate`) so the hot path never crosses into Python:
on a 100 TB corpus the dot products run inside whole-stage codegen,
not a UDF. Elements are cast to double *before* accumulating and the
fold is sequential left-to-right, which makes results deterministic
and bit-identical to any other engine that sums doubles in index
order (the DuckDB oracle's `list_dot_product` does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i, double precision, sequential fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0),
                       lambda acc, x: acc + x.cast("double") * x.cast("double"))


def norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a||b|) — written as dot products only so it
    mirrors `list_dot_product`-style oracle SQL bit-for-bit."""
    return dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))


def cosine_to_const(a: Column, q: list[float]) -> Column:
    """Cosine against a fixed query vector; the query-side norm is
    folded into one literal so only one array pass per row remains."""
    import math
    qn = math.sqrt(sum(float(v) * float(v) for v in q))
    ql = F.lit([float(v) for v in q]).cast("array<double>")
    return dot(a, ql) / (F.sqrt(norm_sq(a)) * F.lit(qn))


def absmax(a: Column) -> Column:
    """max_i |a_i|, double precision — the symmetric-quantization
    range statistic. A sequential GREATEST fold returns the same
    value as any engine's list-max-of-abs (max is order-free)."""
    return F.aggregate(a, F.lit(0.0),
                       lambda acc, x: F.greatest(acc,
                                                 F.abs(x.cast("double"))))


def int8_quantize(a: Column, scale: Column) -> Column:
    """Symmetric int8 quantization: q_i = floor(a_i/scale + 0.5).

    floor(x + 0.5) instead of round(x): engines disagree on
    round-half semantics (HALF_UP vs half-even) but floor is floor
    everywhere, so the quantized codes are bit-identical across
    engines. With scale = absmax/127 the codes land in [-127, 127]
    by construction — no clamp needed (|a_i|/scale <= 127, and
    floor(±127 + 0.5) stays in range). A zero vector (scale = 0)
    quantizes to zeros rather than dividing by zero."""
    return F.transform(
        a, lambda x: F.when(scale == F.lit(0.0), F.lit(0))
                      .otherwise(F.floor(x.cast("double") / scale
                                         + F.lit(0.5)).cast("int")))
