"""Z-order (Morton) clustering keys for multi-column data skipping.

The digest path sorts blocks by time (reference
src/lib/table_io.go:119-130), which makes time zone-maps razor-sharp
and every OTHER column's zone-maps useless — each file spans the full
range of a second dimension. Interleaving the bits of two or three
normalized columns into one sort key gives every participating column
locality: each written file covers a small hyper-rectangle, so parquet
footer min/max prunes files for filters on ANY of the clustered
columns (the same reason lakehouse engines expose OPTIMIZE ... ZORDER
BY). Everything here is plain codegen'd bit arithmetic — no UDF, no
extra shuffle beyond the range-partition the digest already does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits per dimension: 2 cols -> 62-bit keys, 3 cols -> 63-bit keys.
DEFAULT_BITS = {1: 63, 2: 31, 3: 21}


def _scale(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] -> integer rank in [0, 2^bits); constant columns
    (hi == lo) collapse to rank 0 rather than dividing by zero. A
    NULL value ranks 0 (edge of the curve) instead of propagating —
    a NULL in one dimension must not null the whole Morton key and
    collapse the row into the first range partition regardless of
    its OTHER dimensions' values."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)
              * F.lit(float((1 << bits) - 1)))
    return F.coalesce(
        F.greatest(F.lit(0.0), F.least(scaled,
                                       F.lit(float((1 << bits) - 1))))
         .cast("long"),
        F.lit(0).cast("long"))


def zorder_key(bounds: list[tuple[Column, float, float]],
               bits: int | None = None) -> Column:
    """Morton key over up to three (column, min, max) dimensions.

    Each column is min/max-scaled to a ``bits``-wide integer rank,
    then ranks are bit-interleaved (dimension i owns bit positions
    ``b*k + i``). Values outside the advertised bounds clamp to the
    edge rank — they sort to the hyper-rectangle boundary instead of
    corrupting the key — and NULLs rank 0 per dimension, preserving
    the other dimensions' locality. Callers supply the bounds; the
    digest path computes exact ones with one agg over the
    (threshold-bounded) staged log rather than trusting the
    registry's outlier-suppressed min/max, which would mis-scale
    exactly the outlier-heavy digests that most need spreading."""
    k = len(bounds)
    if not 1 <= k <= 3:
        raise ValueError("zorder_key supports 1-3 columns")
    if bits is None:
        bits = DEFAULT_BITS[k]
    if bits * k > 63:
        raise ValueError(f"{bits} bits x {k} cols exceeds a long")
    ranks = [_scale(c, lo, hi, bits) for c, lo, hi in bounds]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            out = out.bitwiseOR(F.shiftleft(
                F.shiftright(r, b).bitwiseAND(F.lit(1)), b * k + i))
    return out
