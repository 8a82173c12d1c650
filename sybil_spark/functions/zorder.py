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

#: bits per dimension: 2 cols -> 42-bit keys, 3 cols -> 63-bit keys.
DEFAULT_BITS = {1: 63, 2: 31, 3: 21}


def _scale(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] -> integer rank in [0, 2^bits); constant columns
    (hi == lo) collapse to rank 0 rather than dividing by zero."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)
              * F.lit(float((1 << bits) - 1)))
    return (F.greatest(F.lit(0.0), F.least(scaled,
                                           F.lit(float((1 << bits) - 1))))
             .cast("long"))


def zorder_key(bounds: list[tuple[Column, float, float]],
               bits: int | None = None) -> Column:
    """Morton key over up to three (column, min, max) dimensions.

    Each column is min/max-scaled to a ``bits``-wide integer rank,
    then ranks are bit-interleaved (dimension i owns bit positions
    ``b*k + i``). Values outside the advertised bounds clamp to the
    edge rank — they sort to the hyper-rectangle boundary instead of
    corrupting the key. The bounds come for free from the table
    stats registry (TableMeta.int_info min/max), so no extra scan is
    needed at digest time."""
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
