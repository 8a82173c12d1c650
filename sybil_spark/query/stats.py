"""Statistical operators beyond plain aggregation.

ICC — intraclass correlation via one-way ANOVA (reference
`CalculateICC`, src/lib/stats.go:22-99: MSB/MSW from per-group vs
between-group variance; dead code in the reference CLI, ported as a
first-class operator here).

Everything is two chained aggregations — a per-group partial and a
single-row combine — so it runs as two hash-aggregate stages with no
collect; sums go through decimal accumulation so the statistic is
bit-deterministic (see Query.exact_mode)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def _dsum(c):
    return F.sum(c.cast(_DEC)).cast("double")


def icc(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One-row DataFrame: n, groups, msb, msw, icc.

    One-way ANOVA: SSB = Σ_j n_j·(m_j − m)², SSW = Σ_j (ss_j −
    s_j²/n_j); MSB = SSB/(J−1), MSW = SSW/(N−J);
    ICC(1) = (MSB − MSW) / (MSB + (n̄ − 1)·MSW) with n̄ = N/J."""
    v = F.col(value_col)
    g = (df.where(v.isNotNull())
           .groupBy(group_col)
           .agg(F.count(value_col).alias("n_j"),
                _dsum(v).alias("s_j"),
                _dsum(v * v).alias("ss_j")))
    # combine stage: all terms are per-group scalars; second-level sums
    # go through decimal too so group order can't perturb the result
    combined = g.agg(
        F.sum("n_j").alias("n"),
        F.count(F.lit(1)).alias("groups"),
        _dsum(F.col("s_j")).alias("s"),
        _dsum(F.col("ss_j")).alias("ss"),
        _dsum(F.col("s_j") * F.col("s_j") / F.col("n_j")).alias("sg"))
    m = F.col("s") / F.col("n")
    ssb = F.col("sg") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("ss") - F.col("sg")
    msb = ssb / (F.col("groups") - 1)
    msw = ssw / (F.col("n") - F.col("groups"))
    nbar = F.col("n").cast("double") / F.col("groups")
    return combined.select(
        F.col("n"), F.col("groups"),
        msb.alias("msb"), msw.alias("msw"),
        ((msb - msw) / (msb + (nbar - 1) * msw)).alias("icc"))
