"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Re-split a narrow input before a row-amplifying stage.

    Spark sizes scan splits by INPUT bytes (maxPartitionBytes), but a
    shingle/token explode amplifies each document ~50x inside the
    stage — a compressed 30 MB parquet becomes one task doing all the
    work while 31 cores idle, and AQE cannot help because the
    amplification is intra-stage. At real scale inputs already carry
    more splits than cores and this is a no-op (the partition count
    check keeps the repartition off the 100 TB path — never shrink,
    never shuffle what is already spread)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join resilient to hot keys: the big side scatters each row
    to one of `salts` sub-keys (hash of the whole row — deterministic,
    no RNG), the small side replicates to all of them, and the join
    runs on (keys..., salt) so one hot key spreads over `salts` tasks
    instead of stalling the stage on a single straggler.

    Use when AQE skew-join can't apply (bucketed SMJ inputs, skew
    inside a single key rather than a partition) and the small side
    is too big to broadcast outright but fine to replicate x salts.
    Cost: small side shuffles salts x its size."""
    from pyspark.sql import functions as F
    salt_big = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                      F.lit(salts)).alias("__salt")
    b = big.select("*", salt_big)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    return b.join(s, on + ["__salt"], how).drop("__salt")
