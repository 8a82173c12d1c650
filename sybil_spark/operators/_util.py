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
