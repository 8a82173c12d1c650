"""Bucketed table layout — pay the join shuffle once, at write time.

The reference never joins (README.md:28), so it has no answer to the
dominant cost of 100 TB fact-to-fact joins: re-shuffling both sides
on the join key for every query. Spark's bucketing amortizes that
shuffle into the write: a table written `bucketBy(N, key)` is already
hash-partitioned on disk, so a join (or groupBy) on the key between
two tables bucketed the same way runs with ZERO Exchange nodes —
each task zips bucket i with bucket i. With `sortBy` the merge-join
sort is pre-paid too.

Sizing rule: N buckets ≈ table_size / 128 MB at the LARGEST table's
size, shared by every table participating in the co-located join
(bucket counts must match, or be multiples with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   num_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None) -> None:
    """Persist as a bucketed (+ optionally sorted) parquet table in
    the session catalog. `path` makes it external."""
    w = (df.write.mode("overwrite").format("parquet")
           .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
