"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``sybil_spark`` package; the corpus of
(query, oracle) pairs is ``sybil_spark/corpus.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    time-bucketed grouped average (scripts/test_cache_results.py:44)
    through the Query builder."""
    from sybil_spark.corpus import QUERIES
    return QUERIES["time_group_avg_limit"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sybil_spark.corpus import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sybil_spark.corpus import ORACLES
    return dict(ORACLES)
