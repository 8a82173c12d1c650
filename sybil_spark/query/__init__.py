from sybil_spark.query.builder import Query

__all__ = ["Query"]
