from sybil_spark.sources import ingest, compact

__all__ = ["ingest", "compact"]
