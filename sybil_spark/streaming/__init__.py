from sybil_spark.streaming import ingest_stream

__all__ = ["ingest_stream"]
