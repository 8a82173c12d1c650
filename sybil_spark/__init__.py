"""sybil_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of logv/sybil (see SURVEY.md).

Design: everything is declared through the DataFrame API so Catalyst
handles column pruning, predicate pushdown, partial aggregation and
join strategy selection.  The package adds what Spark does not have
out of the box:

- sybil's ingestion typing rules (dynamic schema, first-writer-wins),
- the flag-based query model (filter → group → agg → sort → limit)
  as a builder that compiles to a single DataFrame plan,
- sybil's histogram / percentile math (exact by default, bucketed
  compat mode),
- storage lifecycle jobs (ingest log → digest → blocks → trim),
- large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing).
"""

from sybil_spark.session import get_spark
from sybil_spark.query.builder import Query
from sybil_spark.table import Table

__all__ = ["get_spark", "Query", "Table"]
__version__ = "0.1.0"
