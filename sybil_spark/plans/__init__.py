"""Physical-plan inspection and plan-quality assertions.

The reference engine hand-codes its scan optimizations (column pruning
via LoadSpec, zone-map block skipping, fused filter+agg — reference
src/lib/table_load_spec.go:59-76, src/lib/table_block_io.go:110-182,
src/lib/aggregate.go:56-282). In Spark those are Catalyst/Parquet
features that can silently regress when a query is phrased wrong
(e.g. a filter hidden behind a Python UDF stops pushing down). This
module makes the optimizations *observable* so tests can pin them.
"""

from sybil_spark.plans.inspect import (
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    formatted_plan,
    pushed_filters,
    scan_columns,
    shuffle_exchange_count,
    sort_merge_join_count,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "scan_columns",
    "exchange_count",
    "shuffle_exchange_count",
    "broadcast_join_count",
    "sort_merge_join_count",
    "codegen_span_count",
]
