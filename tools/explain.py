"""Plan transparency: print any corpus query's physical-plan facts.

Usage: python tools/explain.py [sf_dir] <query> [query ...]
       python tools/explain.py group_avg tpch_q5 --full

For each query: the pushed parquet filters, the columns each scan
actually reads, shuffle/broadcast exchange counts, join strategies,
and (with --full) the complete formatted plan — the evidence behind
the scale claims in SURVEY.md §8.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)

    from sybil_spark.corpus import QUERIES
    from sybil_spark.plans import inspect as I
    from sybil_spark.session import get_spark

    names = args or sorted(QUERIES)
    spark = get_spark("explain", extra_conf={"spark.ui.enabled": "false"})
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        print(f"== {name} ==")
        print(f"  pushed filters : {I.pushed_filters(df) or '—'}")
        print(f"  scan columns   : {I.scan_columns(df) or '—'}")
        print(f"  shuffles       : {I.shuffle_exchange_count(df)}"
              f"   broadcasts: {I.broadcast_exchange_count(df)}"
              f"   bcast joins: {I.broadcast_join_count(df)}"
              f"   smj: {I.sort_merge_join_count(df)}")
        if full:
            print(I.formatted_plan(df))
        print()
    spark.stop()


if __name__ == "__main__":
    main()
