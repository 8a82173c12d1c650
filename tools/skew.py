"""Join/group-key skew report — bounded-memory heavy-hitter scan.

Before shuffling 100 TB on a key, ask how hot its hottest values are:
a skew factor (top value's share × partition count) over ~1 means one
task gets that entire key and the stage runs at the straggler's pace —
the signal to salt the join (operators/_util.salted_join) or rely on
AQE skew splitting. The scan uses operators/prune.lossy_group_topk,
so partial state stays bounded no matter the key's cardinality — this
is exactly the workload the lossy mode exists for.

Usage: python tools/skew.py [sf_dir] table.column [table.column ...]
       python tools/skew.py /root/testdata/sf0.1 lineitem.l_orderkey \
              events.user_id
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.sep in args[0]:
        # path-looking first arg IS the sf dir — fail loudly on a
        # typo instead of re-parsing it as a table.column spec
        sf_dir = args.pop(0)
        if not os.path.isdir(sf_dir):
            sys.exit(f"sf dir not found: {sf_dir}")
    if not args:
        print(__doc__)
        return

    from sybil_spark.operators.prune import lossy_group_topk
    from sybil_spark.session import get_spark

    spark = get_spark("skew", master=None)
    out = {}
    for spec in args:
        table, col = spec.split(".", 1)
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        n = df.count()
        nparts = spark.sparkContext.defaultParallelism
        top = lossy_group_topk(df, [col], limit=5).collect()
        hot = [{col: r[col], "count": r["count"],
                "share": round(r["count"] / n, 6)} for r in top]
        factor = round(hot[0]["share"] * nparts, 3) if hot else 0.0
        out[spec] = {
            "rows": n, "top": hot,
            # >1: the hottest key alone overfills one of nparts even
            # shuffle shares -> that task straggles; salt or let AQE
            # split it
            "skew_factor": factor,
            "salting_recommended": factor > 1.0,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
