"""Capture `.explain("formatted")` for a set of corpus queries into
plans/<tag>/<query>_<suffix>.txt — the judge-auditable plan record
backing OPTIMIZATION_r*.md claims.

Usage: python tools/capture_plans.py <outdir> <suffix> [query ...]
       (default queries: bench.py HEADLINE)

Notes: building a corpus DataFrame can run small plan-time jobs
(skew-guard probes, 1-row stats collects) — that is fine; plans are
captured on the returned frame at sf0.01 (plan SHAPE is scale-
independent; sf0.01 keeps plan-time probes cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench
        names = bench.HEADLINE
    os.makedirs(outdir, exist_ok=True)

    from sybil_spark.corpus import QUERIES
    from sybil_spark.plans import inspect as I
    from sybil_spark.session import get_spark
    from sybil_spark.operators import _util
    from sybil_spark.operators._util import unpersist_unscoped

    spark = get_spark("capture-plans",
                      extra_conf={"spark.ui.enabled": "false"})
    # Pre-checkpoint plan capture (r11, VERDICT #4): eager
    # localCheckpoints truncate consumers' plans at `Scan
    # ExistingRDD`, hiding the restructured shingle / star-pair
    # subplans from the <query>_<suffix>.txt record. The hook writes
    # each materialized frame's plan to
    # <query>_<suffix>_pre<N>_<label>.txt as the query builds.
    state = {"query": None, "n": 0}

    def hook(label, df):
        state["n"] += 1
        fn = f"{state['query']}_{suffix}_pre{state['n']}_{label}.txt"
        try:
            plan = I.formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR explaining pre-checkpoint {label}: {e}"
        with open(os.path.join(outdir, fn), "w") as f:
            f.write(plan)

    _util.checkpoint_plan_hook = hook
    for name in names:
        state["query"], state["n"] = name, 0
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = I.formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building/explaining {name}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        unpersist_unscoped()
        print(f"captured {name}", file=sys.stderr)
    _util.checkpoint_plan_hook = None
    spark.stop()


if __name__ == "__main__":
    main()
