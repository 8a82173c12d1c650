"""Item-8 sweep (r11): does a guarded spread() before the partial agg
pay for the single-row-group queries the way it did for tpch_q1?

Interleaves arm A (stock) and arm B (scan wrapped in spread() via a
monkeypatched corpus._events/_t) inside ONE session, noop-sink timed,
so host drift cannot vote. Apply-to-repo criterion (VERDICT r10 #8):
B_min <= 0.85 * A_min.

Usage: python tools/exp_spread.py [reps]   (env QUERIES=csv to filter)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT = ("hist,group2_avg,hist_summary,weighted_count,percentiles,"
           "time_distinct,group_hist,weighted_hist_summary")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = os.environ.get("QUERIES", DEFAULT).split(",")

    from sybil_spark import corpus
    from sybil_spark.operators._util import spread, unpersist_unscoped
    from sybil_spark.session import get_spark

    spark = get_spark("exp_spread", extra_conf={"spark.ui.enabled": "false"})
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    orig_events, orig_t = corpus._events, corpus._t

    def patched_events(spark, sf):
        return spread(orig_events(spark, sf))

    def patched_t(spark, sf, name):
        df = orig_t(spark, sf, name)
        return spread(df) if name == "lineitem" else df

    def set_arm(b: bool) -> None:
        corpus._events = patched_events if b else orig_events
        corpus._t = patched_t if b else orig_t

    out = {"a": {}, "b": {}}
    for rep in range(reps):
        for arm, b in (("a", False), ("b", True)):
            set_arm(b)
            for q in names:
                fn = corpus.QUERIES[q]
                spark.sparkContext.setJobDescription(f"{q} arm{arm} r{rep}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                out[arm].setdefault(q, []).append(
                    round(time.time() - t0, 3))
                unpersist_unscoped()
    set_arm(False)
    res = {q: {"a_min": min(out["a"][q]), "b_min": min(out["b"][q]),
               "speedup": round(min(out["a"][q]) / min(out["b"][q]), 3),
               "a": out["a"][q], "b": out["b"][q]} for q in names}
    spark.stop()
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
