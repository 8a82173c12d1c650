"""Per-job/stage breakdown for one corpus query — the local stand-in
for the Spark UI's Jobs/Stages pages (guide §1.1/§7.1).

Runs the query once (plus an optional warmup), then prints every job
the query ran with its wall time and stage task-time totals, via the
status API listener data. Plan-time jobs (skew probes, localCheckpoint
materializations, 1-row stats collects) show up as separate jobs —
exactly the breakdown the bench number hides.

Usage: python tools/profile_query.py [sf_dir] <query> [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    name = args[0]

    from sybil_spark.corpus import QUERIES
    from sybil_spark.operators._util import unpersist_unscoped
    from sybil_spark.session import get_spark

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "false"})
    sc = spark.sparkContext
    # same warmups as bench.py so the first profiled rep is steady-state
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    (spark.range(8).repartition(8)
          .mapInPandas(lambda it: (pdf for pdf in it), "id long").count())

    fn = QUERIES[name]
    for rep in range(reps):
        t0 = time.time()
        before_jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
        sc.setJobDescription(f"{name} rep{rep}")
        fn(spark, sf_dir).collect()
        wall = time.time() - t0
        unpersist_unscoped()
        tracker = sc._jsc.sc().statusTracker()
        jobs = sorted(set(tracker.getJobIdsForGroup(None)) - set(before_jobs))
        print(f"== {name} rep {rep}: wall {wall:.3f}s, {len(jobs)} jobs ==")
        store = sc._jsc.sc().statusStore()
        jlist = store.jobsList(None)
        n = jlist.size()
        by_id = {}
        for i in range(n):
            jd = jlist.apply(i)
            by_id[jd.jobId()] = jd
        for j in jobs:
            jd = by_id.get(j)
            if jd is None:
                print(f"  job {j}  ?")
                continue
            try:
                sub = jd.submissionTime().get().getTime()
                comp = jd.completionTime().get().getTime()
                dur = f"{comp - sub}ms"
            except Exception:
                dur = "?"
            ids = jd.stageIds()
            sids = [ids.apply(i) for i in range(ids.size())]
            st_parts = []
            for s in sorted(sids):
                try:
                    sd = store.lastStageAttempt(int(s))
                    st_parts.append(
                        f"s{s}:{sd.numCompleteTasks()}t/"
                        f"{sd.executorRunTime()}ms:"
                        f"{sd.name()[:40]}")
                except Exception:
                    st_parts.append(f"s{s}:?")
            print(f"  job {j}  {dur:>8}  {'; '.join(st_parts)}")
    spark.stop()


if __name__ == "__main__":
    main()
