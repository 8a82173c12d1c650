"""Item-7 pin (r11): tfidf_terms 10x growth under a quiet-host
interleaved protocol (the r10 rehearsals floated 1.48-5.52x across
passes; the plan is already shuffle-minimal, so the question is
whether a real super-linear term hides under the noise).

8 interleaved trials of (1x, 10x) wall time + per-trial stage
task-time totals + the bench quiet probe per trial.

Usage: python tools/exp_tfidf_pin.py [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F
    from bench import quiet_probe
    from sybil_spark.operators import quality
    from sybil_spark.operators._util import cache_scope

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (SparkSession.builder.appName("tfidf-pin")
             .master(f"local[{cpus}]")
             .config("spark.driver.memory", "6g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    sc = spark.sparkContext
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    parts = [base.select(
        (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
        F.concat(F.regexp_replace("text", " ", f"_r{i} "),
                 F.lit(f"_r{i}")).alias("text")) for i in range(10)]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    frames = {1: base.repartition(int(cpus)).localCheckpoint(eager=True),
              10: big.repartition(int(cpus)).localCheckpoint(eager=True)}

    def _stages():
        # Spark 4.1 signature: stageList(statuses, details,
        # withSummaries, unsortedQuantiles, taskStatus); empty status
        # list = all stages. Returns a scala Seq.
        store = sc._jsc.sc().statusStore()
        empty = sc._jvm.java.util.ArrayList()
        jarr = sc._gateway.new_array(sc._jvm.double, 0)
        return store.stageList(empty, False, False, jarr,
                               sc._jvm.java.util.ArrayList())

    def tasktime_ms(before_stages) -> int:
        slist = _stages()
        total = 0
        for i in range(slist.size()):
            sd = slist.apply(i)
            if sd.stageId() not in before_stages:
                total += sd.executorRunTime()
        return int(total)

    def stage_ids() -> set:
        slist = _stages()
        return {slist.apply(i).stageId() for i in range(slist.size())}

    def run(n: int) -> tuple[float, int]:
        before = stage_ids()
        t0 = time.time()
        with cache_scope():
            quality.tfidf_top_terms(frames[n], "doc_id", "text",
                                    k=5).count()
        return round(time.time() - t0, 2), tasktime_ms(before)

    run(1)  # warm codegen/JIT
    out = {"what": "tfidf_terms 10x growth pin (r10 VERDICT #7)",
           "protocol": f"interleaved 1x/10x, {trials} trials, "
                       f"local[{cpus}] 6g, rehearsal corpus, "
                       "quiet probe per trial",
           "trials": [], "probes": []}
    for t in range(trials):
        out["probes"].append(quiet_probe())
        w1, tt1 = run(1)
        w10, tt10 = run(10)
        out["trials"].append({
            "t_1x_s": w1, "t_10x_s": w10,
            "growth": round(w10 / w1, 2),
            "tasktime_1x_ms": tt1, "tasktime_10x_ms": tt10,
            "tasktime_growth": round(tt10 / max(tt1, 1), 2)})
        print(f"# trial {t}: {out['trials'][-1]}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
