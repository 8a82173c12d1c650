"""Grouped weighted-percentile: per-group window (A) vs distributed
prefix-sum CDF (B), interleaved in ONE session at a replica factor.

The corpus lineitem is replicated FACTOR times (key-shifted, full
width) and injected under a synthetic dir key, so the measured code
is q_weighted_percentile verbatim. Arms alternate A B A B ... by
monkeypatching WP_GROUPED_DISTRIBUTED_MIN_BYTES (huge = window path,
0 = distributed path); the timed action is the noop sink.

Usage: [FACTOR=10] [TRIALS=4] [CPUS=32] python tools/exp_wp_grouped.py
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
    from sybil_spark import corpus
    from sybil_spark.query import builder as B

    factor = int(os.environ.get("FACTOR", "10"))
    trials = int(os.environ.get("TRIALS", "4"))
    cpus = os.environ.get("CPUS", "32")
    spark = (SparkSession.builder.appName("exp-wp-grouped")
             .master(f"local[{cpus}]")
             .config("spark.driver.memory", "12g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    app = spark.sparkContext.applicationId
    tag = f"wpx{factor}"

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    reps = [li.withColumn("l_orderkey",
                          F.col("l_orderkey") + i * 100_000_000)
            for i in range(factor)]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    corpus._TABLE_CACHE[(app, tag, "lineitem")] = \
        big.repartition(int(cpus)).localCheckpoint(eager=True)
    n = corpus._TABLE_CACHE[(app, tag, "lineitem")].count()
    print(f"# {factor}x lineitem: {n} rows", file=sys.stderr)

    fn = corpus.QUERIES["weighted_percentile"]
    out = {"factor": factor, "cpus": int(cpus), "rows": n,
           "a_window": [], "b_distributed": [], "probes": []}
    for t in range(trials):
        out["probes"].append(quiet_probe())
        for arm, thresh in (("a_window", 1 << 60), ("b_distributed", 0)):
            B.WP_GROUPED_DISTRIBUTED_MIN_BYTES = thresh
            spark.sparkContext.setJobDescription(f"wp {arm} t{t}")
            t0 = time.time()
            fn(spark, tag).write.format("noop").mode("overwrite").save()
            out[arm].append(round(time.time() - t0, 2))
            print(f"# t{t} {arm}: {out[arm][-1]}", file=sys.stderr)
    out["a_min"] = min(out["a_window"])
    out["b_min"] = min(out["b_distributed"])
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
