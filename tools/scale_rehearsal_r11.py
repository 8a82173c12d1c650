"""r11 scaling leg (VERDICT r10 #5): heavy queries at 10x data,
run at two core counts so parallel speedup is measurable.

At sf0.1 the 8-core bench BEATS the 32-core bench (22.6 vs 25.9 s
total) because every query is scheduler/driver-bound on single-row-
group inputs — the low-core block cannot detect a serial query. At
10x data the work term dominates, so t_8 / t_32 >> 1 is the signal
that a query actually parallelizes; ~1 names a serial bottleneck.

Replicated frames are injected into corpus._TABLE_CACHE under a
synthetic dir key, so the MEASURED CODE IS the corpus queries
verbatim (same mechanism as scale_rehearsal_100x.py). The timed
action is the noop sink (guide §1.4) — every output column computed,
no join elimination, no driver collect of 10x outputs.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scale_rehearsal_r11.py > out32.json
  SPARK_GRAFT_CPUS=8  python tools/scale_rehearsal_r11.py > out8.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("R11_FACTOR", "10"))
REPS = int(os.environ.get("R11_REPS", "2"))

QUERIES = os.environ.get(
    "R11_QUERIES",
    "minhash_lsh,ngram_jaccard,simhash_dup,dedup_clusters,"
    "decontaminate,weighted_percentile,tpch_q1").split(",")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from sybil_spark import corpus
    from sybil_spark.operators._util import unpersist_unscoped

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.appName("scale-rehearsal-r11")
             .master(f"local[{cpus}]")
             .config("spark.driver.memory", "12g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    app = spark.sparkContext.applicationId
    tag = f"r11x{FACTOR}"

    # documents: token-suffixed replicas (zero cross-replica shingle
    # overlap — scale_rehearsal.py construction)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    parts = [base.select(
        (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
        F.concat(F.regexp_replace("text", " ", f"_r{i} "),
                 F.lit(f"_r{i}")).alias("text")) for i in range(FACTOR)]
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    corpus._TABLE_CACHE[(app, tag, "documents")] = \
        docs.repartition(32).localCheckpoint(eager=True)

    # lineitem: key-shifted replicas (full width — q1 reads 7 cols)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    lis = [li.withColumn("l_orderkey",
                         F.col("l_orderkey") + i * 100_000_000)
           for i in range(FACTOR)]
    big_li = lis[0]
    for r in lis[1:]:
        big_li = big_li.unionByName(r)
    corpus._TABLE_CACHE[(app, tag, "lineitem")] = \
        big_li.repartition(32).localCheckpoint(eager=True)

    out = {"cpus": int(cpus), "factor": FACTOR, "sf": SF_DIR,
           "reps": {}, "min_sec": {}}
    for q in QUERIES:
        fn = corpus.QUERIES[q]
        times = []
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"{q} {tag} rep{rep}")
            t0 = time.time()
            fn(spark, tag).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
            unpersist_unscoped()
        out["reps"][q] = times
        out["min_sec"][q] = min(times)
        print(f"# {q}: {times}", file=sys.stderr)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
