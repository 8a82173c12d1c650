"""simhash signature variants at 10x data (A=current vs D=packed lanes).

Builds the standard 10x replica corpus (see scale_rehearsal.py),
checkpoints it so corpus-build cost is out of the timings, then runs
the signature job interleaved A D A D ... with the noop sink.

Usage: python tools/exp_simhash_10x.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.exp_simhash import VARIANTS  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = os.environ.get("VARIANTS", "AD")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.appName("exp-simhash-10x")
             .master(f"local[{cpus}]")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    parts = []
    for i in range(10):
        parts.append(base.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat(F.regexp_replace("text", " ", f"_r{i} "),
                     F.lit(f"_r{i}")).alias("text")))
    big = parts[0]
    for p in parts[1:]:
        big = big.unionAll(p)
    big = big.repartition(int(cpus)).localCheckpoint(eager=True)
    print(f"# 10x corpus: {big.count()} docs", file=sys.stderr)

    from sybil_spark.functions.text import tokens

    def tok(df):
        tok_hash = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
        return (df.select(F.col("doc_id").alias("id"),
                          F.explode(tokens(F.col("text"))).alias("t"))
                  .select("id", tok_hash.alias("h")))

    results = {}
    for rep in range(reps):
        for name in only:
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"sig{name}_10x_rep{rep}")
            (VARIANTS[name](tok(big))
             .write.format("noop").mode("overwrite").save())
            results.setdefault(name, []).append(round(time.time() - t0, 3))
    for name in only:
        v = results[name]
        print(f"{name}: first={v[0]:.3f} min={min(v):.3f} all={v}")
    spark.stop()


if __name__ == "__main__":
    main()
