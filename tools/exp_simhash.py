"""Experiment: simhash signature aggregation shapes under Spark 4.1.

Variants (all bit-identical by construction; verified here):
  A  current: posexplode(60-elem bit array) -> groupBy(id,b) -> groupBy(id)
  B  wide:    one groupBy(id).agg(60 conditional sums + count) -> 60-term pack
  C  packed:  one groupBy(id).agg(30 packed 2x32-bit lane sums + count) -> unpack
  D  packed2: posexplode(30-lane array) -> groupBy(id,j) -> groupBy(id) (half of A's rows)

Usage: python tools/exp_simhash.py [sf_dir] [reps]
Prints per-variant warm timings (min) + first-rep (plan/codegen-inclusive),
and cross-checks all variants collect identical (id, sig) sets.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BITS = 60


def tok_frame(spark, sf_dir):
    from sybil_spark.functions.text import tokens
    from sybil_spark.operators._util import spread
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_hash = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
    return (spread(df)
            .select(F.col("doc_id").alias("id"),
                    F.explode(tokens(F.col("text"))).alias("t"))
            .select("id", tok_hash.alias("h")))


def sig_A(tok):
    bit_arr = F.array(*[
        F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)).cast("long")
        for b in range(BITS)])
    votes = (tok.select("id", F.posexplode(bit_arr).alias("b", "bit"))
                .groupBy("id", "b")
                .agg(F.sum("bit").alias("s"), F.count(F.lit(1)).alias("n")))
    return votes.groupBy("id").agg(
        F.sum(F.expr("if(2*s > n, shiftleft(1L, cast(b as int)), 0L)"))
         .alias("sig"))


def _pack_terms(s_of_b, n):
    """sig = sum_b if(2*s_b > n, 1<<b, 0) as a flat + chain."""
    terms = [F.when(F.lit(2) * s_of_b(b) > n,
                    F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
             for b in range(BITS)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sig_B(tok):
    aggs = [F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))
                  .cast("long")).alias(f"s{b}") for b in range(BITS)]
    aggs.append(F.count(F.lit(1)).alias("n"))
    g = tok.groupBy("id").agg(*aggs)
    return g.select("id", _pack_terms(lambda b: F.col(f"s{b}"),
                                      F.col("n")).alias("sig"))


def _lane(j):
    lo = F.shiftright(F.col("h"), 2 * j).bitwiseAND(F.lit(1))
    hi = F.shiftright(F.col("h"), 2 * j + 1).bitwiseAND(F.lit(1))
    return (F.shiftleft(hi, 32).bitwiseOR(lo)).cast("long")


def sig_C(tok):
    aggs = [F.sum(_lane(j)).alias(f"l{j}") for j in range(BITS // 2)]
    aggs.append(F.count(F.lit(1)).alias("n"))
    g = tok.groupBy("id").agg(*aggs)

    def s_of_b(b):
        j, half = divmod(b, 2)
        if half == 0:
            return F.col(f"l{j}").bitwiseAND(F.lit(0xFFFFFFFF))
        return F.shiftrightunsigned(F.col(f"l{j}"), 32)

    return g.select("id", _pack_terms(s_of_b, F.col("n")).alias("sig"))


def sig_D(tok):
    lane_arr = F.array(*[_lane(j) for j in range(BITS // 2)])
    votes = (tok.select("id", F.posexplode(lane_arr).alias("j", "lane"))
                .groupBy("id", "j")
                .agg(F.sum("lane").alias("s"), F.count(F.lit(1)).alias("n")))
    pair = F.expr(
        "if(2*(s & 4294967295) > n, shiftleft(1L, cast(2*j as int)), 0L) + "
        "if(2*shiftrightunsigned(s, 32) > n, "
        "shiftleft(1L, cast(2*j+1 as int)), 0L)")
    return votes.groupBy("id").agg(F.sum(pair).alias("sig"))


VARIANTS = {"A": sig_A, "B": sig_B, "C": sig_C, "D": sig_D}


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = int(args[-1]) if args and args[-1].isdigit() else 4
    only = os.environ.get("VARIANTS", "ABCD")

    from sybil_spark.session import get_spark
    spark = get_spark("exp_simhash", extra_conf={"spark.ui.enabled": "false"})
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # correctness cross-check at sf0.01 (cheap)
    small = "/root/testdata/sf0.01"
    ref = None
    for name in only:
        rows = sorted((r["id"], r["sig"]) for r in
                      VARIANTS[name](tok_frame(spark, small)).collect())
        if ref is None:
            ref, ref_name = rows, name
        else:
            assert rows == ref, f"{name} != {ref_name}"
    print(f"# variants {only}: identical on sf0.01 ({len(ref)} ids)",
          file=sys.stderr)

    results = {}
    for rep in range(reps):
        for name in only:
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"simhash_{name}_rep{rep}")
            (VARIANTS[name](tok_frame(spark, sf_dir))
             .write.format("noop").mode("overwrite").save())
            dt = time.time() - t0
            results.setdefault(name, []).append(round(dt, 3))
    for name in only:
        v = results[name]
        print(f"{name}: first={v[0]:.3f} warm_min={min(v[1:]):.3f} all={v}")
    spark.stop()


if __name__ == "__main__":
    main()
