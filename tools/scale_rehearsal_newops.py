"""Scale rehearsal for the round-8 audit/search operators: 1x vs 10x
growth on replicated sf0.1 corpora (the same zero-cross-replica-overlap
construction as tools/scale_rehearsal.py), one JSON line to stdout.

Covered, with the scale claim each measurement checks:

- decontaminate vs bloom_decontaminate, same eval split and
  thresholds: both must grow ~linearly, and the bloom path's result
  must stay row-identical (it prints both counts). The bloom's win is
  a memory/shuffle-bytes property (bitset broadcast vs hash relation;
  pre-shuffle pruning) — wall-clock parity at local scale is expected
  and fine.
- blocklist_stats: pure-map + tiny agg — the flattest curve here.
- phrase_search (ad-hoc map) and build_bm25_index +
  phrase_index_topk (positional index build, then a serve that must
  be ~flat in corpus size thanks to bucket partition pruning; build
  is the linear part).
- cluster_balance_report on 10x-replicated embeddings: one scan,
  nlist-row agg — near-linear scan growth, no shuffle of vectors.

Usage: python tools/scale_rehearsal_newops.py  [~2-4 min]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from sybil_spark.operators import dedup, quality, similarity

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (SparkSession.builder.appName("scale-rehearsal-newops")
             .master(f"local[{cpus}]")
             .config("spark.driver.memory", "6g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    reps = []
    for i in range(10):
        reps.append(base.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat(F.regexp_replace("text", " ", f"_r{i} "),
                     F.lit(f"_r{i}")).alias("text")))
    small = reps[0].localCheckpoint(eager=True)
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big = big.localCheckpoint(eager=True)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding")
    emb_small = emb.localCheckpoint(eager=True)
    embs = [emb.select((F.col("vec_id") + i * 10_000_000)
                       .alias("vec_id"), "embedding")
            for i in range(10)]
    emb_big = embs[0]
    for r in embs[1:]:
        emb_big = emb_big.unionByName(r)
    emb_big = emb_big.localCheckpoint(eager=True)

    from sybil_spark.operators._util import cache_scope

    def timed(fn, warmup: bool = True):
        if warmup:
            # codegen + python-worker spin-up otherwise lands in the
            # 1x number and fakes sub-1 growth ratios
            with cache_scope():
                fn()
        t0 = time.time()
        with cache_scope():
            n = fn()
        return round(time.time() - t0, 2), n

    out = {"sf": SF_DIR, "replicas": 10, "pipelines": {}}

    def decon(df, op):
        bench = df.where(F.col("doc_id") % 20 == 0)
        corpus = df.where(F.col("doc_id") % 20 != 0)
        return op(corpus, "doc_id", "text", bench, "doc_id", "text",
                  shingle_n=3, min_overlap=5).count()

    for name, op in (("decontaminate", dedup.decontaminate),
                     ("bloom_decontaminate", dedup.bloom_decontaminate)):
        t1, n1 = timed(lambda: decon(small, op))
        t10, n10 = timed(lambda: decon(big, op))
        out["pipelines"][name] = {
            "t_1x_s": t1, "t_10x_s": t10,
            "growth": round(t10 / t1, 2), "rows_1x": n1,
            "rows_10x": n10}

    bl = ["dup_r0", "dup_r3", "dup_r7"]
    t1, n1 = timed(lambda: quality.blocklist_stats(
        small.withColumn("lang", F.lit("x")), "lang", "text",
        "doc_id", bl).count())
    t10, n10 = timed(lambda: quality.blocklist_stats(
        big.withColumn("lang", F.lit("x")), "lang", "text",
        "doc_id", bl).count())
    out["pipelines"]["blocklist_stats"] = {
        "t_1x_s": t1, "t_10x_s": t10, "growth": round(t10 / t1, 2),
        "rows_1x": n1, "rows_10x": n10}

    t1, n1 = timed(lambda: quality.phrase_search(
        small, "doc_id", "text", "merge_r0 slow_r0").count())
    t10, n10 = timed(lambda: quality.phrase_search(
        big, "doc_id", "text", "merge_r0 slow_r0").count())
    out["pipelines"]["phrase_search"] = {
        "t_1x_s": t1, "t_10x_s": t10, "growth": round(t10 / t1, 2),
        "rows_1x": n1, "rows_10x": n10}

    # positional index: build grows with the corpus; SERVING a fixed
    # phrase must stay ~flat (bucket pruning bounds the read).
    # NEWOPS_100X=1 adds a 100x arm (10 suffixed replicas of big) —
    # the regime where a serve that secretly scans the corpus would
    # show as 100x serve time instead of flat.
    scales = [("1x", small, "merge_r0 slow_r0"),
              ("10x", big, "merge_r0 slow_r0")]
    if os.environ.get("NEWOPS_100X"):
        reps100 = []
        for i in range(10):
            reps100.append(big.select(
                (F.col("doc_id") + i * 1_000_000_000).alias("doc_id"),
                F.concat(F.regexp_replace("text", " ", f"_q{i} "),
                         F.lit(f"_q{i}")).alias("text")))
        huge = reps100[0]
        for r in reps100[1:]:
            huge = huge.unionByName(r)
        huge = huge.localCheckpoint(eager=True)
        scales.append(("100x", huge, "merge_r0_q0 slow_r0_q0"))
    res = {}
    for tag, df, ph in scales:
        iroot = tempfile.mkdtemp(prefix=f"sybil-phrehearse-{tag}-")
        try:
            # after the 1x arm the JVM/python paths are warm — don't
            # pay a second 10x/100x index build just for warmup
            warm = tag == "1x"
            tb, _ = timed(lambda: quality.build_bm25_index(
                df, "doc_id", "text", iroot, nbuckets=64) or 0,
                warmup=warm)
            ts, n = timed(lambda: quality.phrase_index_topk(
                spark, iroot, ph, k=10).count(), warmup=warm)
            res[f"t_build_{tag}_s"] = tb
            res[f"t_serve_{tag}_s"] = ts
            res[f"rows_{tag}"] = n
        finally:
            shutil.rmtree(iroot, ignore_errors=True)
    res["growth_build"] = round(res["t_build_10x_s"]
                                / res["t_build_1x_s"], 2)
    res["growth_serve"] = round(res["t_serve_10x_s"]
                                / res["t_serve_1x_s"], 2)
    if "t_serve_100x_s" in res:
        res["growth_build_100x"] = round(res["t_build_100x_s"]
                                         / res["t_build_1x_s"], 2)
        res["growth_serve_100x"] = round(res["t_serve_100x_s"]
                                         / res["t_serve_1x_s"], 2)
    out["pipelines"]["phrase_index"] = res

    cents = [[float(x) for x in r[0]] for r in
             emb_small.where(F.col("vec_id") < 16)
                      .select("embedding").orderBy("vec_id").collect()]
    t1, n1 = timed(lambda: similarity.cluster_balance_report(
        emb_small, "embedding", cents).count())
    t10, n10 = timed(lambda: similarity.cluster_balance_report(
        emb_big, "embedding", cents).count())
    out["pipelines"]["cluster_balance"] = {
        "t_1x_s": t1, "t_10x_s": t10, "growth": round(t10 / t1, 2),
        "rows_1x": n1, "rows_10x": n10}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
