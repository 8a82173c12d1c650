"""Scale rehearsal for the round-9 operators: 1x vs 10x growth on
replicated sf0.1 corpora (the zero-cross-replica-overlap construction
of tools/scale_rehearsal.py), one JSON line to stdout.

Covered, with the scale claim each measurement checks:

- wordpiece_apply / unigram_apply: ONE Arrow-batched map-only UDF —
  growth must be ~linear in corpus size (no shuffle, no driver
  round-trips; the distinct-word cache keeps per-batch work
  sublinear in tokens).
- boolean_topk: positional-index serve must stay ~FLAT as the corpus
  grows (the terms' buckets partition-prune the read — same claim as
  phrase_index_topk, now for the n-term ranked-AND shape); the index
  build is the linear part.
- top_ngrams (two-pass Misra-Gries): growth vs the SAME query
  answered by the naive exact groupBy at both scales. The sketch's
  structural win is shuffle volume (per-partition summaries vs every
  distinct n-gram); wall-clock parity at local scale is fine, and
  `proved` records that the exactness certificate closed (no silent
  fallback).
- ann_pairs_topk regression pin (VERDICT r8 'what's wrong' #1):
  similarity.pairwise_topk on the real sf0.1 embeddings, N timed
  runs recorded individually — the block-matmul path's throughput
  record after the f32/malloc/BLAS fix (r1 record: 1.65 s; the r8
  regression measured 4.3-9.4 s quiet).

Usage: python tools/scale_rehearsal_r9.py  [~4-6 min]
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

    from sybil_spark.corpus import _UNIGRAM_VOCAB, _WORDPIECE_VOCAB
    from sybil_spark.operators import quality, similarity, sketch
    from sybil_spark.operators.unigram import unigram_apply
    from sybil_spark.operators.wordpiece import wordpiece_apply

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (SparkSession.builder.appName("scale-rehearsal-r9")
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

    def timed(fn, warmup: bool = True):
        if warmup:
            fn()
        t0 = time.time()
        out = fn()
        return round(time.time() - t0, 2), out

    res: dict = {"sf": SF_DIR, "replicas": 10, "pipelines": {}}

    # --- tokenizer applies: map-only, ~linear --------------------------
    for name, enc in [
            ("wordpiece_apply",
             lambda d: wordpiece_apply(d, "doc_id", "text",
                                       _WORDPIECE_VOCAB)),
            ("unigram_apply",
             lambda d: unigram_apply(d, "doc_id", "text",
                                     _UNIGRAM_VOCAB))]:
        t1, n1 = timed(lambda: enc(small).agg(
            F.sum("n_pieces")).collect()[0][0])
        t10, n10 = timed(lambda: enc(big).agg(
            F.sum("n_pieces")).collect()[0][0])
        res["pipelines"][name] = {
            "t_1x_s": t1, "t_10x_s": t10,
            "growth": round(t10 / max(t1, 1e-9), 2),
            "pieces_1x": int(n1), "pieces_10x": int(n10)}

    # --- boolean_topk: linear build, ~flat pruned serve ----------------
    terms = ["hash", "join", "table"]
    bool_stats = {}
    for label, corpus in [("1x", small), ("10x", big)]:
        idx = tempfile.mkdtemp(prefix=f"r9-bool-{label}-")
        try:
            tb, _ = timed(lambda: quality.build_bm25_index(
                corpus, "doc_id", "text", idx, nbuckets=32),
                warmup=False)
            # replica tokens are suffixed; query replica 0's terms at
            # 1x and replica 3's at 10x (same per-term posting mass)
            qterms = [t + ("_r0" if label == "1x" else "_r3")
                      for t in terms]
            ts, rows = timed(lambda: quality.boolean_topk(
                spark, idx, qterms, k=10).collect())
            bool_stats[f"t_build_{label}_s"] = tb
            bool_stats[f"t_serve_{label}_s"] = ts
            bool_stats[f"rows_{label}"] = len(rows)
        finally:
            shutil.rmtree(idx, ignore_errors=True)
    bool_stats["growth_serve"] = round(
        bool_stats["t_serve_10x_s"]
        / max(bool_stats["t_serve_1x_s"], 1e-9), 2)
    res["pipelines"]["boolean_topk"] = bool_stats

    # --- top_ngrams: sketch vs naive exact groupBy ---------------------
    tng = {}
    for label, corpus in [("1x", small), ("10x", big)]:
        proved = True
        try:
            ts, rows = timed(lambda: sketch.top_ngrams(
                corpus, "text", n=3, k=20, m=4096,
                mode="sketch").collect())
        except RuntimeError:
            proved = False
            ts, rows = timed(lambda: sketch.top_ngrams(
                corpus, "text", n=3, k=20, m=4096).collect())
        te, erows = timed(lambda: sketch.top_ngrams(
            corpus, "text", n=3, k=20, mode="exact").collect())
        assert [tuple(r) for r in rows] == [tuple(r) for r in erows]
        tng[f"t_sketch_{label}_s"] = ts
        tng[f"t_exact_{label}_s"] = te
        tng[f"proved_{label}"] = proved
    tng["growth_sketch"] = round(
        tng["t_sketch_10x_s"] / max(tng["t_sketch_1x_s"], 1e-9), 2)
    res["pipelines"]["top_ngrams"] = tng

    # the synthetic corpus is nearly FLAT (top trigram ~80 at 10x —
    # no Zipf head), so the exactness certificate honestly cannot
    # close there and auto falls back. Real corpora are Zipf; this
    # arm plants a realistic hot head (one boilerplate doc repeated,
    # ~3% of the corpus — far less skew than real web boilerplate)
    # on TOP of the 10x corpus and shows the proof closing.
    # >= k distinct heavy trigrams are required for a CERTIFIED
    # top-k (the k-th result itself must beat the missed-item
    # bound), so the boilerplate is a realistic 26-word banner
    hot = spark.range(20_000).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.lit("this website uses cookies to improve your experience "
              "while you navigate through the site by continuing to "
              "browse you agree to our use of tracking technologies")
         .alias("text"))
    zipf = big.unionByName(hot).localCheckpoint(eager=True)
    proved = True
    try:
        ts, rows = timed(lambda: sketch.top_ngrams(
            zipf, "text", n=3, k=20, m=4096, mode="sketch").collect())
    except RuntimeError:
        proved, ts, rows = False, None, None
    te, erows = timed(lambda: sketch.top_ngrams(
        zipf, "text", n=3, k=20, mode="exact").collect())
    if rows is not None:
        assert [tuple(r) for r in rows] == [tuple(r) for r in erows]
    res["pipelines"]["top_ngrams_zipf_head"] = {
        "t_sketch_s": ts, "t_exact_s": te, "proved": proved,
        "hot_docs": 20_000}

    # --- ann_pairs_topk throughput pin ----------------------------------
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding").localCheckpoint(eager=True)
    runs = []
    for i in range(4):
        t0 = time.time()
        n = similarity.pairwise_topk(emb, "embedding", "vec_id",
                                     k=20).count()
        runs.append(round(time.time() - t0, 2))
    res["pipelines"]["ann_pairs_topk_pin"] = {
        "runs_s": runs[1:], "warmup_s": runs[0], "rows": int(n),
        "r1_record_s": 1.65, "r8_regressed_s": "4.3-9.4"}

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
