"""Off-gate scale rehearsal (VERDICT r4 item 5): run the three
bench-dominating similarity pipelines on the real sf0.1 documents
corpus AND a 10x replica corpus, print one JSON line with the
runtime growth ratios. Near-linear growth (~10x data -> ~<=12x time)
is the empirical check that the posting cap, LSH banding, and band
equi-joins have no quadratic stage hiding under the fixed benchmark
size.

The 10x corpus is 10 replicas of sf0.1 documents with every token
suffixed per-replica: replicas share ZERO shingles, so no cross-
replica shingle overlap exists and runtime growth isolates the
engine's scaling. Pair-count replication is exact for set-overlap
pipelines (jaccard == 10x; minhash == 10x plus rare extra band-hash
collisions) but only approximate for simhash: its hamming<=8
borderline pairs (which dwarf the true near-dups) are sensitive to
the token hashes, and each replica re-tokenizes — counts stay the
same order of magnitude, not identical (measured r5: 28.3k/replica0
vs 48.2k/replica avg).

Runs in its own JVM with a 6g driver: the 10x corpus localCheckpoint
blocks plus AQE broadcast builds don't fit the default 1g test heap
(in cluster mode those blocks live on executors — local[N] puts
everything in one heap).

Usage: python tools/scale_rehearsal.py  [writes JSON to stdout]
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

    from sybil_spark.operators import dedup, quality

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (SparkSession.builder.appName("scale-rehearsal")
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
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    small = reps[0].localCheckpoint(eager=True)
    big = big.localCheckpoint(eager=True)

    def timed(fn, df, **kw):
        from sybil_spark.operators._util import cache_scope
        t0 = time.time()
        with cache_scope():   # release auto-persisted tf per run
            n = fn(df, "doc_id", "text", **kw).count()
        return time.time() - t0, n

    def simhash(df, idc, tc):
        c = dedup.simhash_candidates(df, idc, tc)
        return c.where(dedup.hamming64(F.col("sig_a"),
                                       F.col("sig_b")) <= 8)

    out = {"sf": SF_DIR, "replicas": 10, "pipelines": {}}
    def span5(df, idc, tc):
        # aggregate over n_kept/dedup_text so the timed .count()
        # cannot eliminate the hash plan's unique-key LEFT join
        # (same forcing as exsub below)
        return (dedup.span_dedup(df, idc, tc, span_words=5)
                .groupBy()
                .agg(F.sum("n_kept").alias("k"),
                     F.sum(F.length("dedup_text")).alias("c")))

    def tfidf3(df, idc, tc):
        return quality.tfidf_top_terms(df, idc, tc, k=3)

    def winnow(df, idc, tc):
        return dedup.winnow_pairs(df, idc, tc, k=5, window=8)

    def bm25(df, idc, tc):
        # replica-0 token forms, so the queries hit real postings in
        # both the 1x and the 10x corpus (suffixed replicas share no
        # tokens with the plain strings)
        q = df.sparkSession.createDataFrame(
            [(1, "hash_r0 join_r0 table_r0"),
             (2, "slow_r0 scan_r0 filter_r0")],
            "q_id long, q_text string")
        return quality.bm25_topk(df, idc, tc, q, k=5)

    def ppl(df, idc, tc):
        scored = (quality.unigram_logprob(df, idc, tc)
                  .select(idc, F.col("mean_logprob").alias("score"))
                  .localCheckpoint(eager=True))
        return quality.quantile_buckets(scored, idc, "score")

    def exsub(df, idc, tc):
        # aggregate over n_kept/dedup_text so the timed .count()
        # cannot drop the window machinery via left-join elimination
        # (the output cardinality alone needs only dropDuplicates)
        return (dedup.exact_substr_dedup(df, idc, tc, window_words=8)
                .groupBy()
                .agg(F.sum("n_kept").alias("k"),
                     F.sum(F.length("dedup_text")).alias("c")))

    def dsir(df, idc, tc):
        # target = a deterministic ~1/7 slice; both distributions and
        # the scored corpus scale with the replica count. Aggregate
        # the outputs so the harness's .count() cannot prune the
        # logratio sum and eliminate the unique-key broadcast joins
        # (the same measurement hole fixed for exsub below).
        return (quality.dsir_logratio(
                    df, df.where(F.pmod(F.col(idc), F.lit(7)) == 0),
                    idc, tc, buckets=4096)
                .groupBy()
                .agg(F.sum("logratio").alias("s"),
                     F.sum("n_feats").alias("f")))

    for name, fn, kw in (
            ("minhash_lsh", dedup.minhash_dedup_pairs, {}),
            ("simhash_dup", simhash, {}),
            ("ngram_jaccard", dedup.jaccard_pairs, {"threshold": 0.5}),
            # round-5 session-3 text ops: suffixed replicas share no
            # spans/tokens, so growth isolates the window + join scaling
            ("span_dedup", span5, {}),
            ("doc_logprob", quality.unigram_logprob, {}),
            ("tfidf_terms", tfidf3, {}),
            # round-6 ops: winnowing candidate join, BM25 retrieval
            # (query side fixed, corpus 10x), perplexity bucketing
            # (two-phase plan: growth isolates the histogram +
            # boundary-window passes)
            ("winnow_dup", winnow, {}),
            ("bm25_search", bm25, {}),
            ("ppl_buckets", ppl, {}),
            # round-6 session-2: stride-1 unaligned ExactSubstr
            # (window volume = tokens, not tokens/span — the heaviest
            # candidate generator in the package) and DSIR bucket
            # scoring (fixed-width histograms, growth isolates the
            # explode + broadcast-join scan)
            ("exact_substr", exsub, {}),
            ("dsir_weights", dsir, {})):
        timed(fn, small, **kw)                      # warm
        t1, n1 = timed(fn, small, **kw)
        t10, n10 = timed(fn, big, **kw)
        out["pipelines"][name] = {
            "t_1x_s": round(t1, 2), "t_10x_s": round(t10, 2),
            "growth": round(t10 / t1, 2),
            "pairs_1x": n1, "pairs_10x": n10,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
