"""Benchmark harness — headline corpus queries at a given scale factor.

Runs each headline query end-to-end (plan + execute + fetch) on a local
Spark session and prints ONE JSON line:

    {"metric": "corpus_total", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_QUERIES (comma-separated subset override).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline set: the reference's canonical shapes + one of each
#: pipeline-operator family, heaviest variants included.
HEADLINE = [
    "count", "avg", "hist", "time_avg", "group_count", "distinct",
    "time_distinct", "group_avg", "group_avg_limit", "group_hist",
    "regex_avg", "group2_avg", "time_group_avg_limit",
    "percentiles", "weighted_count",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "join_geo",
    "dedup_exact", "dedup_clusters", "minhash_lsh", "simhash_dup", "ngram_jaccard",
    "ann_topk", "ann_pairs_topk", "ivf_topk", "embedding_dup",
    "text_stats", "lang_id", "token_freq", "loghist", "hash_sample",
    "rollup_serve", "media_meta", "asof_join", "range_join",
    "sessionize", "topk_per_group", "hist_summary", "weighted_percentile",
    "decontaminate", "tpch_q7",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = os.environ.get("BENCH_QUERIES")
    names = names.split(",") if names else HEADLINE

    from sybil_spark.session import get_spark
    from sybil_spark.corpus import QUERIES

    spark = get_spark("bench", master=f"local[{cpus}]")
    # Warm the JVM/codegen path and the Python workers (pandas/numpy
    # import + Arrow setup) once, so per-query numbers measure the
    # engine, not classloading or worker fork cost.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    (spark.range(8).repartition(int(cpus) if cpus.isdigit() else 8)
          .mapInPandas(lambda it: (pdf for pdf in it), "id long").count())
    # Pre-register every corpus table once (file listing + footer
    # schema read + the events.ts layout probe). Whichever query
    # happens to touch a table first would otherwise absorb that
    # one-time driver-side metadata cost (~0.1-0.3 s/table) into its
    # number; steady-state per-query times are what the bench is
    # for. The data itself is NOT cached — every query still scans
    # parquet.
    from sybil_spark import corpus as C
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents",
                "embeddings"]:
        C._t(spark, sf_dir, tbl).count()
    C._events(spark, sf_dir).select("time").limit(1).collect()

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    from sybil_spark.operators._util import unpersist_unscoped

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            n = len(fn(spark, sf_dir).collect())
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the harness alive; flag the query
            timings[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)
        # release any operator-persisted intermediates (tfidf/bm25 tf
        # frames) so one query's cache can't occupy memory for the rest
        unpersist_unscoped()
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({"metric": "corpus_total", "value": total,
                      "unit": "sec", "queries": timings, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
