"""Benchmark harness — headline corpus queries at a given scale factor.

Runs each headline query end-to-end (plan + execute + fetch) on a local
Spark session and prints ONE JSON line:

    {"metric": "corpus_total", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>,
     "probe_sec": <fixed-workload sec>, "runs": {"<name>": n, ...}}

Contention defense: a benchmark sharing its host with other jobs
measures the neighbors, not the engine. Two countermeasures:
- every query runs at least twice (three times when still >= 2 s)
  and the RECORDED time is the minimum — a single contended pass
  cannot write the record;
- a fixed single-thread CPU probe is timed before the queries and
  its seconds recorded as `probe_sec`, so a reader can compare the
  probe against its historical value and discount a contended run.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_QUERIES (comma-separated subset override),
     BENCH_REPS (max repetitions per query, default 3).
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


def quiet_probe() -> float:
    """Seconds for a fixed single-thread workload (pure-python loop +
    one small numpy matmul chain). ~1 s on an idle 2.7 GHz core;
    materially higher means the host was contended during the run."""
    import numpy as np
    t0 = time.time()
    acc = 0
    for i in range(8_000_000):
        acc += i * i
    X = np.arange(512 * 64, dtype=np.float64).reshape(512, 64) / 1e5
    for _ in range(20):
        S = X @ X.T
        X = (S[:, :64] % 7.0) / 7.0
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = os.environ.get("BENCH_QUERIES")
    names = names.split(",") if names else HEADLINE

    from pyspark.sql import functions as F

    from sybil_spark.session import get_spark
    from sybil_spark.corpus import QUERIES

    probe = quiet_probe()

    spark = get_spark("bench", master=f"local[{cpus}]")
    # Warm the JVM/codegen path and the Python workers (pandas/numpy
    # import + Arrow setup) once, so per-query numbers measure the
    # engine, not classloading or worker fork cost.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    (spark.range(8).repartition(int(cpus) if cpus.isdigit() else 8)
          .mapInPandas(lambda it: (pdf for pdf in it), "id long").count())
    # ... and the grouped-pandas path (shuffle -> applyInPandas):
    # its first execution pays worker+Arrow+codegen setup the
    # mapInPandas warmup above does not cover, which otherwise lands
    # on whichever block-matmul query runs first (~5 s observed).
    # The warmup body runs one small SGEMM: the first numpy matmul
    # in a fresh worker additionally pays numpy import + BLAS
    # init + malloc arena growth (~3-4 s spread over the pool) —
    # measured on focused single-query runs where no earlier query
    # had warmed the workers.

    def _warm_blas(pdf):
        import numpy as np
        X = np.arange(96 * 32, dtype=np.float32).reshape(96, 32)
        (X @ X.T).sum()
        return pdf

    (spark.range(256).withColumn("g", F.pmod("id", F.lit(64)))
          .groupBy("g")
          .applyInPandas(_warm_blas, "id long, g bigint").count())
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

    max_reps = int(os.environ.get("BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    reps: dict[str, int] = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        n_runs = 0
        try:
            # best-of-N: >=2 runs always; a 3rd when the best is
            # still >= 2 s (the expensive queries are the ones a
            # contended pass distorts most). Each rep re-plans AND
            # re-executes (fn builds a fresh DataFrame); operator
            # caches are dropped between reps so rep 2 measures the
            # same work as rep 1, not a cache hit.
            while n_runs < max_reps:
                t0 = time.time()
                fn(spark, sf_dir).collect()
                dt = time.time() - t0
                n_runs += 1
                best = dt if best is None else min(best, dt)
                # release operator-persisted intermediates (tfidf/
                # bm25 tf frames) between reps and between queries
                unpersist_unscoped()
                if n_runs >= 2 and best < 2.0:
                    break
            timings[name] = round(best, 3)
        except Exception as e:  # keep the harness alive; flag the query
            timings[name] = -1.0
            unpersist_unscoped()
            print(f"# bench error {name}: {e}", file=sys.stderr)
        reps[name] = n_runs
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({"metric": "corpus_total", "value": total,
                      "unit": "sec", "queries": timings, "sf": sf,
                      "probe_sec": probe, "runs": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
