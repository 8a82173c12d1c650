"""Item-6 (r10 VERDICT): per-leg micro-batch latency record for the
seven streaming legs, on real sf0.1 data, interleaved reps.

Each leg gets a bootstrap index built from the first half of the
corpus, then processes 5 micro-batches of 500 documents (or the
embedding analogues) through processAllAvailable(), recording each
batch's wall seconds. Reps re-run the whole leg with fresh dirs;
leg order is interleaved across reps so host drift cannot vote.

Usage: python tools/bench_streaming_r11.py [reps] > out.json
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
N_BATCHES = 5


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StringType, StructField, StructType)

    from sybil_spark.operators import dedup, quality, similarity
    from sybil_spark.streaming import ingest_stream as IS

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.appName("bench-streaming-r11")
             .master(f"local[{cpus}]")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").orderBy("doc_id").collect()
    half = len(docs) // 2
    hist_rows = [(r["doc_id"], r["text"]) for r in docs[:half]]
    rest = [(r["doc_id"], r["text"]) for r in docs[half:]]
    bsz = max(1, len(rest) // N_BATCHES)
    doc_batches = [rest[i * bsz:(i + 1) * bsz] for i in range(N_BATCHES)]
    doc_schema = StructType([StructField("doc_id", LongType()),
                             StructField("text", StringType())])

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding").orderBy("vec_id").collect()
    ehalf = len(embs) // 2
    ehist = [(r["vec_id"], [float(x) for x in r["embedding"]])
             for r in embs[:ehalf]]
    erest = [(r["vec_id"], [float(x) for x in r["embedding"]])
             for r in embs[ehalf:]]
    ebsz = max(1, len(erest) // N_BATCHES)
    emb_batches = [erest[i * ebsz:(i + 1) * ebsz] for i in range(N_BATCHES)]
    emb_schema = StructType([StructField("vec_id", LongType()),
                             StructField("embedding",
                                         ArrayType(DoubleType()))])
    dim = len(ehist[0][1])

    def hist_df(rows, schema):
        return spark.createDataFrame(rows, schema)

    def run_leg(start, batches, schema, cols):
        """start(tmp) -> StreamingQuery factory given a src dir;
        returns per-batch seconds."""
        tmp = tempfile.mkdtemp(prefix="sleg-")
        src = os.path.join(tmp, "in")
        os.makedirs(src)
        try:
            q = start(tmp, src, schema)
            times = []
            for i, rows in enumerate(batches):
                with open(os.path.join(src, f"b{i}.ndjson"), "w") as f:
                    for r in rows:
                        f.write(json.dumps(dict(zip(cols, r))) + "\n")
                t0 = time.time()
                q.processAllAvailable()
                times.append(round(time.time() - t0, 2))
            q.stop()
            return times
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def leg_exact(tmp, src, schema):
        idx = os.path.join(tmp, "idx")
        dedup.hash_index(hist_df(hist_rows, doc_schema),
                         ["text"]).write.parquet(idx)
        stream = spark.readStream.schema(schema).json(src)
        return IS.stream_dedup_against_index(
            stream, ["text"], "doc_id", os.path.join(tmp, "out"), idx)

    def leg_near(tmp, src, schema):
        idx = os.path.join(tmp, "idx")
        IS.bootstrap_minhash_band_index(hist_df(hist_rows, doc_schema),
                                        "doc_id", "text", idx)
        stream = spark.readStream.schema(schema).json(src)
        return IS.stream_near_dedup_against_index(
            stream, "doc_id", "text", os.path.join(tmp, "out"), idx)

    def leg_span(tmp, src, schema):
        idx = os.path.join(tmp, "idx")
        IS.bootstrap_span_index(hist_df(hist_rows, doc_schema),
                                "doc_id", "text", idx, span_words=20)
        stream = spark.readStream.schema(schema).json(src)
        return IS.stream_span_dedup_against_index(
            stream, "doc_id", "text", os.path.join(tmp, "out"), idx,
            span_words=20)

    def leg_exsub(tmp, src, schema):
        idx = os.path.join(tmp, "idx")
        IS.bootstrap_window_index(hist_df(hist_rows, doc_schema),
                                  "doc_id", "text", idx, window_words=10)
        stream = spark.readStream.schema(schema).json(src)
        return IS.stream_exact_substr_against_index(
            stream, "doc_id", "text", os.path.join(tmp, "out"), idx,
            window_words=10)

    def leg_embed(tmp, src, schema):
        stream = spark.readStream.schema(schema).json(src)
        return IS.stream_embedding_dedup_against_index(
            stream, "vec_id", "embedding", dim=dim,
            out_path=os.path.join(tmp, "out"),
            index_path=os.path.join(tmp, "idx"), threshold=0.95)

    def leg_bm25(tmp, src, schema):
        idx = os.path.join(tmp, "idx")
        quality.build_bm25_index(hist_df(hist_rows, doc_schema),
                                 "doc_id", "text", idx)
        stream = spark.readStream.schema(schema).json(src)
        return IS.stream_bm25_index_add(stream, idx)

    def leg_ivfpq(tmp, src, schema):
        idx = os.path.join(tmp, "idx")
        similarity.build_ivfpq_index(hist_df(ehist, emb_schema),
                                     "embedding", idx)
        stream = spark.readStream.schema(schema).json(src)
        return IS.stream_ivfpq_index_add(stream, idx)

    legs = [
        ("stream_dedup_exact", leg_exact, doc_batches, doc_schema,
         ("doc_id", "text")),
        ("stream_near_dedup_minhash", leg_near, doc_batches, doc_schema,
         ("doc_id", "text")),
        ("stream_span_dedup", leg_span, doc_batches, doc_schema,
         ("doc_id", "text")),
        ("stream_exact_substr", leg_exsub, doc_batches, doc_schema,
         ("doc_id", "text")),
        ("stream_embedding_dedup", leg_embed, emb_batches, emb_schema,
         ("vec_id", "embedding")),
        ("stream_bm25_index_add", leg_bm25, doc_batches, doc_schema,
         ("doc_id", "text")),
        ("stream_ivfpq_index_add", leg_ivfpq, emb_batches, emb_schema,
         ("vec_id", "embedding")),
    ]

    from bench import quiet_probe
    out = {"what": "streaming micro-batch latency per leg (r10 #6)",
           "protocol": f"bootstrap from first half of sf0.1, "
                       f"{N_BATCHES} batches x {bsz} docs "
                       f"({ebsz} vectors), local[{cpus}], "
                       f"{reps} interleaved reps, per-batch "
                       "processAllAvailable wall sec",
           "legs": {}, "probes": []}
    for rep in range(reps):
        out["probes"].append(quiet_probe())
        for name, fn, batches, schema, cols in legs:
            t = run_leg(fn, batches, schema, cols)
            out["legs"].setdefault(name, []).append(t)
            print(f"# rep{rep} {name}: {t}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
