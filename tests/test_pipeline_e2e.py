"""End-to-end training-data pipeline: the engine's LLM-side operators
composed the way a real corpus build runs them — quality filter →
benchmark decontamination → MinHash near-dup dedup (cluster, keep
best) → deterministic splits → sequence packing → materialized
training sequences. Each stage's invariant is asserted on the real
documents table, proving the operators compose, not just pass their
unit tests."""

import pytest
from pyspark.sql import functions as F

from sybil_spark.functions import text as T
from sybil_spark.operators import dedup, sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_training_data_pipeline_end_to_end(spark, docs):
    n0 = docs.count()

    # 1. quality filter: drop the lowest-quality tail
    scored = docs.withColumn("q", T.quality_score(F.col("text")))
    kept = scored.where(F.col("q") >= 0.2)
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. decontaminate vs a planted eval set (every 25th doc)
    bench = kept.where(F.col("doc_id") % 25 == 0)
    corpus = kept.where(F.col("doc_id") % 25 != 0)
    clean = dedup.decontaminate(corpus, "doc_id", "text",
                                bench, "doc_id", "text",
                                shingle_n=3, min_overlap=5)
    n2 = clean.count()
    assert n2 <= corpus.count()
    # post-condition: no surviving doc overlaps the bench set >= 5
    leftover = (dedup.contamination(clean, "doc_id", "text",
                                    bench, "doc_id", "text", shingle_n=3)
                .where(F.col("n_overlap") >= 5).count())
    assert leftover == 0

    # 3. near-dup dedup: MinHash candidates -> exact verify ->
    #    connected components -> keep the highest-quality member
    cands = dedup.minhash_lsh_candidates(clean, "doc_id", "text",
                                         num_hashes=64, bands=16)
    pairs = dedup.jaccard_pairs(clean, "doc_id", "text",
                                candidates=cands, threshold=0.8)
    survivors = dedup.keep_cluster_representatives(
        clean.withColumn("__q", F.col("n_chars")), "doc_id", pairs,
        score_col="__q").drop("__q")
    n3 = survivors.count()
    assert n3 <= n2
    # post-condition: re-running the same candidate generator on the
    # survivors finds no verified near-dup pair left
    re_cands = dedup.minhash_lsh_candidates(survivors, "doc_id", "text",
                                            num_hashes=64, bands=16)
    re_pairs = dedup.jaccard_pairs(survivors, "doc_id", "text",
                                   candidates=re_cands, threshold=0.8)
    assert re_pairs.count() == 0

    # 4. deterministic splits: disjoint, exhaustive, stable
    split = sampling.assign_splits(survivors, "doc_id")
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert sum(counts.values()) == n3
    assert counts.get("train", 0) > counts.get("val", 0)
    again = {r["split"]: r["n"] for r in
             sampling.assign_splits(survivors, "doc_id")
             .groupBy("split").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert again == counts

    # 5. pack the train split and materialize sequences
    train = (split.where(F.col("split") == "train")
             .withColumn("n_tokens", T.token_count(F.col("text"))))
    packed = sampling.pack_by_budget(train, "doc_id", "n_tokens",
                                     budget=512, partitions=4)
    seqs = sampling.materialize_batches(train, packed, "doc_id",
                                        "n_tokens", "text", sep="\n\n")
    rows = seqs.collect()
    assert sum(r["n_docs"] for r in rows) == counts["train"]
    assert all(r["n_tokens"] <= 512 for r in rows)
    # padding efficiency: FFD should fill batches reasonably well
    avg_fill = sum(r["n_tokens"] for r in rows) / (512 * len(rows))
    assert avg_fill > 0.5, avg_fill
