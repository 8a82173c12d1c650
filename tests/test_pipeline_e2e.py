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


def test_selection_and_chunking_pipeline(spark, docs):
    """The round-5 additions composed as the selection/prep tail of a
    corpus build: span-level substring dedup → unigram-logprob quality
    ranking → per-source caps → token-budget selection → sliding-
    window chunking. Each stage's invariant asserted on the real
    documents table."""
    from sybil_spark.operators import quality

    # 1. span dedup: rewrite docs, drop the fully-stale ones
    sd = dedup.span_dedup(docs, "doc_id", "text", span_words=5)
    rewritten = (docs.select("doc_id", "source")
                 .join(sd.where(F.col("n_kept") > 0), "doc_id")
                 .withColumnRenamed("dedup_text", "text"))
    n1 = rewritten.count()
    assert 0 < n1 <= docs.count()
    # spans survived at most once corpus-wide
    respans = (dedup.doc_spans(rewritten, "doc_id", "text", 5)
               .where(F.length("span") > 0))
    # re-spanning a rewritten doc can re-align spans, so assert the
    # weaker but exact invariant: total kept spans == distinct spans
    assert sd.agg(F.sum("n_kept")).collect()[0][0] \
        == (dedup.doc_spans(docs, "doc_id", "text", 5)
            .select("span").distinct().count())
    assert respans.count() > 0

    # 2. quality ranking on the deduped corpus
    scored = rewritten.join(
        quality.unigram_logprob(rewritten, "doc_id", "text")
               .select("doc_id", "mean_logprob", "n_tokens"), "doc_id")

    # 3. per-source cap, then select best docs until a token budget
    capped = sampling.cap_per_group(scored, ["source"], 100,
                                    "mean_logprob", "doc_id") \
        .localCheckpoint(eager=True)  # take_until_budget runs several
    # jobs over its input — snapshot the expensive upstream once
    budget = 5000
    sel = sampling.take_until_budget(capped, "n_tokens", budget,
                                     "mean_logprob", "doc_id")
    picked = sel.agg(F.sum("n_tokens")).collect()[0][0]
    assert picked is not None and picked <= budget
    # prefix semantics: the FIRST excluded doc in quality order is
    # the one that crossed the budget (later, smaller docs may well
    # have fit — take_until_budget is a prefix, not a knapsack)
    first_out = (capped.join(sel.select("doc_id"), "doc_id", "left_anti")
                 .orderBy(F.desc_nulls_last("mean_logprob"),
                          F.asc("doc_id"))
                 .select("n_tokens").limit(1).collect())
    assert not first_out or picked + first_out[0][0] > budget

    # 4. chunk the selection for sequence construction
    chunks = sampling.chunk_documents(sel, "doc_id", "text",
                                      max_words=32, overlap=4)
    per_doc = {r["doc_id"]: r for r in
               chunks.groupBy("doc_id")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.max("n_words").alias("mx")).collect()}
    assert set(per_doc) == {r["doc_id"] for r in sel.collect()}
    assert all(v["mx"] <= 32 for v in per_doc.values())


def test_curation_pipeline_round6(spark, docs):
    """The round-6 additions composed as the front half of a corpus
    build: Gopher structural rules → unaligned ExactSubstr rewrite →
    DSIR target-tilted weighting → deterministic weighted
    downsampling. Each stage's invariant asserted on the real
    documents table, with a planted DSIR target so the tilt is
    provable, not assumed."""
    from sybil_spark.operators import quality

    # 1. Gopher rules: keep passing docs; the struct's conjunction
    # must equal the AND of its members
    # min_stop_types=1: the synthetic vocab carries only 'the' from
    # the Gopher stop set (same adjustment as the corpus query)
    g = docs.withColumn("g", T.gopher_rules(F.col("text"),
                                            min_stop_types=1))
    bad_conj = g.where(F.col("g.passes") != (
        F.col("g.word_count") & F.col("g.mean_word_len")
        & F.col("g.symbol_ratio") & F.col("g.bullet_lines")
        & F.col("g.ellipsis_lines") & F.col("g.alpha_words")
        & F.col("g.stop_words"))).count()
    assert bad_conj == 0
    kept = g.where(F.col("g.passes")).drop("g")
    n1 = kept.count()
    assert 0 < n1 <= docs.count()

    # 2. unaligned ExactSubstr: token counts never grow; a doc with
    # no duplicated window passes through verbatim
    es = dedup.exact_substr_dedup(kept, "doc_id", "text",
                                  window_words=8)
    assert es.where(F.col("n_kept") > F.col("n_tokens")).count() == 0
    verbatim = (es.where(F.col("n_kept") == F.col("n_tokens"))
                  .join(kept, "doc_id")
                  .where(F.col("dedup_text") != F.col("text")).count())
    assert verbatim == 0
    rewritten = (kept.select("doc_id", "lang", "source")
                 .join(es.where(F.col("n_kept") > 0), "doc_id")
                 .withColumnRenamed("dedup_text", "text")
                 .localCheckpoint(eager=True))

    # 3. DSIR with a PLANTED target: docs with doc_id % 5 == 0 get a
    # marker bigram appended; the target is exactly those docs, so
    # their importance weights must tilt above the rest
    marked = rewritten.withColumn(
        "text", F.when(F.col("doc_id") % 5 == 0,
                       F.concat(F.col("text"),
                                F.lit(" zzmark zzmark zzmark")))
                 .otherwise(F.col("text")))
    w = quality.dsir_logratio(
        marked, marked.where(F.col("doc_id") % 5 == 0),
        "doc_id", "text", buckets=1024)
    tilt = (w.withColumn("is_t", (F.col("doc_id") % 5 == 0))
             .groupBy("is_t")
             .agg(F.avg("logratio").alias("m")).collect())
    means = {r["is_t"]: r["m"] for r in tilt}
    assert means[True] > means[False]

    # 4. deterministic weighted downsampling from the weights: map
    # logratio rank to keep-probability tiers (head 1.0 / tail 0.25)
    med = w.approxQuantile("logratio", [0.5], 0.0)[0]
    probed = w.withColumn(
        "p", F.when(F.col("logratio") >= med, F.lit(1.0))
              .otherwise(F.lit(0.25)))
    sel = sampling.weighted_sample(probed, "doc_id", "p")
    n_head = probed.where(F.col("logratio") >= med).count()
    n_sel = sel.count()
    assert n_head <= n_sel <= w.count()
    # determinism: same keys + same probabilities -> same selection
    assert sel.count() == sampling.weighted_sample(
        probed, "doc_id", "p").count()
