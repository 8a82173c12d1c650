"""Model-based quality scoring: a fastText/CCNet-style document
quality classifier as (a) pure-codegen featurization, (b) MLlib
logistic-regression training, (c) pure-codegen scoring.

The pipeline pattern (CCNet, GPT-3's WebText classifier, LLaMA's
quality filters): train a cheap linear classifier on weak labels
("looks like curated text" vs "looks like raw crawl") and score the
whole corpus with it. The expensive part at 100 TB is SCORING, and
scoring here is a single codegen expression — a dot product of
literal weights with columnar features, a sigmoid, and a threshold;
no model object, no UDF, no shuffle, vectorized through the scan.
Training runs on a (sampled) labeled frame via pyspark.ml's
distributed LBFGS — the standard Spark tool for exactly this — and
hands back plain python floats, decoupling the heavy scorer from any
MLlib runtime dependency.

Cross-engine exactness for the oracle row: every feature is a ratio
of exact integer counts (or an exactly-derived double), the dot
product is written in fixed left-to-right order, and the sigmoid
output quantizes through the decimal(38,6) varchar round-trip before
the label comparison — the same transcendental-parity discipline as
functions.text.char_entropy (JVM exp, like JVM ln, is not bit-equal
to libm's on all inputs)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sybil_spark.functions.text import (avg_word_len, repetition_ratio,
                                        stopword_ratio, token_count)

#: the default feature battery: cheap, language-agnostic-ish,
#: all ratios of exact integer counts computable in one codegen pass
QUALITY_FEATURES = ("n_tokens", "stop_ratio", "mean_word_len",
                    "rep_ratio")


def ngram_bucket_features(col: Column, n: int = 3, buckets: int = 8,
                          prefix: str = "ng") -> list[Column]:
    """fastText-style hashed character-n-gram features as PURE
    CODEGEN columns: feature i is the fraction of the text's
    n-grams whose hash lands in bucket i (0.0 for texts shorter
    than n). This is the sub-token signal the 4-ratio battery
    can't see — spam alphabets, encoding junk, non-language
    character salads — folded into fixed-width columns so the
    scorer STAYS a map-only literal-weight projection at 100 TB.

    Hash = the 60-bit md5 family (dedup's portable hashes,
    `cast('0x'||substr(md5(g),1,15) as bigint)` in SQL) so an
    oracle replicates every feature bit-for-bit; bucket = h mod
    `buckets` (h is positive, pmod == %). Ratios are double
    divisions of exact integer counts."""
    from sybil_spark.functions.text import char_ngrams

    grams = char_ngrams(col, n)
    hs = F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
             .cast("long"),
            F.lit(buckets)))
    # ONE fold builds all bucket counts (vs a filter+size pass per
    # bucket, which hashes the gram array `buckets` times)
    counts = F.aggregate(
        hs, F.array_repeat(F.lit(0), buckets),
        lambda acc, h: F.transform(
            acc,
            lambda c, j: F.when(j.cast("long") == h, c + 1)
                          .otherwise(c)))
    total = F.size(grams)
    return [F.when(total > 0,
                   F.element_at(counts, i + 1).cast("double")
                   / total.cast("double"))
             .otherwise(F.lit(0.0)).alias(f"{prefix}{i}")
            for i in range(buckets)]


def quality_features(col: Column, ngram_buckets: int = 0,
                     ngram_n: int = 3) -> Column:
    """struct of the default feature battery over a text column —
    one codegen pass, no shuffle, no UDF. `ngram_buckets` > 0
    appends that many hashed character-n-gram bucket ratios
    (ngram_bucket_features) — still one codegen pass."""
    fields = [
        token_count(col).cast("double").alias("n_tokens"),
        stopword_ratio(col).alias("stop_ratio"),
        avg_word_len(col).alias("mean_word_len"),
        repetition_ratio(col).alias("rep_ratio")]
    if ngram_buckets:
        fields += ngram_bucket_features(col, n=ngram_n,
                                        buckets=ngram_buckets)
    return F.struct(*fields)


def score_logistic(df: DataFrame, feature_cols: list[str],
                   weights: list[float], intercept: float,
                   prob_col: str = "prob",
                   label_col: str = "pred",
                   threshold: float = 0.5) -> DataFrame:
    """Score rows with a FIXED logistic model: p = sigmoid(w·x + b),
    pred = p >= threshold. Weights are inlined as literals, so the
    whole scorer is one whole-stage-codegen projection over the scan
    — the shape that turns "classify 100 TB" into a map-only job.

    z accumulates left-to-right in feature order (the oracle mirrors
    the same association); p quantizes through the decimal varchar
    round-trip so the JVM-vs-libm exp() ulp cannot leak into the
    output or flip the threshold comparison."""
    if len(weights) != len(feature_cols):
        raise ValueError("weights/features length mismatch")
    z = F.lit(float(intercept))
    for w, c in zip(weights, feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    p = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))) \
        .cast("decimal(38,6)").cast("string").cast("double")
    return (df.withColumn(prob_col, p)
              .withColumn(label_col,
                          (F.col(prob_col) >= F.lit(threshold))
                          .cast("int")))


def train_logistic(df: DataFrame, feature_cols: list[str],
                   label_col: str,
                   reg_param: float = 0.0,
                   max_iter: int = 100) -> tuple[list[float], float]:
    """Fit a logistic-regression quality classifier with pyspark.ml
    (distributed LBFGS) and return (weights, intercept) as plain
    floats for score_logistic. The MLlib dependency stays INSIDE
    this function: training happens once on a labeled (usually
    sampled) frame; the corpus-sized scoring pass never touches
    MLlib."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=list(feature_cols),
                          outputCol="__features")
    lr = LogisticRegression(featuresCol="__features",
                            labelCol=label_col,
                            regParam=reg_param, maxIter=max_iter)
    model = lr.fit(asm.transform(
        df.select(*feature_cols, label_col)))
    return ([float(w) for w in model.coefficients],
            float(model.intercept))


def lang_profiles(df: DataFrame, lang_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """(lang, g, cnt): per-language character-n-gram frequency
    profiles (Cavnar & Trenkle 1994 — the trained replacement for
    the stopword-heuristic functions.text.lang_id). One explode +
    one groupBy; the profile table is #langs × #grams rows —
    alphabet-bounded, broadcastable at any corpus size."""
    from sybil_spark.functions.text import char_ngrams

    return (df.select(F.col(lang_col).alias("lang"),
                      F.explode(char_ngrams(F.col(text_col), n))
                       .alias("g"))
              .groupBy("lang", "g")
              .agg(F.count(F.lit(1)).alias("cnt")))


def lang_id_trained(df: DataFrame, id_col: str, text_col: str,
                    profiles: DataFrame, n: int = 3) -> DataFrame:
    """Predict each document's language by cosine similarity between
    its char-n-gram count vector and every language profile —
    argmax language, ties → lexicographically first.

    Cross-engine exactness by construction: dot products and squared
    norms are EXACT INTEGER sums of count products; the only float
    ops are two IEEE-correctly-rounded sqrts, one multiply, one
    divide, composed identically on both engines — so scores (and
    therefore the argmax) are bit-equal with no quantization needed,
    unlike the ln/exp-based operators.

    Scale shape: docs explode to (doc, g, cnt) once; the profile
    join is an equi-join on the gram (profiles broadcast when small)
    feeding one (doc, lang) aggregate; norms are one tiny frame per
    side. Output: (id_col, pred_lang, score), one row per doc that
    has at least one n-gram."""
    from pyspark.sql import Window

    from sybil_spark.functions.text import char_ngrams

    dg = (df.select(F.col(id_col).alias("__id"),
                    F.explode(char_ngrams(F.col(text_col), n))
                     .alias("g"))
            .groupBy("__id", "g")
            .agg(F.count(F.lit(1)).alias("c")))
    nd = dg.groupBy("__id").agg(F.sum(F.col("c") * F.col("c"))
                                .alias("nd2"))
    nl = profiles.groupBy("lang").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("nl2"))
    dot = (dg.join(profiles.select("lang", "g", "cnt"), "g")
             .groupBy("__id", "lang")
             .agg(F.sum(F.col("c") * F.col("cnt")).alias("dot")))
    cos = (dot.join(nd, "__id").join(F.broadcast(nl), "lang")
              .select("__id", "lang",
                      (F.col("dot").cast("double")
                       / (F.sqrt(F.col("nd2").cast("double"))
                          * F.sqrt(F.col("nl2").cast("double"))))
                      .alias("score")))
    w = Window.partitionBy("__id").orderBy(F.desc("score"),
                                           F.asc("lang"))
    return (cos.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1)
               .select(F.col("__id").alias(id_col),
                       F.col("lang").alias("pred_lang"), "score"))
