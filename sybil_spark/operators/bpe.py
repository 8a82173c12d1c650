"""Distributed byte-pair-encoding (BPE) training and encoding.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units"): learn a vocabulary of subword merges by repeatedly
replacing the most frequent adjacent symbol pair with a new merged
symbol. This is the tokenizer-training pass of every modern LLM data
pipeline, and the part that benefits from a cluster is exactly the
part Spark is good at: the corpus-scale word count. After that, the
iterative merge loop runs over the DISTINCT-word vocabulary — a
frame that grows with Heaps' law (~sqrt of corpus tokens), not with
corpus size, so the per-iteration shuffles stay small even at 100 TB
of input text.

Scale shape:
- `word_counts`: one explode + one groupBy — the only corpus-sized
  shuffle in the whole trainer.
- `bpe_train`: each merge iteration is one pair-explode + groupBy
  over the vocab frame plus a 1-row `.collect()` argmax (bounded —
  same contract as dedup.components' convergence count), then a
  zero-shuffle fold that rewrites symbol arrays in place. Lineage is
  truncated per iteration with localCheckpoint, the same trick
  components() uses to keep round time constant.
- `bpe_encode`: pure chained fold expressions over each document's
  words — zero shuffle, zero UDF; cost is O(tokens x num_merges)
  map-side work that scales embarrassingly with executors.

Symbols are plain strings (no end-of-word marker): merges never
cross word boundaries because pairs are generated within each word's
symbol array only. Ties in the argmax break deterministically by
(freq desc, left asc, right asc) so training is reproducible on any
engine — the property the python-reference fuzz test pins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sybil_spark.functions.text import tokens


def word_counts(df: DataFrame, text_col: str,
                pattern: str | None = None) -> DataFrame:
    """(word, cnt) over whitespace (or regex) tokens — the one
    corpus-sized pass; everything downstream operates on the
    distinct-word vocabulary."""
    return (df.select(F.explode(tokens(F.col(text_col), pattern))
                      .alias("word"))
              .where(F.col("word") != "")
              .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (overlapping
    positions both count, as in the reference BPE trainer)."""
    # sequence(1, 0) would generate DESCENDING [1, 0] — guard the
    # single-symbol case to an empty pair list explicitly.
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(F.element_at(syms, i).alias("l"),
                           F.element_at(syms, i + 1).alias("r")))
    return F.when(F.size(syms) >= 2, pairs) \
            .otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Rewrite a symbol array applying ONE merge rule (left,right) ->
    left||right, greedy left-to-right over non-overlapping
    occurrences — a single codegen fold, no UDF. "aaa" under (a,a)
    becomes [aa, a]: after a merge the new symbol does not re-pair
    with the rule inside the same pass, matching the reference
    implementation's scan."""
    merged = left + right
    init = F.array().cast("array<string>")

    def step(acc, x):
        can = (F.size(acc) > 0) \
            & (F.element_at(acc, -1) == F.lit(left)) \
            & (x == F.lit(right))
        return (F.when(can,
                       F.concat(F.slice(acc, 1, F.size(acc) - 1),
                                F.array(F.lit(merged))))
                 .otherwise(F.concat(acc, F.array(x))))

    return F.aggregate(syms, init, step)


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(l, r, freq) adjacent-pair frequencies over a (syms, cnt)
    vocabulary frame. One explode + one groupBy on the vocab — NOT
    the corpus."""
    return (vocab.select(F.explode(_adjacent_pairs(F.col("syms")))
                         .alias("p"), "cnt")
                 .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                 .agg(F.sum("cnt").alias("freq")))


def bpe_pair_counts(df: DataFrame, text_col: str,
                    top_n: int = 20) -> DataFrame:
    """Top adjacent CHARACTER pairs weighted by word frequency — BPE
    iteration zero, exposed as its own operator because it is the
    oracle-checkable core of the trainer (the full loop is iterative
    and SQL-inexpressible; this step is one SQL query).

    Output: (l, r, freq) ordered by (freq desc, l, r) limit top_n."""
    wc = word_counts(df, text_col)
    vocab = wc.select(F.split(F.col("word"), "").alias("syms"), "cnt")
    return (pair_counts(vocab)
            .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(top_n))


def bpe_train(df: DataFrame, text_col: str, num_merges: int,
              min_freq: int = 2,
              pattern: str | None = None) -> list[tuple]:
    """Learn `num_merges` BPE merge rules from the corpus.

    Returns [(rank, left, right, freq), ...] in learned order. Stops
    early when the best remaining pair's frequency drops below
    `min_freq` (merging a pair that occurs once creates a symbol
    used once — pure vocab pollution).

    Driver-side state is one 3-field row per iteration (the argmax),
    bounded like components()' convergence counter; the vocabulary
    frame itself never leaves the cluster."""
    vocab = (word_counts(df, text_col, pattern)
             .select(F.split(F.col("word"), "").alias("syms"), "cnt")
             .localCheckpoint())
    merges: list[tuple] = []
    for rank in range(num_merges):
        best = (pair_counts(vocab)
                .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not best or best[0]["freq"] < min_freq:
            break
        l, r, freq = best[0]["l"], best[0]["r"], int(best[0]["freq"])
        merges.append((rank, l, r, freq))
        # localCheckpoint per round: the fold plan would otherwise
        # nest one level per merge and re-run every prior rewrite on
        # each iteration's pair count.
        vocab = vocab.select(
            _merge_fold(F.col("syms"), l, r).alias("syms"),
            "cnt").localCheckpoint()
    return merges


def merges_df(spark, merges: list[tuple]) -> DataFrame:
    """The learned rules as a DataFrame (rank, left, right, freq) —
    the persistable artifact a tokenizer-apply job broadcasts."""
    from pyspark.sql.types import (StructType, StructField, IntegerType,
                                   StringType, LongType)
    schema = StructType([StructField("rank", IntegerType()),
                         StructField("left", StringType()),
                         StructField("right", StringType()),
                         StructField("freq", LongType())])
    return spark.createDataFrame(
        [(int(a), b, c, int(d)) for a, b, c, d in merges], schema)


def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               merges: list[tuple],
               pattern: str | None = None,
               pieces_col: str = "pieces") -> DataFrame:
    """Apply learned merges to every document: each word becomes its
    BPE symbol sequence, rules applied in learned order (rank order
    is the priority order — the classic apply).

    Output: (id_col, pieces array<string>, n_pieces). Zero shuffle:
    the whole encode is nested fold expressions evaluated map-side;
    num_merges fold passes per word, each a codegen loop. For large
    rule sets (32k merges) this chaining would blow the expression
    tree — that regime wants the rules broadcast into a Pandas UDF
    instead; at the tens-of-merges scale this stays JVM-side."""
    words = F.filter(tokens(F.col(text_col), pattern),
                     lambda w: w != "")
    syms = F.transform(words, lambda w: F.split(w, ""))
    def _apply_rule(left: str, right: str):
        # closure factory, not lambda default-args: PySpark counts a
        # lambda's parameters (defaults included) to pick the HOF
        # arity, so `lambda s, _l=left: ...` binds as a 3-arg lambda.
        return lambda s: _merge_fold(s, left, right)

    for _, l, r, _f in sorted(merges):
        syms = F.transform(syms, _apply_rule(l, r))
    pieces = F.flatten(syms)
    return df.select(F.col(id_col), pieces.alias(pieces_col)) \
             .withColumn("n_pieces", F.size(F.col(pieces_col)))
