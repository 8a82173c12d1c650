"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent per partitioning and not reproducible
across engines or cluster layouts. These operators decide membership
from a HASH OF THE KEY instead, which buys three properties worth
more than true randomness at 100 TB:

- reproducible: the same key samples identically on every run, every
  cluster size, and every engine (md5 is bit-identical everywhere —
  the correctness oracle compares byte-for-byte);
- consistent across tables: sampling users at 1% and filtering their
  events by the same predicate keeps users and events aligned with
  no join (the "sample the entity, keep all its rows" pipeline need);
- pushdown-friendly: the predicate is pure column math, so it runs
  inside the scan's codegen stage — no shuffle, no UDF.

Mechanics: the first 4 hex chars of md5(key) are uniform over
[0, 65536); a fraction f keeps keys whose prefix < f·65536. The
granularity (1/65536 ≈ 0.0015%) is finer than any practical rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column) -> Column:
    """Uniform value in [0, 65536) from the md5 hex prefix — JVM-side
    conv() parse of 4 hex chars."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10) \
        .cast("long")


def sample_predicate(key: Column, fraction: float) -> Column:
    """Boolean column: key is in the deterministic `fraction` sample.
    Compose it into any query — including on a DIFFERENT table that
    shares the key — to get consistent entity-level sampling."""
    return _bucket(key) < int(round(fraction * 65536))


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~`fraction` of rows, decided per key (all rows of a kept
    key survive). Plan: scan + codegen'd filter; zero shuffles."""
    return df.where(sample_predicate(F.col(key_col), fraction))


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      fractions: dict, default: float = 0.0) -> DataFrame:
    """Per-stratum rates (e.g. keep 100% of rare 'error' events, 1%
    of 'view') — the class-rebalancing primitive. `fractions` maps
    stratum value -> fraction; unlisted strata get `default`."""
    b = _bucket(F.col(key_col))
    thresh = F.lit(int(round(default * 65536)))
    for value, frac in fractions.items():
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(int(round(frac * 65536)))).otherwise(thresh)
    return df.where(b < thresh)


def resample_to_mixture(df: DataFrame, strata_col: str, key_col: str,
                        weights: dict,
                        counts: dict | None = None) -> DataFrame:
    """Downsample strata so the OUTPUT follows the target mixture
    `weights` (the domain/language-mixture rebalancing step of a
    training-data pipeline: e.g. {'web': 0.6, 'code': 0.3,
    'papers': 0.1}).

    The achievable total is maximized without upsampling: with
    stratum counts n_g and weights w_g, T = min_g(n_g / w_g) rows
    are kept in expectation, stratum g at rate w_g·T/n_g (the
    argmin stratum keeps 100%). Membership is the deterministic
    md5-prefix predicate, so the same keys survive on every engine
    and run; strata not in `weights` are dropped. One count
    aggregate plans the rates; the sample itself is a codegen
    filter, zero shuffles. Thresholds floor (not round) so a SQL
    oracle reproduces them exactly. `counts` injects precomputed
    stratum counts so composed callers (temperature_mixture) plan
    rates from ONE aggregate."""
    if counts is None:
        counts = {r[strata_col]: r["n"] for r in
                  df.groupBy(strata_col)
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
    present = {g: w for g, w in weights.items() if counts.get(g)}
    if not present:
        return df.where(F.lit(False))
    t = min(counts[g] / w for g, w in present.items())
    b = _bucket(F.col(key_col))
    thresh = F.lit(0)
    for g, w in present.items():
        thresh = F.when(F.col(strata_col) == g,
                        F.lit(int(w * t / counts[g] * 65536))) \
                  .otherwise(thresh)
    return df.where(b < thresh)


def temperature_mixture(df: DataFrame, strata_col: str, key_col: str,
                        alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled mixture resampling (the multilingual /
    multi-domain α-sampling of mT5/XLM-R): target stratum weight
    ∝ share^α, flattening head domains and boosting the tail as α
    drops from 1 (keep the natural mixture) toward 0 (uniform).
    Composes the observed shares with resample_to_mixture's
    deterministic hash-membership downsampling.

    Weights stay UNNORMALIZED (share^α directly): the kept-rate
    w·T/n is scale-invariant in w, and skipping the normalizing sum
    removes the one summation whose double result would depend on
    stratum enumeration order — what keeps the α=0.5 oracle
    bit-exact (sqrt is IEEE-correctly-rounded on every engine;
    general α is pow-based and pytest-covered instead). At α=1 the
    kept-rate is 1 for every stratum up to float round-trip (the
    16-bit threshold floors, so at most ~1/65536 of rows shave off).

    One stratum-count aggregate total; the sample is a codegen
    filter, zero shuffle — the 100 TB shape."""
    import math

    counts = {r[strata_col]: r["n"] for r in
              df.groupBy(strata_col)
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    if not counts:
        return df.where(F.lit(False))
    total = sum(counts.values())
    if alpha == 0.5:
        weights = {g: math.sqrt(n / total) for g, n in counts.items()}
    else:
        weights = {g: (n / total) ** alpha for g, n in counts.items()}
    return resample_to_mixture(df, strata_col, key_col, weights,
                               counts=counts)


def reservoir_sample(df: DataFrame, n: int, key_col: str) -> DataFrame:
    """Exactly-n uniform sample: order by the key hash, take n —
    compiles to TakeOrderedAndProject (per-partition top-n + driver
    merge of n·partitions rows), not a full sort. Deterministic for
    a fixed key population; adding/removing keys perturbs membership
    only near the cut line."""
    h = F.md5(F.col(key_col).cast("string"))
    return (df.orderBy(h.asc(), F.col(key_col).asc()).limit(n))


def assign_splits(df: DataFrame, key_col: str,
                  weights: dict | None = None,
                  split_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: the key's hash bucket
    falls into contiguous ranges sized by `weights` (default
    90/5/5). Same key -> same split, forever, on any engine — the
    property that keeps a held-out set held out across pipeline
    re-runs and prevents entity-level leakage between splits (all of
    a user's rows land in one split). Pure column math; composes
    with partitionBy(split_col) at write time so downstream readers
    scan only their split."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    b = _bucket(F.col(key_col))
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        hi = int(round(acc * 65536))
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None \
            else expr.when(cond, name)
    return df.withColumn(split_col, expr.otherwise(list(weights)[-1]))


def pack_by_budget(df: DataFrame, id_col: str, size_col: str,
                   budget: int, partitions: int | None = None) -> DataFrame:
    """Greedy first-fit packing of items into batches of total
    `size_col` <= budget (the sequence-packing step that turns
    documents into training batches without padding waste).

    Distributed design: items hash into `partitions` independent
    packing groups (defaults to cluster parallelism); within a group
    an Arrow-batched first-fit-decreasing pass assigns batch ids —
    the classic 11/9·OPT+1 bound applies per group, and groups pack
    in parallel with no cross-talk. Output: (id, batch) where batch
    is globally unique (group * 2^40 + local index). Deterministic:
    grouping is a hash, within-group order is (size desc, id).

    Items larger than `budget` get a singleton batch (truncation is
    the caller's policy, not the packer's)."""
    import pandas as pd

    sess = df.sparkSession
    nparts = partitions or sess.sparkContext.defaultParallelism

    base = df.select(F.col(id_col).alias("id"),
                     F.col(size_col).cast("long").alias("sz"),
                     F.pmod(F.xxhash64(F.col(id_col)), F.lit(nparts))
                      .alias("grp"))

    def pack(key, pdf):
        grp = int(key[0])
        pdf = pdf.sort_values(["sz", "id"],
                              ascending=[False, True], kind="mergesort")
        batches = []      # per-batch remaining budget
        assign = []
        for sz in pdf.sz:
            placed = None
            for bi, rem in enumerate(batches):
                if sz <= rem:
                    placed = bi
                    batches[bi] -= sz
                    break
            if placed is None:
                batches.append(max(0, budget - sz))
                placed = len(batches) - 1
            assign.append((grp << 40) + placed)
        return pd.DataFrame({"id": pdf.id, "batch": assign})

    return (base.groupBy("grp")
                .applyInPandas(pack, schema="id long, batch long"))


def materialize_batches(df: DataFrame, packed: DataFrame, id_col: str,
                        size_col: str, text_col: str,
                        sep: str = "\n\n") -> DataFrame:
    """Turn pack_by_budget assignments into actual training sequences:
    one row per batch with the member documents concatenated in the
    deterministic FFD placement order (size desc, id asc) — the final
    packing step that writes model-ready sequences without padding
    waste.

    Output: batch, text, n_docs, n_tokens. One join + one grouped
    sort-collect; a batch holds at most budget worth of tokens, so the
    per-group array is bounded by construction."""
    rows = packed.join(
        df.select(F.col(id_col).alias("id"),
                  F.col(size_col).cast("long").alias("__sz"),
                  F.col(text_col).alias("__txt")), "id")
    entries = F.array_sort(F.collect_list(F.struct(
        (-F.col("__sz")).alias("nsz"), F.col("id").alias("id"),
        F.col("__txt").alias("txt"))))
    return (rows.groupBy("batch")
                .agg(F.array_join(
                        F.transform(entries, lambda e: e["txt"]), sep)
                     .alias("text"),
                     F.count(F.lit(1)).alias("n_docs"),
                     F.sum("__sz").alias("n_tokens")))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    max_words: int = 100, overlap: int = 0) -> DataFrame:
    """Split long documents into sliding token-window chunks — the
    standard long-context preprocessing step between cleaning and
    sequence packing: chunk i covers words [i·stride, i·stride +
    max_words) with stride = max_words − overlap, and the last chunk
    starts at the final stride boundary that still contains unseen
    words, so every word lands in ≥1 chunk and consecutive chunks
    share exactly `overlap` words (short final chunks are kept, not
    padded or merged).

    Output: (id_col, chunk_id, chunk_text, n_words) — one row per
    chunk, chunk_id dense from 0 in document order. A document with
    ≤ max_words words passes through as its own single chunk;
    NULL-text rows have no words and emit no chunks (left-join back
    on id_col to carry them).

    Scale: pure array expressions (split / sequence / slice) followed
    by ONE posexplode — no shuffle at all; chunking then feeds
    pack_by_budget for padding-free batches. Row width stays bounded
    by max_words, so downstream shuffles never carry full documents."""
    if max_words < 1 or overlap < 0 or overlap >= max_words:
        raise ValueError("need max_words >= 1 and 0 <= overlap < "
                         "max_words")
    stride = max_words - overlap
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    # number of chunks = 1 + ceil(max(n - max_words, 0) / stride),
    # in exact integer arithmetic (ceil via (x + stride-1) div stride)
    extra = F.greatest(n - F.lit(max_words), F.lit(0))
    n_chunks = F.lit(1) + ((extra + F.lit(stride - 1))
                           - F.pmod(extra + F.lit(stride - 1),
                                    F.lit(stride))) / F.lit(stride)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - F.lit(1)),
        lambda i: F.slice(words, i * stride + 1, max_words))
    ex = df.select(F.col(id_col),
                   F.posexplode(chunks).alias("chunk_id", "__w"))
    return ex.select(id_col, "chunk_id",
                     F.concat_ws(" ", F.col("__w")).alias("chunk_text"),
                     F.size("__w").alias("n_words"))


def cap_per_group(df: DataFrame, group_cols: list[str], n: int,
                  order_col: str, id_col: str,
                  asc: bool = False) -> DataFrame:
    """At most `n` rows per group — the anti-spam / per-domain cap
    (e.g. "keep the 1000 best-quality documents per url domain").
    Deterministic keeper order: `order_col` (desc by default — best
    first), ties → lowest id. One window shuffle on the group key."""
    from pyspark.sql import Window
    o = F.asc(order_col) if asc else F.desc(order_col)
    w = Window.partitionBy(*group_cols).orderBy(o, F.asc(id_col))
    return (df.withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") <= n).drop("__rk"))


def take_until_budget(df: DataFrame, size_col: str, budget: int,
                      score_col: str, id_col: str,
                      buckets: int = 1000) -> DataFrame:
    """Greedy budget-constrained selection: walk documents best-first
    (score desc, ties → id asc) and keep each one while the running
    `size_col` total stays ≤ `budget` — "take the highest-quality
    docs until N tokens", the data-constrained-scaling recipe.

    Equivalent to a global `sum(size) over (order by score desc, id)
    ≤ budget`, but WITHOUT the single-task global window: scores are
    range-bucketed (driver sees only the per-bucket size sums —
    `buckets` rows, bounded); every bucket strictly better than the
    one where the cumulative total crosses the budget is taken
    whole, and only the boundary bucket — ~1/buckets of the data —
    runs an exact cumulative window. Selection depends only on the
    (score, id) ORDER, so the internal bucket edges never affect the
    result, and equal scores always share a bucket. The input must
    be DETERMINISTIC across jobs (the bucket histogram and the final
    filters run as separate jobs — persist/localCheckpoint an
    expensive or sampled upstream first, or the recomputed buckets
    can disagree with the collected sums). NULL and NaN
    scores rank last (dropped unless the budget survives everything
    else — mirror `nulls last` in any SQL comparison; NaN would
    otherwise poison the max() range probe AND sort FIRST under
    Spark's desc, so it is normalized to null up front)."""
    from pyspark.sql import Window

    sc = F.col(score_col).cast("double")
    norm = F.when(sc.isNull() | F.isnan(sc), F.lit(None).cast("double")) \
            .otherwise(sc)
    mm = df.agg(F.min(norm).alias("lo"),
                F.max(norm).alias("hi")).collect()[0]
    lo, hi = mm["lo"], mm["hi"]
    if lo is None:  # all-null/NaN scores: plain ordered prefix by id
        hi = lo = 0
    width = (float(hi) - float(lo)) / buckets if hi != lo else 1.0
    # bucket 0 = best scores; equal scores can never split buckets
    b = F.when(norm.isNull(), F.lit(buckets)).otherwise(
        F.least(F.floor((F.lit(float(hi)) - norm) / F.lit(width))
                 .cast("int"),
                F.lit(buckets - 1)))
    bdf = df.withColumn("__b", b)
    per = {r["__b"]: r["s"]
           for r in bdf.groupBy("__b")
                       .agg(F.sum(F.col(size_col).cast("long")).alias("s"))
                       .collect()}
    cum = 0
    boundary, before = None, 0
    for i in sorted(per):
        if cum + per[i] > budget:
            boundary, before = i, cum
            break
        cum += per[i]
    if boundary is None:  # whole corpus fits
        return df
    whole = bdf.where(F.col("__b") < boundary).drop("__b")
    w = (Window.orderBy(F.desc_nulls_last("__sc"), F.asc(id_col))
               .rowsBetween(Window.unboundedPreceding, 0))
    edge = (bdf.where(F.col("__b") == boundary)
               .withColumn("__sc", norm)
               .withColumn("__cum", F.sum(F.col(size_col).cast("long"))
                           .over(w))
               .where(F.col("__cum") <= budget - before)
               .drop("__b", "__sc", "__cum"))
    return whole.unionByName(edge)


def sample_per_group(df: DataFrame, group_cols: list[str], n: int,
                     key_col: str) -> DataFrame:
    """Deterministic fixed-n sample per group (balanced eval sets,
    per-class spot-check pools): rank rows within each group by the
    md5 of their key — a stable pseudo-random order any SQL engine
    reproduces (`md5(cast(key as varchar))`, the same portable-order
    trick as Query.distinct_values(deterministic=True)) — and keep
    the first n (md5 ties → key asc). Groups smaller than n pass
    through whole. One window shuffle on the group key."""
    from pyspark.sql import Window
    h = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h, F.asc(key_col))
    return (df.withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") <= n).drop("__rk"))


def weighted_sample(df: DataFrame, key_col: str,
                    p_col: str) -> DataFrame:
    """Deterministic per-row Bernoulli sampling with a ROW-VARYING
    keep probability: keep a row iff its key's md5 bucket falls
    under `p_col` x 65536 — the quality-weighted downsampling step
    between scoring and mixing (e.g. keep the CCNet head outright,
    keep the middle with p=0.5, the tail with p=0.1 — pass a CASE
    expression or a score-mapped column as `p_col`). Same
    portable-hash contract as hash_sample/assign_splits: same key +
    same probability -> same decision, forever, on any engine; pure
    column math, zero shuffles. NULL probabilities drop the row
    (explicitly unscored != certainly kept); p is clamped to
    [0, 1]."""
    p = F.least(F.greatest(F.col(p_col).cast("double"), F.lit(0.0)),
                F.lit(1.0))
    thresh = F.round(p * F.lit(65536.0)).cast("long")
    return df.where(_bucket(F.col(key_col)) < thresh)
