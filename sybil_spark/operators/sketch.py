"""Heavy hitters at corpus scale: provably-EXACT top-k by count via a
two-pass Misra–Gries sketch.

The wimbd-style corpus question ("what are the most common n-grams in
this 100 TB corpus?") is a groupBy away — but a plain
groupBy(ngram).count() shuffles EVERY DISTINCT n-gram (at 100 TB,
billions of keys, almost all singletons that can never reach a
top-20). The classical fix (Misra & Gries 1982; mergeable-summaries
form: Agarwal et al., PODS 2012) spends one map-only pass to prove
which items COULD be frequent, then counts only those exactly:

pass 1 (map-only, zero shuffle of the long tail): each partition
  streams its items through an m-counter Misra–Gries summary —
  Arrow-batched value_counts merged into the summary dict, overflow
  handled by the mergeable-summaries rule (subtract the (m+1)-th
  largest counter from all, drop non-positives, accumulate the
  subtracted total D). Invariants (the MG guarantee):
      S[x] <= true_p(x) <= S[x] + D_p        for every item x,
      true_p(x) <= D_p                       for x absent from S.
  Only the <= m+1 summary rows per partition leave the executor.

pass 2 (bounded shuffle): the candidate union (<= partitions x m
  narrow rows) semi-joins the item stream — the long tail dies at
  the scan — and the survivors aggregate to EXACT global counts with
  ordinary map-side partials.

decision (driver, k+1 bounded rows): any item missed by every
  summary has global count <= E = sum_p D_p. If the k-th exact
  candidate count is STRICTLY greater than E, the candidate top-k is
  provably the global top-k — return it. Otherwise fall back to the
  plain exact groupBy (correct at any m; the sketch is an
  opportunistic scale path, never a silent approximation — the
  result is EXACT either way, which is what makes `top_ngrams`
  oracle-checkable against a full-count SQL mirror).

Sizing: E ~ N / (m+1) summed over partitions, so m trades summary
memory (m dict entries per task) against how skewed the distribution
must be for the proof to close. Zipfian corpora close it easily at
m = a few thousand; adversarially-flat data falls back — loudly
(`mode="sketch"` raises instead, for tests and for operators that
must not rescan)."""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves mapInPandas type hints

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_summaries(items: DataFrame, m: int) -> DataFrame:
    """Pass 1: per-partition Misra–Gries summaries. Input: a
    single-column ('item') frame. Output rows per partition: one
    (item, est, 0) per surviving counter plus ONE (null, 0, D)
    deduction row. est never overcounts; D bounds every undercount
    and every absent item's local count."""
    mm = int(m)

    def gen(batches):
        S: dict = {}
        D = 0
        for pdf in batches:
            vc = pdf["item"].value_counts(dropna=True)
            for it, c in vc.items():
                S[it] = S.get(it, 0) + int(c)
            if len(S) > mm:
                vals = sorted(S.values(), reverse=True)
                d = vals[mm]          # (m+1)-th largest
                D += d
                S = {it: v - d for it, v in S.items() if v > d}
        yield pd.DataFrame(
            {"item": list(S.keys()) + [None],
             "est": list(S.values()) + [0],
             "dsum": [0] * len(S) + [D]})

    # item keeps its NATIVE type through the sketch (r9 ADVICE: a
    # hardcoded string schema made non-string items TypeError in
    # mode='auto' or diverge in schema from the exact path)
    item_t = items.schema["item"].dataType.simpleString()
    return items.mapInPandas(gen, f"item {item_t}, est long, dsum long")


def heavy_hitters(df: DataFrame, item: Column | str, k: int = 20,
                  m: int = 4096, mode: str = "auto") -> DataFrame:
    """EXACT top-k (item, cnt) by count of `item` (a column name or
    expression; nulls ignored), ordered (cnt desc, item asc).

    mode="auto" (default): try the two-pass sketch, fall back to the
    plain exact groupBy when the proof does not close (flat
    distributions / tiny m) — exact either way. mode="exact" skips
    the sketch; mode="sketch" raises RuntimeError instead of falling
    back (callers that must not rescan).

    Driver-side state is bounded: the E aggregate (1 row) and the
    candidate top-(k+1) — never the candidate set itself, which
    stays a cluster-side frame for the pass-2 join."""
    if mode not in ("auto", "exact", "sketch"):
        raise ValueError(f"heavy_hitters: unknown mode {mode!r}")
    col = F.col(item) if isinstance(item, str) else item
    items = df.select(col.alias("item")).where(F.col("item").isNotNull())
    exact_all = (items.groupBy("item")
                      .agg(F.count(F.lit(1)).alias("cnt"))
                      .orderBy(F.desc("cnt"), F.asc("item"))
                      .limit(int(k)))
    if mode == "exact":
        return exact_all
    summ = _mg_summaries(items, m).localCheckpoint()
    try:
        agg = summ.agg(
            F.sum("dsum").alias("e"),
            F.count(F.when(F.col("item").isNotNull(), 1)).alias("nc")
        ).collect()[0]
        E, n_cand = agg["e"] or 0, int(agg["nc"] or 0)
        cand = summ.where(F.col("item").isNotNull()) \
                   .select("item").distinct()
        # candidate cardinality is bounded by partitions x m — small
        # on any one host, but at cluster scale (1e5 partitions x 4k
        # counters) it can exceed the broadcast budget: hint only
        # under a hard row cap, otherwise let AQE pick the join (the
        # blocklist_hits lesson — never an unbounded broadcast hint)
        if n_cand <= 2_000_000:
            cand = F.broadcast(cand)
        exact_cand = (items.join(cand, "item", "left_semi")
                           .groupBy("item")
                           .agg(F.count(F.lit(1)).alias("cnt"))
                           .orderBy(F.desc("cnt"), F.asc("item")))
        top = exact_cand.limit(int(k)).collect()
        kth = top[-1]["cnt"] if len(top) >= int(k) else None
        proved = kth is not None and int(kth) > int(E)
        if not proved and int(E) == 0 and kth is None:
            proved = True   # fewer than k distinct items exist at all
        if proved:
            spark = df.sparkSession
            item_t = items.schema["item"].dataType.simpleString()
            return spark.createDataFrame(
                [(r["item"], int(r["cnt"])) for r in top],
                f"item {item_t}, cnt long")
        if mode == "sketch":
            raise RuntimeError(
                f"heavy_hitters: sketch proof failed (k-th exact "
                f"candidate count {kth} <= missed-item bound {E}); "
                f"raise m or use mode='auto'")
        return exact_all
    finally:
        summ.unpersist()


def top_ngrams(df: DataFrame, text_col: str, n: int = 3, k: int = 20,
               m: int = 4096, mode: str = "auto") -> DataFrame:
    """Top-k word n-grams by corpus count — the wimbd-style corpus
    inspection query, EXACT at any scale via heavy_hitters. Output
    (gram, cnt) ordered (cnt desc, gram asc). N-gram extraction is
    the codegen `text.ngrams` (docs shorter than n words contribute
    their whole text once — the package's slice-truncation
    convention), exploded map-side into the sketch pass; the long
    tail of singleton n-grams never shuffles."""
    from sybil_spark.functions.text import ngrams

    g = F.explode(ngrams(F.col(text_col), n)).alias("g")
    out = heavy_hitters(df.select(g), "g", k=k, m=m, mode=mode)
    return out.select(F.col("item").alias("gram"), "cnt")
