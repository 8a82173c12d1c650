"""Corpus auditing — dataset-versioning and pipeline-health checks.

The reference audits tables with `sybil inspect`/`info` (storage
metadata); a training-data pipeline additionally needs CONTENT
audits between corpus versions: what changed between crawl v1 and
v2, did the quality filter drop what we expected, is a rebuild
byte-identical. These are join-shaped queries over fingerprints —
pure DataFrame ops, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str,
                text_col: str) -> DataFrame:
    """Per-document diff between two corpus versions: one row per id
    present in either, with status 'added' (only in new), 'removed'
    (only in old), 'changed' (both, different text — compared by
    xxhash64, 8 bytes per side instead of shipping both texts
    through the join), or 'unchanged'.

    The dataset-versioning audit: feed two snapshot reads and
    aggregate on status for the change summary, or filter
    status != 'unchanged' for the review queue. Scale: both sides
    project to (id, hash) before the ONE full-outer equi-join on the
    id — text never enters the shuffle; 64-bit hash collisions can
    only mislabel a changed doc as unchanged at P ≈ 2⁻⁶⁴ per
    changed doc (re-verify 'unchanged' rows against the raw text
    where that matters — they co-locate by id for a cheap follow-up
    join)."""
    o = old.select(F.col(id_col).alias("__id"),
                   F.xxhash64(text_col).alias("__ho"))
    n = new.select(F.col(id_col).alias("__id"),
                   F.xxhash64(text_col).alias("__hn"))
    status = (F.when(F.col("__ho").isNull(), F.lit("added"))
               .when(F.col("__hn").isNull(), F.lit("removed"))
               .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
               .otherwise(F.lit("changed")))
    return (o.join(n, "__id", "full_outer")
             .select(F.col("__id").alias(id_col),
                     status.alias("status")))


def corpus_diff_summary(old: DataFrame, new: DataFrame, id_col: str,
                        text_col: str) -> DataFrame:
    """(status, n) counts of corpus_diff — the one-look change
    report between two corpus versions."""
    return (corpus_diff(old, new, id_col, text_col)
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")))
