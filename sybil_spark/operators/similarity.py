"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — a single narrow projection +
TakeOrderedAndProject, which is exact and embarrassingly parallel
(no shuffle of vectors; each partition computes local top-k and only
k rows per partition reach the driver-side merge).

Scale path: random-hyperplane LSH bucketing — signatures are pure
column math from deterministic per-plane pseudo-vectors, so buckets
reproduce across runs; queries probe only their own bucket (and
optionally neighbors by Hamming-1 multiprobe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sybil_spark.functions.vectors import cosine_to_const, dot, norm_sq


def brute_force_topk(df: DataFrame, vec_col: str, query: list[float],
                     k: int = 10, id_col: str = "vec_id",
                     sim_col: str = "cos") -> DataFrame:
    """Exact top-k by cosine against one query vector.

    Plan shape: scan → project(cosine) → TakeOrderedAndProject(k).
    No shuffle, no UDF; scales linearly in rows and executors."""
    sim = cosine_to_const(F.col(vec_col), query).alias(sim_col)
    return (df.select(F.col(id_col), sim)
              .orderBy(F.desc(sim_col), F.col(id_col).asc())
              .limit(k))


def _plane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j of plane p
    is derived from a splitmix-style integer mix of (p, j), mapped to
    [-1, 1). Stable across runs/machines; no RNG state involved."""
    out = []
    for j in range(dim):
        z = (plane_idx * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        z ^= z >> 31
        z = (z * 0x94D049BB133111EB) & ((1 << 64) - 1)
        z ^= z >> 29
        out.append((z / float(1 << 63)) - 1.0)
    return out


def random_hyperplane_bucket(vec_col: Column, dim: int,
                             num_planes: int = 8) -> Column:
    """LSH bucket id in [0, 2^num_planes): bit p = sign(vec · plane_p).

    All dot products are JVM fold expressions over literal plane
    arrays — one pass per plane, no Python."""
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.lit(_plane(dim, p)).cast("array<double>")
        bit = F.when(dot(vec_col, plane) > 0,
                     F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(df: DataFrame, vec_col: str, query: list[float], k: int = 10,
             id_col: str = "vec_id", num_planes: int = 8,
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket.

    At 100 TB the table is written bucketed/partitioned by this bucket
    id, so the probe prunes ~(1 - 2^-planes) of the data before any
    cosine is computed (partition pruning on a literal predicate)."""
    dim = dim or len(query)
    qb = 0
    for p in range(num_planes):
        plane = _plane(dim, p)
        if sum(float(a) * b for a, b in zip(query, plane)) > 0:
            qb |= 1 << p
    bucketed = df.withColumn(
        "__bucket", random_hyperplane_bucket(F.col(vec_col), dim, num_planes))
    return brute_force_topk(bucketed.where(F.col("__bucket") == qb),
                            vec_col, query, k, id_col)


def pairwise_topk(df: DataFrame, vec_col: str, id_col: str = "vec_id",
                  k: int = 20) -> DataFrame:
    """Global top-k most-similar pairs (id_a < id_b) by cosine.

    Exact all-pairs — meant for validation / small dims; the scale
    variant blocks by `random_hyperplane_bucket` first (see
    dedup.embedding_dup_pairs(block_on=...))."""
    from sybil_spark.functions.vectors import cosine
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    a, b = base.alias("a"), base.alias("b")
    return (a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     cosine(F.col("a.vec"), F.col("b.vec")).alias("cos"))
             .orderBy(F.desc("cos"), F.col("id_a").asc(), F.col("id_b").asc())
             .limit(k))
