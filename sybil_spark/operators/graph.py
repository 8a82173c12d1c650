"""Link-graph centrality for corpus curation: distributed PageRank
with cross-engine-exact arithmetic.

Large-scale training-data pipelines weight documents by the authority
of their source domain — CommonCrawl publishes harmonic centrality
and PageRank rankings for exactly this purpose, and OpenWebText-style
corpora filter on link-derived quality. The computation is the
classic iterative Spark workload: per iteration one join of scores
onto edges (shuffle on src) and one aggregation of contributions
(shuffle on dst) over the edge frame; the node frame never leaves the
cluster and lineage is truncated per iteration (localCheckpoint — the
components()/bpe_train loop discipline).

Exactness (what makes `pagerank` oracle-checkable in SQL): floating
sums over a shuffled frame are order-dependent, so each edge's
contribution score(src)/outdeg(src) is QUANTIZED to decimal(38,12)
before the sum — sums of decimals are exact and order-free (the
package's per-token-logprob contract) — and the per-node update
    score' = (1-d)/N + d * sum(contribs)
re-quantizes to decimal(38,12), with every decimal→double conversion
rendered through varchar (DuckDB's direct cast can be off by one ulp
at full precision; the render is correctly rounded on both engines).
Scores therefore match BIT-FOR-BIT between this implementation and an
unrolled-CTE SQL mirror at any iteration count.

Semantics: the damped random walk without dangling-mass
redistribution (nodes with no out-edges absorb their mass — the
common simplified form; totals then sum below 1, which is fine for
RANKING, the curation use). Self-loops and duplicate edges are
allowed and counted as written."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D12 = "decimal(38,12)"


def _d2d(col):
    """decimal -> double via the varchar render (correctly rounded
    in both engines — the _dsum discipline)."""
    return col.cast("string").cast("double")


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             iters: int = 3, damping: float = 0.85,
             seeds: list | None = None) -> DataFrame:
    """(node, score): damped PageRank over a directed edge frame
    after `iters` synchronous iterations from the uniform start
    1/N. Returns every node (sources and sinks), score as double
    (the quantized decimal rendered via varchar). Deterministic and
    SQL-replicable per the module contract.

    `seeds` switches to PERSONALIZED PageRank (random walk with
    restart): the restart mass (1-d) concentrates uniformly on the
    seed nodes instead of spreading over all N, and the walk starts
    from the seed distribution — proximity-to-the-seeds ranking,
    the crawl-prioritization / related-domain-discovery form
    (seeded from known-good domains). Seeds must name existing
    nodes (raises otherwise: a silently-absent seed would quietly
    re-weight the restart).

    Driver-side state is ONE bounded collect (the node count N,
    plus a |seeds|-bounded membership check); everything else is
    joins/aggregations on the cluster."""
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    d = float(damping)
    e = edges.select(F.col(src_col).cast("string").alias("s"),
                     F.col(dst_col).cast("string").alias("t"))
    nodes = (e.select(F.col("s").alias("n"))
              .unionByName(e.select(F.col("t").alias("n")))
              .distinct().localCheckpoint())
    try:
        n_nodes = nodes.count()            # the one bounded collect
        deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
        if seeds is not None:
            sd = sorted({str(x) for x in seeds})
            if not sd:
                raise ValueError("pagerank: empty seeds")
            present = nodes.where(F.col("n").isin(sd)).count()
            if present != len(sd):
                raise ValueError(
                    f"pagerank: {len(sd) - present} seed(s) not in "
                    f"the graph")
            r = F.when(F.col("n").isin(sd),
                       F.lit(1.0 / float(len(sd)))) \
                 .otherwise(F.lit(0.0))
            base = (F.lit(1.0 - d) * r).cast("double")
            score = nodes.select("n", r.cast(_D12).alias("p"))
        else:
            base = F.lit((1.0 - d) / float(n_nodes)).cast("double")
            score = nodes.select(
                "n", F.lit(1.0 / float(n_nodes)).cast(_D12).alias("p"))
        prev = None
        for _ in range(int(iters)):
            contrib = (e.join(score.withColumnRenamed("n", "s"), "s")
                        .join(deg, "s")
                        .select(F.col("t").alias("n"),
                                (_d2d(F.col("p"))
                                 / F.col("c").cast("double"))
                                .cast(_D12).alias("w")))
            agg = contrib.groupBy("n").agg(F.sum("w").alias("m"))
            nxt = (nodes.join(agg, "n", "left")
                        .select("n",
                                (base + F.lit(d)
                                 * F.coalesce(_d2d(F.col("m")),
                                              F.lit(0.0)))
                                .cast(_D12).alias("p"))
                        .localCheckpoint())
            if prev is not None:
                prev.unpersist()
            prev, score = score, nxt
    finally:
        nodes.unpersist()
    return (score.select(F.col("n").alias("node"),
                         _d2d(F.col("p")).alias("score"))
                 .orderBy(F.desc("score"), F.asc("node")))


def pagerank_ref(edge_list: list, iters: int = 3,
                 damping: float = 0.85,
                 seeds: list | None = None) -> dict:
    """Pure-python reference with IDENTICAL arithmetic (decimal
    quantization included) — the fuzz twin of pagerank(), kept in
    the module so tests and docs share one definition of the
    contract."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000000000001")

    def d12(x: float) -> Decimal:
        # HALF_UP: the rounding Spark's double->decimal cast (and
        # DuckDB's) applies — python Decimal defaults to HALF_EVEN,
        # which diverges in the last quantized digit
        v = Decimal(repr(x)) if not isinstance(x, Decimal) else x
        return v.quantize(q, rounding=ROUND_HALF_UP)

    edges = [(str(a), str(b)) for a, b in edge_list]
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    deg: dict = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    d = float(damping)
    if seeds is not None:
        sd = sorted({str(x) for x in seeds})
        r = {v: (1.0 / len(sd) if v in sd else 0.0) for v in nodes}
        base = {v: (1.0 - d) * r[v] for v in nodes}
        p = {v: d12(r[v]) for v in nodes}
    else:
        base = {v: (1.0 - d) / n for v in nodes}
        p = {v: d12(1.0 / n) for v in nodes}
    for _ in range(iters):
        m: dict = {}
        for a, b in edges:
            w = d12(float(str(p[a])) / deg[a])
            m[b] = m.get(b, Decimal(0)) + w
        p = {v: d12(base[v] + d * float(str(m.get(v, Decimal(0)))))
             for v in nodes}
    return {v: float(str(s)) for v, s in p.items()}
