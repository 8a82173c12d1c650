"""Query builder — sybil's query surface compiled to one DataFrame plan.

The reference engine's entire query language is a flag pipeline
(reference: src/cmd/cmd_query.go:19-83):

    scan → filter (AND) → group-by → {count | avg | hist | percentile
    | count-distinct} [per time bucket] → sort → limit

This builder replicates that surface (and the Go client-API builder at
src/api/cmd_query.go:38-263, the only stable programmatic interface
sybil has) but compiles to a *declarative* DataFrame plan so Catalyst
performs column pruning, parquet predicate pushdown, partial/final hash
aggregation and whole-stage codegen — all things the reference
hand-rolls in its fused scan loop (src/lib/aggregate.go:56-282).

Semantics preserved from the reference:

- Filters are an AND conjunction (src/lib/aggregate.go:104-116); a
  missing (null) value never matches a filter, which is exactly SQL
  null comparison semantics, so plain Column predicates are correct.
- `count` is weight-summed when a weight column is set, while
  `samples` stays the raw row count (src/lib/aggregate.go:100-102,
  202-203); weighted avg is sum(v*w)/sum(w)
  (src/lib/hist_basic.go:111-118).
- Time rollup buckets the time column with `t - t % bucket`
  (src/lib/aggregate.go:174) and int filters on the time column are
  floored to the bucket boundary first (src/lib/filter.go:86-95).
- Default sort is weighted count descending (src/lib/aggregate.go:21),
  default limit 100 (src/lib/config.go:166-167).
- `-str-replace` regex rewrite applied before grouping
  (src/lib/table_query.go:34-51).
- The TOTAL row across all groups (src/lib/aggregate.go:414-459) is
  available via `.total_row()` as a grand-total union.

The lossy per-batch top-k prune (src/lib/aggregate.go:469-495) is NOT
the default here — Spark's TakeOrderedAndProject is exact within the
same memory envelope, so `prune_sort` is an alias of `sort`. The
faithful lossy behavior exists as an explicit OPT-IN for
ultra-high-cardinality heads: operators/prune.lossy_group_topk.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: sybil NUM_BUCKETS (reference: src/lib/hist.go:3)
NUM_BUCKETS = 1000

#: ungrouped EXACT weighted percentiles: at or below this many rows a
#: single-partition window is cheapest; above it _wp_frame switches
#: to the distributed two-pass CDF (range-partition by value,
#: per-partition prefix offsets, windowed partials) — same exact
#: answer, parallel sort, no single-executor envelope.
WP_UNGROUPED_MAX_ROWS = 2_000_000
#: GROUPED exact weighted percentiles: optimizer input-size estimate
#: (bytes, plan-stats read — no job) above which _wp_frame switches
#: from the per-group window (task parallelism = |groups|, serial for
#: few huge groups) to the distributed prefix-sum CDF
#: (_wp_grouped_distributed). Below it the single hash-partitioned
#: window is the cheapest plan. Threshold = the measured crossover
#: (SCALE_REHEARSAL_r11_wpAB.json, interleaved minima): the window
#: wins 1x sf0.1 (1.67 vs 3.58 s, ~6.7 MB estimate), the distributed
#: path wins 10x (7.88 vs 4.48 s, ~67 MB) and 30x (44.9 vs 20.1 s) —
#: the per-group sort grows superlinearly, the CDF stays parallel.
WP_GROUPED_DISTRIBUTED_MIN_BYTES = 64 << 20
#: sybil default result limit (reference: src/lib/config.go:166-167)
DEFAULT_LIMIT = 100

_INT_OPS = {"gt", "lt", "eq", "neq", "ge", "le"}
_STR_OPS = {"eq", "neq", "re", "nre"}
_SET_OPS = {"in", "nin"}
_AGG_OPS = {"count", "avg", "sum", "min", "max", "stddev", "hist",
            "percentile", "distinct"}


@dataclass
class _Agg:
    col: str
    op: str
    alias: str | None = None
    params: dict = field(default_factory=dict)


class Query:
    """Fluent builder; every method returns self."""

    def __init__(self, source: DataFrame | str):
        self._source = source
        self._filters: list[tuple[str, str, str, object]] = []
        self._str_replaces: list[tuple[str, str, str]] = []
        self._groups: list[str] = []
        self._set_groups: list[tuple[str, str]] = []
        self._aggs: list[_Agg] = []
        self._weight_col: str | None = None
        self._time_col: str | None = None
        self._time_bucket: int = 0
        self._sort: tuple[str, bool] | None = None  # (col, ascending)
        self._having: list[str] = []
        self._limit: int | None = DEFAULT_LIMIT
        self._total_row = False
        self._read_log_df: DataFrame | None = None
        self._exact = False

    # -- source -----------------------------------------------------------
    @classmethod
    def table(cls, source: DataFrame | str) -> "Query":
        return cls(source)

    def read_log(self, landing_df: DataFrame) -> "Query":
        """Union the un-digested ingest log into the scan
        (reference `-read-log`, src/cmd/cmd_query.go:66,155-157)."""
        self._read_log_df = landing_df
        return self

    # -- projection transforms -------------------------------------------
    def str_replace(self, col: str, pattern: str, replacement: str) -> "Query":
        self._str_replaces.append((col, pattern, replacement))
        return self

    # -- filters ----------------------------------------------------------
    def int_filter(self, col: str, op: str, value) -> "Query":
        if op not in _INT_OPS:
            raise ValueError(f"int filter op must be one of {_INT_OPS}, got {op!r}")
        self._filters.append(("int", op, col, value))
        return self

    def str_filter(self, col: str, op: str, value: str) -> "Query":
        if op not in _STR_OPS:
            raise ValueError(f"str filter op must be one of {_STR_OPS}, got {op!r}")
        self._filters.append(("str", op, col, value))
        return self

    def set_filter(self, col: str, op: str, value: str) -> "Query":
        if op not in _SET_OPS:
            raise ValueError(f"set filter op must be one of {_SET_OPS}, got {op!r}")
        self._filters.append(("set", op, col, value))
        return self

    # -- shape -------------------------------------------------------------
    def group_by(self, *cols: str) -> "Query":
        self._groups.extend(cols)
        return self

    def group_by_set(self, col: str, alias: str | None = None) -> "Query":
        """Group by the ELEMENTS of a set/array column (explode before
        grouping, after filters — so set filters still see the whole
        array). The reference rejects set group-by outright
        ("Grouping by Set columns is currently not supported",
        src/cmd/cmd_query.go:254-255); this is the documented
        extension (SURVEY.md §2.4 A2). A row contributes once per
        element."""
        self._set_groups.append((col, alias or col + "_elem"))
        return self

    def agg(self, col: str, op: str, alias: str | None = None, **params) -> "Query":
        if op not in _AGG_OPS:
            raise ValueError(f"agg op must be one of {_AGG_OPS}, got {op!r}")
        self._aggs.append(_Agg(col, op, alias, params))
        return self

    def distinct_cols(self, *cols: str, approx: bool = False, rsd: float = 0.05) -> "Query":
        """COUNT DISTINCT over a tuple of columns (reference `-distinct`,
        src/lib/query_spec.go:85-104). Exact by default (the correctness
        oracle); `approx=True` switches to the HLL sketch for scale,
        matching the reference's LogLogBeta behavior."""
        self._aggs.append(_Agg(",".join(cols), "distinct", None,
                               {"cols": list(cols), "approx": approx, "rsd": rsd}))
        return self

    def weight_col(self, col: str) -> "Query":
        self._weight_col = col
        return self

    def time_col(self, col: str, bucket: int) -> "Query":
        """Tumbling time-series rollup (reference `-time -time-bucket`,
        src/lib/aggregate.go:145-183)."""
        self._time_col = col
        self._time_bucket = int(bucket)
        return self

    def having(self, expr: str) -> "Query":
        """Post-aggregation filter (SQL HAVING) over RESULT columns —
        a boolean SQL expression referencing aliases the query
        produces (`count`, `avg_value`, group keys...). Extension
        beyond the reference (sybil filters rows only, pre-agg);
        applied before sort/limit like SQL, and evaluated on the
        aggregated frame, so at scale it filters |groups| rows, not
        input rows. Multiple calls AND together."""
        self._having.append(expr)
        return self

    def sort(self, col: str, asc: bool = False) -> "Query":
        self._sort = (col, asc)
        return self

    prune_sort = sort  # reference `-prune-sort` is lossy; ours is exact

    def limit(self, n: int | None) -> "Query":
        self._limit = n
        return self

    def total_row(self, enabled: bool = True) -> "Query":
        self._total_row = enabled
        return self

    def exact_mode(self, enabled: bool = True, scale: int = 6) -> "Query":
        """Deterministic float aggregation: sums/averages/stddev go
        through exact decimal(38,scale) accumulation and are cast back
        to double. Partial-aggregation order then cannot perturb low
        bits, so results are bit-identical across partitionings,
        cluster sizes, AND other engines (the DuckDB correctness
        oracle). Keep |sum|·10^scale < 2^53 — then the decimal→double
        cast is a single correctly-rounded operation in every engine
        (larger scaled sums expose engines whose int128→double
        conversion is two-step). Slightly slower than native double
        sums; off by default."""
        self._exact = enabled
        self._DEC = f"decimal(38,{scale})"
        return self

    # -- compile -----------------------------------------------------------
    def _load(self, spark: SparkSession) -> DataFrame:
        df = (spark.read.parquet(self._source)
              if isinstance(self._source, str) else self._source)
        if self._read_log_df is not None:
            df = df.unionByName(self._read_log_df, allowMissingColumns=True)
        return df

    def _predicate(self, df: DataFrame) -> Column | None:
        preds: list[Column] = []
        for kind, op, col, value in self._filters:
            c = F.col(col)
            if kind == "int":
                # Align filters on the time column to the bucket boundary
                # when rollup is active (reference src/lib/filter.go:86-95).
                if (self._time_bucket and col == self._time_col
                        and isinstance(value, (int, float))):
                    value = int(value) - int(value) % self._time_bucket
                preds.append({"gt": c > value, "lt": c < value,
                              "ge": c >= value, "le": c <= value,
                              "eq": c == value, "neq": c != value}[op])
            elif kind == "str":
                if op == "eq":
                    preds.append(c == value)
                elif op == "neq":
                    preds.append(c != value)
                elif op == "re":
                    preds.append(c.rlike(value))
                else:  # nre
                    preds.append(~c.rlike(value))
            else:  # set
                contains = F.array_contains(c, value)
                preds.append(contains if op == "in" else ~contains)
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out

    def _weight(self) -> Column:
        if self._weight_col:
            return F.coalesce(F.col(self._weight_col).cast("double"), F.lit(1.0))
        return F.lit(1.0)

    _DEC = "decimal(38,6)"

    def _dsum(self, c: Column) -> Column:
        """Order-independent float sum (see exact_mode)."""
        return F.sum(c.cast(self._DEC)).cast("double")

    def _agg_exprs(self) -> list[Column]:
        w = self._weight()
        exprs: list[Column] = []
        if self._weight_col:
            cnt = self._dsum(w) if self._exact else F.sum(w)
            exprs.append(cnt.alias("count"))
            exprs.append(F.count(F.lit(1)).alias("samples"))
        else:
            exprs.append(F.count(F.lit(1)).alias("count"))
        for a in self._aggs:
            c = F.col(a.col)
            name = a.alias or f"{a.op}_{a.col.replace(',', '_')}"
            if a.op == "avg":
                if self._weight_col:
                    num = self._dsum(c * w) if self._exact else F.sum(c * w)
                    den_c = F.when(c.isNotNull(), w)
                    den = self._dsum(den_c) if self._exact else F.sum(den_c)
                    expr = num / den
                elif self._exact:
                    expr = self._dsum(c) / F.count(c)
                else:
                    expr = F.avg(c)
                exprs.append(expr.alias(name))
            elif a.op == "sum":
                # weighted SUM is Σv·w — the reference derives SUM as
                # Mean()·TotalCount with a weight-scaled count
                # (hist_compat.go:22, printer.go:122), i.e. weighted
                cw = c * w if self._weight_col else c
                expr = self._dsum(cw) if self._exact else F.sum(cw)
                exprs.append(expr.alias(name))
            elif a.op == "min":
                exprs.append(F.min(c).alias(name))
            elif a.op == "max":
                exprs.append(F.max(c).alias(name))
            elif a.op == "stddev":
                if self._weight_col:
                    # frequency-weight sample stddev: (Σwv² − (Σwv)²/W)
                    # / (W−1), W = weight over non-null values — the
                    # un-quantized version of the reference's
                    # weight-scaled hist stddev (hist_basic.go:186-219)
                    ww = F.when(c.isNotNull(), w)
                    big_w = (self._dsum(ww) if self._exact
                             else F.sum(ww).cast("double"))
                    s1 = self._dsum(c * w) if self._exact else F.sum(c * w)
                    s2 = (self._dsum(c * c * w) if self._exact
                          else F.sum(c * c * w))
                    var = (s2 - s1 * s1 / big_w) / (big_w - F.lit(1.0))
                    exprs.append(F.sqrt(var).alias(name))
                elif self._exact:
                    n = F.count(c)
                    var = ((self._dsum(c * c)
                            - self._dsum(c) * self._dsum(c) / n)
                           / (n - F.lit(1)))
                    exprs.append(F.sqrt(var).alias(name))
                else:
                    exprs.append(F.stddev_samp(c).alias(name))
            elif a.op == "percentile":
                pcts = a.params.get("percentiles", [0.25, 0.5, 0.75])
                # approx=True is the scale path: a mergeable quantile
                # sketch (reference's optional t-digest build,
                # src/lib/hist_tdigest.go:1-130) instead of the exact
                # full-sort percentile; accuracy trades memory
                approx = a.params.get("approx", False)
                acc = a.params.get("accuracy", 10000)
                if self._weight_col:
                    # weighted percentiles compile via a window CDF
                    # pass joined in by compile() — see _wp_frame
                    if approx:
                        raise ValueError(
                            "approx percentile does not support "
                            "weight_col; use hist_summary for the "
                            "weighted scale path")
                    continue
                for p in pcts:
                    if approx:
                        e = F.percentile_approx(a.col, p, acc)
                    else:
                        e = F.expr(f"percentile({a.col}, {p!r})")
                    exprs.append(
                        e.alias(a.alias or f"p{int(p * 100)}_{a.col}"))
            elif a.op == "distinct":
                cols = a.params.get("cols") or a.col.split(",")
                if a.params.get("approx"):
                    expr = F.approx_count_distinct(
                        F.concat_ws("\x1f", *[F.col(x) for x in cols]),
                        a.params.get("rsd", 0.05))
                else:
                    expr = F.count_distinct(*[F.col(x) for x in cols])
                exprs.append(expr.alias(a.alias or "distinct"))
            elif a.op == "count":
                pass  # count/samples are always emitted
            elif a.op == "hist":
                raise ValueError("hist aggregations compile via Query.hist()")
        return exprs

    def _group_names(self, df: DataFrame) -> list[str]:
        names = list(self._groups)
        names += [a for _c, a in self._set_groups if a in df.columns]
        if self._time_bucket:
            names.append("tbucket")
        return names

    def _wp_frame(self, df: DataFrame, a: "_Agg") -> DataFrame:
        """Exact weighted percentiles for one agg: smallest value whose
        cumulative weight reaches p·total (the un-quantized version of
        the reference's weight-scaled histogram percentiles,
        src/lib/hist_basic.go:111-118, 153-183).

        Plan shape: one window pass building the weighted CDF
        (partitioned by the group columns — the per-group sort is the
        unavoidable cost of an exact percentile and Spark spills it),
        then a grouped min over threshold-crossing values. Weights
        accumulate in decimal, so the CDF is order-exact and
        bit-matches a SQL window oracle. UNGROUPED at modest row
        counts the window is a single partition (cheapest); above
        WP_UNGROUPED_MAX_ROWS it switches to _wp_ungrouped_distributed
        — same exact answer, parallel sort. GROUPED above
        WP_GROUPED_DISTRIBUTED_MIN_BYTES of estimated input it
        likewise switches to _wp_grouped_distributed (the per-group
        window caps task parallelism at |groups|). The mergeable
        constant-size path either way remains the histogram CDF
        (hist_summary / rollup)."""
        from pyspark.sql import Window

        names = self._group_names(df)
        gexprs = self._group_cols(df)
        w = self._weight()
        proj = (df.select(*gexprs, F.col(a.col).alias("__v"),
                          w.cast(self._DEC).alias("__w"))
                  .where(F.col("__v").isNotNull()))
        # __tw (per-group total weight) deliberately does NOT come
        # from a second `sum over (partition by ...)` window: a
        # whole-partition frame is its own WindowExec that buffers
        # and re-walks EVERY row (the r10 before-plan showed two
        # stacked Window nodes). The total is a |groups|-row
        # aggregate instead — broadcast-joined for the grouped path,
        # folded into the already-paid plan-time count for the
        # ungrouped path — and decimal sums are order-independent,
        # so the value is bit-identical to the window it replaces.
        if not names:
            stats = proj.agg(F.count(F.lit(1)).alias("n"),
                             F.sum("__w").alias("tw")).collect()[0]
            if stats["n"] > WP_UNGROUPED_MAX_ROWS:
                return self._wp_ungrouped_distributed(proj, a)
            tw_lit = F.lit(str(stats["tw"] or 0)).cast(self._DEC)
            cdf = Window.partitionBy().orderBy("__v", "__w").rowsBetween(
                Window.unboundedPreceding, Window.currentRow)
            proj = proj.select("__v",
                               F.sum("__w").over(cdf).alias("__cw"),
                               tw_lit.alias("__tw"))
        else:
            # The group key is ONE struct column, not the bare group
            # columns, for two reasons (r11, replaces the r10 forced
            # F.broadcast(totals) that was an unbounded driver-side
            # hazard for high-cardinality group-bys):
            # - struct equality is null-safe per field (verified:
            #   struct(NULL) = struct(NULL) is TRUE), so the totals
            #   re-attach as a PLAIN equi-join — NULL group values
            #   stay real groups without <=> conditions, whose
            #   coalesce-wrapped keys would defeat co-partitioning;
            # - the join's required distribution (__wp_g) is exactly
            #   the window's own exchange and the window sort
            #   (__wp_g, __v, __w) is a prefix-match for the merge
            #   sort, so even if the (gate-bounded) broadcast hint
            #   below were ever dropped, the fallback SortMergeJoin
            #   adds ZERO exchanges and ZERO probe-side sorts.
            proj = proj.withColumn(
                "__wp_g", F.struct(*[F.col(n) for n in names]))
            # Few huge groups serialize the per-group window (task
            # parallelism = |groups|: the r11 10x scaling leg measured
            # weighted_percentile FLAT from 8 to 32 cores because its
            # 3-group window runs 3 tasks). Above a size gate the
            # grouped path switches to the same distributed prefix-sum
            # CDF the ungrouped path uses — the gate is the
            # optimizer's input-size estimate (a plan-stats read, no
            # job, the tfidf persist_tf discipline), so the decision
            # costs nothing and scales with the data, not a core
            # count. Unknown stats (checkpointed/injected inputs)
            # assume big.
            try:
                est = int(str(proj._jdf.queryExecution()
                              .optimizedPlan().stats().sizeInBytes()))
            except Exception:
                est = WP_GROUPED_DISTRIBUTED_MIN_BYTES + 1
            if est > WP_GROUPED_DISTRIBUTED_MIN_BYTES:
                proj = self._wp_grouped_distributed(proj)
            else:
                part = Window.partitionBy("__wp_g")
                cdf = part.orderBy("__v", "__w").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow)
                totals = proj.groupBy("__wp_g") \
                             .agg(F.sum("__w").alias("__tw"))
                # The broadcast hint is BOUNDED here, not the r10
                # unbounded-hazard shape the ADVICE flagged: this
                # branch only runs when the whole input estimates
                # ≤ WP_GROUPED_DISTRIBUTED_MIN_BYTES, and |totals| ≤
                # |input| rows by construction — a high-cardinality
                # group-by over big data lands on the distributed
                # path above, which has no hint at all. Measured:
                # the un-hinted SMJ re-attach cost ~0.3-0.4 s at
                # sf0.1 vs the broadcast (r11 interleaved A/B).
                proj = (proj.select("__wp_g", "__v",
                                    F.sum("__w").over(cdf).alias("__cw"))
                        .join(F.broadcast(totals), "__wp_g"))
        pcts = a.params.get("percentiles", [0.25, 0.5, 0.75])
        aggs = []
        for p in pcts:
            hit = F.when(F.col("__cw").cast("double")
                         >= F.lit(float(p)) * F.col("__tw").cast("double"),
                         F.col("__v"))
            aggs.append(F.min(hit).cast("double")
                        .alias(a.alias or f"p{int(p * 100)}_{a.col}"))
        if not names:
            return proj.agg(*aggs)
        out = proj.groupBy("__wp_g").agg(*aggs)
        return out.select(
            *[F.col("__wp_g").getField(n).alias(n) for n in names],
            *[c for c in out.columns if c != "__wp_g"])

    def _wp_grouped_distributed(self, proj: DataFrame) -> DataFrame:
        """Exact GROUPED weighted percentiles without per-group
        single-task windows — the grouped form of the distributed
        prefix-sum CDF (see _wp_ungrouped_distributed):

        1. range-partition (__wp_g, __v, __w): each group's rows span
           a CONTIGUOUS run of partitions in (value, weight) order;
           pin the assignment with a localCheckpoint and record each
           row's partition id;
        2. one small aggregation gives per-(partition, group) weight
           sums — ≤ |groups| + numPartitions − 1 rows total because
           group runs are contiguous — and a window over that small
           frame turns them into per-group exclusive prefix offsets
           AND per-group totals in one pass;
        3. re-attach by (partition id, group): an equi-join against
           the small frame (AQE broadcasts it when it measures small;
           a shuffled join co-partitions with the window that
           follows, so the big frame pays exactly one more narrow
           exchange either way), then each task windows only its own
           (partition, group) slice — parallelism follows the data,
           not |groups| — and adds its offset.

        Ties straddling a range boundary can interleave differently
        than the single-window (__v, __w) order, but the answer — the
        smallest VALUE whose cumulative weight reaches p·total — is
        invariant to ordering among ties, so this bit-matches the
        per-group-window path (pinned by
        test_weighted_percentile_grouped_distributed_matches_window).

        Returns the same (__wp_g, __v, __cw, __tw) frame the window
        path produces; the caller's crossing aggregation is shared."""
        from pyspark.sql import Window

        spark = proj.sparkSession
        npart = spark.sparkContext.defaultParallelism
        part = (proj.repartitionByRange(npart, "__wp_g", "__v", "__w")
                    .withColumn("__pid", F.spark_partition_id())
                    .localCheckpoint())
        sums = part.groupBy("__pid", "__wp_g") \
                   .agg(F.sum("__w").alias("__pw"))
        wg = Window.partitionBy("__wp_g").orderBy("__pid")
        offs = sums.select(
            "__pid", "__wp_g",
            F.coalesce(
                F.sum("__pw").over(
                    wg.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast(self._DEC)).alias("__off"),
            F.sum("__pw").over(
                wg.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)).alias("__tw"))
        cdf = Window.partitionBy("__pid", "__wp_g") \
                    .orderBy("__v", "__w") \
                    .rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow)
        return (part.join(offs, ["__pid", "__wp_g"])
                    .select("__wp_g", "__v",
                            (F.sum("__w").over(cdf)
                             + F.col("__off")).alias("__cw"),
                            "__tw"))

    def _wp_ungrouped_distributed(self, proj: DataFrame,
                                  a: "_Agg") -> DataFrame:
        """Exact UNGROUPED weighted percentiles without a global
        one-partition sort — the distributed prefix-sum CDF:

        1. range-partition (__v) so partition i holds values below
           partition i+1's, and PIN the sampled range boundaries with
           a localCheckpoint (the offsets pass and the final pass
           must see the SAME partition assignment — re-running the
           range sampler between two jobs could move rows);
        2. one tiny aggregation collects per-partition weight sums
           (≤ numPartitions decimal rows to the driver) and turns
           them into exclusive prefix offsets;
        3. each partition windows ONLY its own rows (parallel,
           spillable) and adds its offset — the global decimal-exact
           cumulative weight — then the usual min-over-crossing
           finishes per percentile.

        Equal values straddling a range boundary can interleave
        differently than the single-window (__v, __w) order, but the
        answer — the smallest VALUE whose cumulative weight reaches
        p·total — is invariant to ordering among ties, so this
        bit-matches the single-window path (pinned by
        test_weighted_percentile_distributed_matches_window)."""
        from decimal import Decimal

        from pyspark.sql import Window

        spark = proj.sparkSession
        npart = spark.sparkContext.defaultParallelism
        part = (proj.repartitionByRange(npart, "__v")
                    .withColumn("__pid", F.spark_partition_id())
                    .localCheckpoint())
        offs = (part.groupBy("__pid").agg(F.sum("__w").alias("pw"))
                    .orderBy("__pid").collect())
        run = Decimal(0)
        pairs: list[Column] = []
        for r in offs:
            pairs += [F.lit(int(r["__pid"])),
                      F.lit(str(run)).cast(self._DEC)]
            run += r["pw"]
        total = run
        off_col = F.element_at(F.create_map(*pairs), F.col("__pid")) \
            if pairs else F.lit(0).cast(self._DEC)
        w_in = Window.partitionBy("__pid").orderBy("__v", "__w") \
                     .rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
        cdf = part.select(
            "__v", (F.sum("__w").over(w_in) + off_col).alias("__cw"))
        pcts = a.params.get("percentiles", [0.25, 0.5, 0.75])
        aggs = []
        for p in pcts:
            hit = F.when(F.col("__cw").cast("double")
                         >= F.lit(float(p) * float(total)),
                         F.col("__v"))
            aggs.append(F.min(hit).cast("double")
                        .alias(a.alias or f"p{int(p * 100)}_{a.col}"))
        return cdf.agg(*aggs)

    def _group_cols(self, df: DataFrame) -> list[Column]:
        cols = [F.col(g) for g in self._groups]
        cols += [F.col(a) for _c, a in self._set_groups if a in df.columns]
        if self._time_bucket:
            t = F.col(self._time_col).cast("long")
            cols.append((t - t % self._time_bucket).alias("tbucket"))
        return cols

    def compile(self, spark: SparkSession) -> DataFrame:
        df = self._load(spark)
        for col, pat, repl in self._str_replaces:
            df = df.withColumn(col, F.regexp_replace(F.col(col), pat, repl))
        pred = self._predicate(df)
        if pred is not None:
            df = df.where(pred)
        for col, alias in self._set_groups:
            df = df.withColumn(alias, F.explode(F.col(col)))

        group_cols = self._group_cols(df)
        if group_cols:
            out = df.groupBy(*group_cols).agg(*self._agg_exprs())
        else:
            out = df.agg(*self._agg_exprs())

        wp_aggs = [a for a in self._aggs
                   if a.op == "percentile" and self._weight_col
                   and not a.params.get("approx")]
        if wp_aggs:
            if self._total_row:
                raise ValueError("total_row with weighted percentiles "
                                 "is not supported")
            names = self._group_names(df)
            for a in wp_aggs:
                frame = self._wp_frame(df, a)
                out = (out.join(frame, names, "left") if names
                       else out.crossJoin(frame))

        if self._total_row and group_cols:
            # Grand-total union (reference src/lib/aggregate.go:414-459);
            # group keys become null, rendered "TOTAL" in the output layer.
            total = df.agg(*self._agg_exprs())
            for gc in out.columns:
                if gc not in total.columns:
                    total = total.withColumn(gc, F.lit(None))
            out = out.unionByName(total.select(out.columns))

        for h in self._having:
            # post-agg, pre-sort/limit (SQL HAVING position); the
            # TOTAL row, if any, is subject to it like any other row
            out = out.where(F.expr(h))

        # No explicit sort AND no limit → skip the output sort: the
        # result set is order-insensitive and the extra range-partition
        # Exchange is pure cost at scale. (With a limit, ordering is
        # part of the semantics; orderBy+limit compiles to an exact
        # TakeOrderedAndProject, not a full sort.)
        if self._sort is None and not self._limit:
            return out
        sort_col, asc = self._sort or ("count", False)
        if group_cols:
            order = [F.col(sort_col).asc() if asc else F.col(sort_col).desc()]
            # Group keys as tiebreakers make limit deterministic (the
            # reference's pick under ties is block-order-dependent; ours
            # is total-ordered — documented divergence, SURVEY §7.5).
            order += [F.col(g).asc_nulls_last()
                      for g in out.columns
                      if g in self._groups or g == "tbucket"]
            out = out.orderBy(*order)
        if self._limit:
            out = out.limit(self._limit)
        return out

    def execute(self, spark: SparkSession) -> DataFrame:
        return self.compile(spark)

    # -- histogram path ----------------------------------------------------
    def hist(self, spark: SparkSession, col: str, bucket: float | None = None,
             min_val: float | None = None, max_val: float | None = None,
             weighted: bool = True,
             discard_over: float | None = None,
             from_registry=None) -> DataFrame:
        """Fixed-width bucket histogram per group (reference `-op hist`,
        src/lib/hist_basic.go:28-151).

        The reference sizes buckets as (table_max - table_min) /
        NUM_BUCKETS using *table-lifetime* column stats
        (src/lib/hist_basic.go:87-91); pass explicit min/max (from the
        metadata registry) for compat, or an explicit `bucket` width
        (reference `-int-bucket`). When neither is given, min/max are
        computed from the filtered scan — exact, one extra cheap
        aggregate, still two scans total.

        `discard_over` drops values above a cutoff before bucketing —
        sybil-compat callers pass 10× the registry's table max
        (reference src/lib/hist_basic.go:101-109).

        `from_registry` is the full sybil-compat mode: pass a `Table`
        and bucket width, base, and the 10x-max outlier discard all
        come from the table-lifetime stats registry (maintained by
        digest, sources/compact._update_int_info) with no extra scan
        — histogram numbers then match the reference's quantization
        for any ingest history, not just the current rows.

        Output: one row per (group..., bucket) with `bucket` = inclusive
        lower bound, `count` (weighted) and `samples` (raw).
        """
        if from_registry is not None:
            info = from_registry.load_meta().int_info.get(col)
            if not info:
                raise ValueError(
                    f"no registry stats for column {col!r}; run digest")
            min_val = info["min"] if min_val is None else min_val
            max_val = info["max"] if max_val is None else max_val
            if discard_over is None and info["max"] is not None \
                    and info["max"] > 0:
                discard_over = 10 * info["max"]
        df = self._load(spark)
        for c0, pat, repl in self._str_replaces:
            df = df.withColumn(c0, F.regexp_replace(F.col(c0), pat, repl))
        pred = self._predicate(df)
        if pred is not None:
            df = df.where(pred)
        # set group-by explodes here exactly like compile() — a
        # group_by_set + hist query must group per element, not
        # silently drop the grouping
        for c0, alias in self._set_groups:
            df = df.withColumn(alias, F.explode(F.col(c0)))
        df = df.where(F.col(col).isNotNull())
        if discard_over is not None:
            df = df.where(F.col(col) <= discard_over)

        if bucket is None:
            if min_val is None or max_val is None:
                row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
                min_val = row["mn"] if min_val is None else min_val
                max_val = row["mx"] if max_val is None else max_val
            if min_val is None or max_val is None:
                # empty filtered input: min/max aggregate to NULL —
                # degenerate to one unit bucket so the plan compiles
                # and returns the (empty) result instead of a
                # TypeError on None arithmetic
                min_val, max_val = 0.0, 0.0
            bucket = max((max_val - min_val) / NUM_BUCKETS, 1)
        base = float(min_val) if min_val is not None else 0.0

        bcol = (F.floor((F.col(col) - F.lit(base)) / F.lit(float(bucket)))
                * F.lit(float(bucket)) + F.lit(base)).alias("bucket")
        group_cols = self._group_cols(df) + [bcol]
        w = self._weight()
        wsum = self._dsum(w) if self._exact else F.sum(w)
        aggs = [wsum.alias("count"), F.count(F.lit(1)).alias("samples")] \
            if (weighted and self._weight_col) else [F.count(F.lit(1)).alias("count")]
        out = df.groupBy(*group_cols).agg(*aggs)
        order = [F.col(c).asc_nulls_last() for c in out.columns
                 if c in self._groups or c in ("tbucket", "bucket")
                 or c in {a for _c, a in self._set_groups}]
        return out.orderBy(*order)

    def hist_summary(self, spark: SparkSession, col: str,
                     bucket: float | None = None,
                     min_val: float | None = None,
                     max_val: float | None = None,
                     ps: tuple = (0.25, 0.5, 0.75),
                     discard_over: float | None = None,
                     from_registry=None) -> DataFrame:
        """Composite histogram result: per group, ONE row holding
        samples, sum, avg, stddev AND bucket-quantized percentiles —
        the reference's `-op hist` output, which prints
        percentiles/stddev/avg/sum derived from the same histogram
        (src/lib/printer.go:111-125, hist_basic.go:153-211), without
        issuing separate percentile/stddev queries.

        Plan shape: one scan → per-(group, bucket) partial moments
        (count + decimal sum/sumsq) → per-group final merge where
        percentiles walk the ≤NUM_BUCKETS (bucket,count) entries
        (rollup.percentiles_from_hist's CDF logic as an aggregate).
        avg/stddev come from the exact decimal moments (like
        sources/rollup.serve); percentiles are bucket lower bounds,
        quantized exactly like the reference. Scale-safe: the second
        aggregate sees at most NUM_BUCKETS rows per group.

        With a weight column set, `count` is the weight sum, avg and
        stddev use frequency-weight moments (Σwv, Σwv², sample
        variance with W−1), and the percentile CDF walks cumulative
        WEIGHTS in exact decimal — the reference's weight-scaled
        histogram semantics (hist_basic.go:111-118, 153-183); this
        is the mergeable scale path for weighted percentiles."""
        if from_registry is not None:
            info = from_registry.load_meta().int_info.get(col)
            if not info:
                raise ValueError(
                    f"no registry stats for column {col!r}; run digest")
            min_val = info["min"] if min_val is None else min_val
            max_val = info["max"] if max_val is None else max_val
            if discard_over is None and info["max"] is not None \
                    and info["max"] > 0:
                discard_over = 10 * info["max"]
        df = self._load(spark)
        for c0, pat, repl in self._str_replaces:
            df = df.withColumn(c0, F.regexp_replace(F.col(c0), pat, repl))
        pred = self._predicate(df)
        if pred is not None:
            df = df.where(pred)
        for c0, alias in self._set_groups:
            df = df.withColumn(alias, F.explode(F.col(c0)))
        df = df.where(F.col(col).isNotNull())
        if discard_over is not None:
            df = df.where(F.col(col) <= discard_over)
        if bucket is None:
            if min_val is None or max_val is None:
                row = df.agg(F.min(col).alias("mn"),
                             F.max(col).alias("mx")).first()
                min_val = row["mn"] if min_val is None else min_val
                max_val = row["mx"] if max_val is None else max_val
            if min_val is None or max_val is None:
                # empty filtered input — same degenerate bucket as
                # hist(): no None arithmetic, empty/zero-count result
                min_val, max_val = 0.0, 0.0
            bucket = max((max_val - min_val) / NUM_BUCKETS, 1)
        base = float(min_val) if min_val is not None else 0.0

        c = F.col(col)
        bcol = (F.floor((c - F.lit(base)) / F.lit(float(bucket)))
                * F.lit(float(bucket)) + F.lit(base)).alias("bucket")
        group_cols = self._group_cols(df)
        use_w = bool(self._weight_col)
        wcol = self._weight()
        vw = c * wcol if use_w else c
        vvw = c * c * wcol if use_w else c * c
        baggs = [F.count(F.lit(1)).alias("__n"),
                 F.sum(vw.cast(self._DEC)).alias("__s"),
                 F.sum(vvw.cast(self._DEC)).alias("__ss")]
        if use_w:
            baggs.append(F.sum(wcol.cast(self._DEC)).alias("__w"))
        per_bucket = df.groupBy(*group_cols, bcol).agg(*baggs)
        gnames = [x for x in per_bucket.columns
                  if x not in ("bucket", "__n", "__s", "__ss", "__w")]
        n = F.sum("__n")
        # W: the denominator — weight sum under a weight column, else
        # the raw row count (frequency-weight moments generalize both)
        big_w = F.sum("__w").cast("double") if use_w else n.cast("double")
        s = F.sum("__s").cast("double")
        ss = F.sum("__ss").cast("double")
        cnt_field = F.col("__w") if use_w else F.col("__n")
        entries = F.array_sort(F.collect_list(
            F.struct(F.col("bucket").alias("b"),
                     cnt_field.cast(self._DEC).alias("n"))))
        aggs = [n.alias("samples"),
                s.alias(f"sum_{col}"),
                (s / big_w).alias(f"avg_{col}"),
                F.sqrt((ss - s * s / big_w) / (big_w - F.lit(1.0)))
                 .alias(f"stddev_{col}"),
                big_w.alias("__W"),
                entries.alias("__e")]
        if use_w:
            aggs.insert(1, F.sum("__w").cast("double").alias("count"))
        out = (per_bucket.groupBy(*gnames).agg(*aggs) if gnames
               else per_bucket.agg(*aggs))

        def _cdf_walk(target):
            return F.aggregate(
                F.col("__e"),
                F.struct(F.lit(0).cast(self._DEC).alias("cum"),
                         F.lit(None).cast("double").alias("ans")),
                lambda acc, e: F.struct(
                    (acc["cum"] + e["n"]).alias("cum"),
                    F.when(acc["ans"].isNotNull(), acc["ans"])
                     .when((acc["cum"] + e["n"]).cast("double") >= target,
                           e["b"]).alias("ans")))

        for p in ps:
            target = F.lit(float(p)) * F.col("__W")
            out = out.withColumn(f"p{int(p * 100)}", _cdf_walk(target)["ans"])
        out = out.drop("__e", "__W")
        order = [F.col(x).asc_nulls_last() for x in gnames]
        return out.orderBy(*order) if order else out

    def loghist(self, spark: SparkSession, col: str,
                weighted: bool = True) -> DataFrame:
        """Log-scaled histogram (reference `-loghist`,
        src/lib/hist_multi.go:6-261): bucket width shrinks
        logarithmically so wide-range columns keep resolution near
        zero. Bucket = 2^floor(log2(v)) for v ≥ 1, one bucket for
        v < 1. floor(log2) is computed as bit-length of floor(v) —
        integer arithmetic, so the bucket is bit-deterministic across
        engines (float log2 differs in the last ulp near exact powers
        of two: Spark evaluates ln(x)/ln(2)). Output columns mirror
        hist(): bucket (lower bound), count[, samples]."""
        df = self._load(spark)
        pred = self._predicate(df)
        if pred is not None:
            df = df.where(pred)
        for c0, alias in self._set_groups:
            df = df.withColumn(alias, F.explode(F.col(c0)))
        df = df.where(F.col(col).isNotNull())
        bcol = (F.when(F.col(col) >= 1,
                       F.pow(F.lit(2.0),
                             (F.length(F.bin(F.floor(F.col(col))
                                             .cast("long"))) - 1)
                             .cast("double")))
                 .otherwise(F.lit(0.0))).alias("bucket")
        group_cols = self._group_cols(df) + [bcol]
        w = self._weight()
        wsum = self._dsum(w) if self._exact else F.sum(w)
        aggs = [wsum.alias("count"), F.count(F.lit(1)).alias("samples")] \
            if (weighted and self._weight_col) else [F.count(F.lit(1)).alias("count")]
        out = df.groupBy(*group_cols).agg(*aggs)
        order = [F.col(c).asc_nulls_last() for c in out.columns
                 if c in self._groups or c in ("tbucket", "bucket")
                 or c in {a for _c, a in self._set_groups}]
        return out.orderBy(*order)

    # -- raw-record paths --------------------------------------------------
    def samples(self, spark: SparkSession, n: int = 100,
                sort_col: str | None = None, asc: bool = False,
                cols: list[str] | None = None) -> DataFrame:
        """Matched raw records (reference `-samples`,
        src/lib/printer.go:388-456): filters apply, then records sort
        by `sort_col` (reference default: reverse-chronological) and
        the top n return. Compiles to TakeOrderedAndProject — no full
        sort, no collect."""
        df = self._load(spark)
        for c0, pat, repl in self._str_replaces:
            df = df.withColumn(c0, F.regexp_replace(F.col(c0), pat, repl))
        pred = self._predicate(df)
        if pred is not None:
            df = df.where(pred)
        if cols:
            df = df.select(*cols)
        order_col = sort_col or self._time_col
        if order_col:
            df = df.orderBy(F.col(order_col).asc() if asc
                            else F.col(order_col).desc())
        return df.limit(n)

    def distinct_values(self, spark: SparkSession, cols: list[str],
                        limit: int | None = None,
                        deterministic: bool = False) -> DataFrame:
        """Distinct tuples with an optional early-exit limit
        (reference `-distinct-limit`, src/lib/table_query.go:259-280).

        Default: Spark's limit short-circuits tasks once n rows are
        buffered — the same cost-saving intent as the reference;
        WHICH n tuples return is nondeterministic in both engines
        (SURVEY.md §7.5). Scale delta, by design: the reference can
        abort mid-SCAN at >= n distinct groups (table_query.go:
        259-280) so on a high-cardinality 100x table it reads less
        INPUT; Spark's limit caps result movement but still scans
        every block once (plan shape pinned in
        test_plans.test_distinct_limit_early_exit_plans).

        `deterministic=True` keeps the early-exit COST shape but
        makes the returned set reproducible: order by md5 of the
        tuple (a uniform pseudo-random total order any engine can
        replicate) before the limit. NULLs are encoded with an
        explicit sentinel so the order is well-defined for nullable
        tuples too — the SQL equivalent is
        `order by md5(concat_ws(chr(31),
            coalesce(cast(c1 as varchar), chr(0) || 'null'), ...))
         limit n`
        (plain `md5(cast(col as varchar))` would yield NULL and sort
        nulls-last, diverging from concat_ws's null-skipping).
        Compiles to TakeOrderedAndProject over the distinct
        aggregate — per-partition top-n then a k-row merge, never a
        full sort."""
        df = self._load(spark)
        pred = self._predicate(df)
        if pred is not None:
            df = df.where(pred)
        out = df.select(*cols).distinct()
        if limit and deterministic:
            tie = F.md5(F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"),
                                     F.lit("\x00null")) for c in cols]))
            out = out.orderBy(tie.asc_nulls_last(),
                              *[F.col(c).asc_nulls_last() for c in cols])
        return out.limit(limit) if limit else out


def distinct_values_early_stop(spark: SparkSession, blocks: list[str],
                               cols: list[str], limit: int,
                               batch_files: int = 8,
                               predicate: Column | None = None) -> DataFrame:
    """TRUE input-limiting distinct-limit: stop READING blocks once
    >= `limit` distinct tuples exist — the reference's mid-scan abort
    (src/lib/table_query.go:259-280), which Query.distinct_values
    cannot reproduce because a DataFrame limit caps result movement,
    not input IO (test_plans.test_distinct_limit_early_exit_plans).

    Scans `batch_files` block files at a time, accumulating distinct
    tuples; on a high-cardinality table the first batch usually
    satisfies the limit and the remaining 99.9% of a 100x table is
    never opened. Worst case (cardinality < limit) degrades to one
    extra pass's worth of driver round-trips over the same data a
    full scan reads anyway. Each batch collects at most `limit` rows
    to the driver — bounded regardless of table size.

    Like the reference, WHICH tuples return is scan-order dependent;
    callers needing reproducibility use
    Query.distinct_values(deterministic=True)."""
    seen: list = []
    seen_set = set()
    for i in range(0, len(blocks), batch_files):
        batch = blocks[i:i + batch_files]
        df = spark.read.parquet(*batch)
        if predicate is not None:
            df = df.where(predicate)
        rows = (df.select(*cols).distinct()
                  .limit(limit).collect())

        def _hashable(v):
            # array/set columns collect as Python lists (unhashable);
            # map columns as dicts — normalize recursively so the
            # seen-set works for every distinct-able column type
            if isinstance(v, list):
                return tuple(_hashable(x) for x in v)
            if isinstance(v, dict):
                return tuple(sorted((k, _hashable(x))
                                    for k, x in v.items()))
            return v

        for r in rows:
            t = tuple(_hashable(v) for v in r)
            if t not in seen_set:
                seen_set.add(t)
                seen.append(r)
        if len(seen) >= limit:
            break
    out_rows = seen[:limit]
    schema = spark.read.parquet(*blocks[:1]).select(*cols).schema
    return spark.createDataFrame(out_rows, schema=schema)
