"""Temporal joins Spark lacks natively: as-of and range joins.

Both are staples of event/time-series analytics that the reference
cannot express at all (no joins, reference README.md:28) and that a
naive Spark formulation executes as a broadcast-nested-loop or a
cartesian — catastrophic at scale. Each is implemented here as a
composition of built-in DataFrame ops with a bounded shuffle:

- as-of join: union both sides, one window pass per key — a single
  hash shuffle on the key, no pair blow-up, O(n log n) sort within
  partitions. (The merge-join formulation used by kdb/QuestDB/
  DuckDB's ASOF, re-expressed as a Spark window.)
- range join: discretize the range dimension into fixed buckets,
  explode the interval side to the buckets it overlaps, equi-join on
  (key?, bucket), post-filter exactly — turning the non-equi join
  into a shuffle-hash join whose fan-out is interval_len/bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_time: str, right_time: str,
              right_cols: list[str] | None = None,
              direction: str = "backward",
              suffix: str = "_r") -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (direction='backward'; 'forward' gives
    the earliest right row with right_time >= left_time), matching
    per `on` keys. Rows with no match get NULLs — semantics of
    DuckDB `ASOF [LEFT] JOIN` / pandas `merge_asof`.

    Plan: tag sides, union, one window (partitionBy keys, orderBy
    time then side so a right row at the exact same time is visible
    to the left row), carry the last/next right payload as a struct
    with ignorenulls. One shuffle total; skewed keys split fine
    because the window is per key and AQE handles partition sizing.
    """
    rcols = right_cols or [c for c in right.columns
                           if c not in on and c != right_time]
    payload = F.struct(F.col(right_time).alias(right_time + suffix),
                       *[F.col(c).alias(c + suffix) for c in rcols])
    lt = left.select(*on, F.col(left_time).alias("__t"),
                     F.lit(None).cast("struct<" + ",".join(
                         [f"{right_time + suffix}:" +
                          right.schema[right_time].dataType.simpleString()] +
                         [f"{c + suffix}:{right.schema[c].dataType.simpleString()}"
                          for c in rcols]) + ">").alias("__p"),
                     F.lit(1).alias("__side"),
                     *[F.col(c) for c in left.columns
                       if c not in on and c != left_time])
    rt = right.select(*on, F.col(right_time).alias("__t"),
                      payload.alias("__p"), F.lit(0).alias("__side"),
                      *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                        for c in left.columns if c not in on and c != left_time])
    u = lt.unionByName(rt)
    if direction == "backward":
        w = (Window.partitionBy(*on).orderBy(F.col("__t").asc(),
                                             F.col("__side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = F.last("__p", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (Window.partitionBy(*on).orderBy(F.col("__t").desc(),
                                             F.col("__side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = F.last("__p", ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be backward/forward: {direction}")
    out = (u.withColumn("__carry", carried)
            .where(F.col("__side") == 1)
            .select(*on, F.col("__t").alias(left_time),
                    *[F.col(c) for c in left.columns
                      if c not in on and c != left_time],
                    F.col("__carry." + right_time + suffix)
                     .alias(right_time + suffix),
                    *[F.col("__carry." + c + suffix).alias(c + suffix)
                      for c in rcols]))
    return out


def range_join(points: DataFrame, point_col: str,
               intervals: DataFrame, start_col: str, end_col: str,
               on: list[str] | None = None,
               bucket: float = 3600.0) -> DataFrame:
    """Join each point row to every interval row with
    start <= point < end (optionally also matching `on` keys).

    Without help Spark plans `p.t >= i.s AND p.t < i.e` as a
    nested-loop over the cross product. Discretizing makes it an
    equi-join: points map to bucket floor(t/b); intervals explode to
    the buckets they overlap (sequence(floor(s/b), floor(e/b))); join
    on (keys, bucket); the exact predicate filters the boundary
    bucket rows. Choose `bucket` ≈ median interval length so fan-out
    is O(1) per interval."""
    on = on or []
    pb = points.withColumn("__b",
                           F.floor(F.col(point_col) / F.lit(bucket))
                            .cast("long"))
    ib = intervals.withColumn(
        "__b", F.explode(F.sequence(
            F.floor(F.col(start_col) / F.lit(bucket)).cast("long"),
            F.floor(F.col(end_col) / F.lit(bucket)).cast("long"))))
    joined = pb.join(ib, on + ["__b"])
    return (joined.where((F.col(point_col) >= F.col(start_col))
                         & (F.col(point_col) < F.col(end_col)))
                  .drop("__b"))


def sessionize(df: DataFrame, key_col: str, time_col: str,
               gap_s: int = 1800, tiebreak: str | None = None) -> DataFrame:
    """Gap-based sessions per key (batch twin of
    streaming.stream_sessions): a session breaks when the time since
    the previous event exceeds `gap_s`.

    Plan: one hash shuffle on the key; within each partition a lag
    window flags session starts and a running sum numbers them —
    both windows share the same partitioning/ordering so Catalyst
    runs them in a single Window node chain without extra exchanges.
    `tiebreak` orders same-timestamp events deterministically.

    Output: key, sess (1-based per key), n_events,
    session_start/session_end (inclusive event times)."""
    order = [F.col(time_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w_lag = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(time_col).over(w_lag)
    flagged = df.withColumn(
        "__new", F.when(prev.isNull()
                        | ((F.col(time_col) - prev) > gap_s), 1).otherwise(0))
    w_run = (Window.partitionBy(key_col).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sess = flagged.withColumn("sess", F.sum("__new").over(w_run))
    return (sess.groupBy(key_col, "sess")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.min(time_col).alias("session_start"),
                     F.max(time_col).alias("session_end")))
