"""Lossy per-partition group prune — the reference's O3, opt-in.

The reference truncates each partial result to ``min(limit*10, 1000)``
groups (sorted by the prune column) before merging partials
(src/lib/aggregate.go:469-495, INTERNAL_RESULT_LIMIT at
aggregate.go:15, applied per 16-block batch at table_query.go:230-258).
That trades exactness for bounded memory: a group missing from every
partial's local top-``keep`` disappears even if its global rank is
inside the limit.

The repo's DEFAULT stays exact — Spark's hash aggregation spills
instead of dropping groups, so ``Query.group_by().sort().limit`` never
loses a group. This module is the faithful opt-in for the cases the
reference built it for: ultra-high-cardinality group-bys where the
final consumer only wants the head and partial-state memory is the
binding constraint.

Semantics contract (same as the reference): EXACT whenever every
partition holds at most ``keep`` distinct groups (then nothing is ever
truncated — the corpus oracle exercises this regime), and
heavy-hitter-approximate beyond that (a true top-``limit`` group is
kept iff it reaches the local top-``keep`` of at least one partition —
overwhelmingly true for skewed/Zipfian keys, which is the workload
this exists for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference prune cap: min(limit*10, 1000) — aggregate.go:469-476
PRUNE_FACTOR = 10
PRUNE_MAX = 1000


def lossy_group_topk(df: DataFrame, group_cols: list[str], limit: int,
                     weight_col: str | None = None,
                     factor: int = PRUNE_FACTOR,
                     cap: int = PRUNE_MAX) -> DataFrame:
    """Top-``limit`` groups by (weighted) count with per-partition
    pruning to ``keep = min(limit*factor, cap)`` partial groups.

    Plan shape: one mapInPandas pass computes per-partition partial
    counts and keeps only the local head, so the single shuffle
    carries at most ``keep × partitions`` rows no matter how many
    distinct groups the data holds — the exact plan would shuffle one
    partial row per (partition × distinct group). Unweighted counts
    are integer partial sums; a ``weight_col`` is summed in double
    (count becomes a double column, exactly as ``sum(coalesce(w,1))``
    would type it). Whenever the prune never truncates (cardinality
    <= keep per partition) the result matches the exact aggregation —
    bit-identical for unweighted/integer weights; ties on the final
    sort break by group value for a deterministic head. NULL group
    values are first-class: they accumulate as one group (pandas'
    NaN group labels don't merge across batches, so keys are
    normalized to None before accumulating) and come back as NULL
    rows, same as the exact path."""
    import pandas as pd  # noqa: F401 — mapInPandas contract

    keep = min(limit * factor, cap)
    if "partial_count" in group_cols or "count" in group_cols:
        raise ValueError("group_cols may not contain 'count' or "
                         "'partial_count' (reserved output names)")
    cols = list(group_cols) + ([weight_col] if weight_col else [])
    proj = df.select(*cols)
    gtypes = dict(proj.dtypes)
    count_type = "double" if weight_col else "bigint"
    schema = ", ".join([f"`{c}` {gtypes[c]}" for c in group_cols]
                       + [f"partial_count {count_type}"])
    #: integer-typed group cols: pandas promotes them to float64 when
    #: nulls appear — their key values are cast back before emission
    int_cols = [i for i, c in enumerate(group_cols)
                if gtypes[c] in ("bigint", "int", "smallint", "tinyint")]

    wc = weight_col
    gcols = list(group_cols)

    def _norm_key(k, idx_int):
        # tuple of group values with EVERY null form (None, NaN, NaT)
        # collapsed to None — dict-mergeable across batches and
        # type-stable for the tie-break sort
        out = []
        for i, v in enumerate(k if isinstance(k, tuple) else (k,)):
            if v is None or v != v:
                out.append(None)
            elif i in idx_int:
                out.append(int(v))
            else:
                out.append(v)
        return tuple(out)

    def _sort_key(kv):
        # count desc, then group values asc with None first —
        # total order over mixed None/str/int without type errors
        return (-kv[1],
                tuple((v is not None, str(v)) for v in kv[0]))

    def partial(batches):
        import pandas as pd
        acc: dict = {}
        for pdf in batches:
            if wc:
                g = (pdf.assign(**{wc: pdf[wc].fillna(1)})
                        .groupby(gcols, dropna=False)[wc].sum())
            else:
                g = pdf.groupby(gcols, dropna=False).size()
            for k, v in g.items():
                key = _norm_key(k, int_cols)
                acc[key] = acc.get(key, 0) + (float(v) if wc else int(v))
            # mid-stream truncation at the reference's per-scan hard
            # cap (INTERNAL_RESULT_LIMIT, aggregate.go:15): partial
            # state stays bounded even on an adversarial partition —
            # this is the entire point of the lossy mode.
            if len(acc) > 100_000:
                acc = dict(sorted(acc.items(), key=_sort_key)[:keep])
        if not acc:
            return
        items = sorted(acc.items(), key=_sort_key)[:keep]
        out = pd.DataFrame([list(k) + [v] for k, v in items],
                           columns=gcols + ["partial_count"])
        yield out

    partials = proj.mapInPandas(partial, schema)
    return (partials.groupBy(*gcols)
                    .agg(F.sum("partial_count").alias("count"))
                    .orderBy(F.desc("count"),
                             *[F.asc(c) for c in gcols])
                    .limit(limit))
