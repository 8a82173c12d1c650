"""Parse `df.explain("formatted")` output into checkable facts.

Why text parsing: PySpark exposes no stable Python API for the
physical plan (the JVM `queryExecution` is private), but the
formatted explain layout — a node tree plus `(n) NodeName` detail
blocks with `PushedFilters:` / `ReadSchema:` fields — is the
documented user-facing surface and is stable across 3.x/4.x.

These helpers answer the questions that matter at 100 TB:

- did my filter reach the Parquet scan (`pushed_filters`)?
- does the scan read only the projected columns (`scan_columns`)?
- how many shuffles does the plan pay (`shuffle_exchange_count`)?
- did the small side broadcast (`broadcast_join_count`)?
- is the hot path inside whole-stage codegen (`codegen_span_count`)?
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The string `df.explain("formatted")` would print."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All Parquet-pushed predicates, e.g. `IsNotNull(value)`,
    `GreaterThan(value,10.0)`, across every scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            # split on top-level commas (filter args contain no brackets)
            out.extend(p.strip() for p in body.split(", "))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Per scan, the column names Parquet actually reads (from
    `ReadSchema`). A 2-column projection reading 16 columns means
    pruning failed."""
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        body = m.group(1)
        cols = []
        depth = 0
        field = ""
        for ch in body:
            if ch == "," and depth == 0:
                cols.append(field)
                field = ""
                continue
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            field += ch
        if field:
            cols.append(field)
        scans.append([c.split(":")[0].strip() for c in cols if c.strip()])
    return scans


def _count(df: DataFrame, pattern: str) -> int:
    return len(re.findall(pattern, formatted_plan(df)))


def exchange_count(df: DataFrame) -> int:
    """All Exchange nodes (shuffle + broadcast). Counts only the
    `(n) Node` detail-block headers — formatted explain prints every
    node twice (tree + details)."""
    return _count(df, r"\(\d+\) (?:Exchange|BroadcastExchange)\b")


def shuffle_exchange_count(df: DataFrame) -> int:
    """Shuffle (hash/range/single-partition) exchanges only — each is
    a full network rewrite of the data; the number to minimize."""
    return _count(df, r"\(\d+\) Exchange\b")


def broadcast_exchange_count(df: DataFrame) -> int:
    return _count(df, r"\(\d+\) BroadcastExchange\b")


def broadcast_join_count(df: DataFrame) -> int:
    return _count(df, r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join\b")


def sort_merge_join_count(df: DataFrame) -> int:
    return _count(df, r"\(\d+\) SortMergeJoin\b")


def codegen_span_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen regions (formatted explain tags
    member operators with `[codegen id : N]`). Fewer, wider spans =
    more of the pipeline fused into generated JVM code."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]",
                              formatted_plan(df))))


def scans_read_only(df: DataFrame, allowed: set[str]) -> bool:
    """True when every Parquet scan in the plan reads a subset of
    `allowed` columns — the pruning assertion used in tests."""
    return all(set(cols) <= allowed for cols in scan_columns(df))
