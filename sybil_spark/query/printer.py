"""Result shaping — the reference's output layer (src/lib/printer.go).

The reference prints query results as a table or as JSON rows of
the form {group cols..., Count, Samples, per-agg values}
(printer.go:109-152 ResultJSON); missing group keys render as the
empty string (the MISSING_VALUE sentinel, aggregate.go:16); the
grand-total row prints when more than one group exists
(printer.go:172-185)."""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame


def rows_to_json(df: DataFrame, group_cols: list[str] | None = None,
                 total_label: str = "TOTAL") -> list[dict[str, Any]]:
    """DataFrame result → sybil-style JSON rows.

    Group-key nulls render as "" (or TOTAL for the grand-total row of
    Query.total_row, which is all-null group keys)."""
    group_cols = group_cols or []
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        if group_cols and all(d.get(g) is None for g in group_cols):
            for g in group_cols:
                d[g] = total_label
        else:
            for g in group_cols:
                if d.get(g) is None:
                    d[g] = ""
        out.append(d)
    return out


def print_json(df: DataFrame, group_cols: list[str] | None = None) -> None:
    print(json.dumps(rows_to_json(df, group_cols), default=str))


def print_table(df: DataFrame, group_cols: list[str] | None = None,
                max_width: int = 24) -> None:
    rows = rows_to_json(df, group_cols)
    if not rows:
        print("(no results)")
        return
    cols = list(rows[0].keys())
    # tabwriter.AlignRight parity (reference printer.go:70-71,
    # 153-185): numeric columns right-align, text left-aligns
    numeric = {c: all(isinstance(r[c], (int, float))
                      and not isinstance(r[c], bool)
                      for r in rows if r[c] is not None)
               for c in cols}
    widths = {c: min(max_width, max(len(str(c)),
                                    *(len(str(r[c])) for r in rows)))
              for c in cols}

    def cell(v, c):
        s = str(v)[:widths[c]]
        return s.rjust(widths[c]) if numeric[c] else s.ljust(widths[c])

    line = "  ".join(cell(c, c) for c in cols)
    print(line)
    print("-" * len(line))
    for r in rows:
        print("  ".join(cell(r[c], c) for c in cols))
