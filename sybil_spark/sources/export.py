"""Export sinks (reference `-export`: matched records → gzipped TSV
under table/export/, src/lib/table_block_io.go:356-398)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty


def export_tsv(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Write matched records as gzipped TSV. Array (set) columns are
    comma-joined — TSV is flat; everything else casts to string."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f"`{f.name}`")
        if isinstance(f.dataType, Ty.ArrayType):
            cols.append(F.concat_ws(",", c.cast("array<string>")).alias(f.name))
        else:
            cols.append(c.cast("string").alias(f.name))
    (df.select(*cols).write.mode("overwrite")
       .option("sep", "\t").option("header", True)
       .option("compression", compression)
       .csv(path))
