"""Output sinks: JSON / CSV export with the reference's sanitization.

Reference surface: src/export/bom_exporter.cc —
- ExportToJSON (:154-219): pretty JSON with non-printable sanitization
  (:16-28 keep 0x20-0x7E, map \\n/\\t -> space, drop the rest);
- ExportToCSV (:221-259): quoted CSV of part/qty/drawings/props;
- ExportDimensions (:261-285): handle/type/value/text/layer/drawing CSV.

Spark mapping (SURVEY A6-A8, F9): `df.write.json` / `df.write.csv` with
a column-level sanitize expression. Writers are distributed (one file
per partition); `single_file=True` coalesces for small exports where a
single artifact is wanted (driver-sized data only — never at corpus
scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sanitize_ascii(col: Column | str) -> Column:
    """Keep printable ASCII 0x20-0x7E; newlines/tabs become spaces, other
    bytes are dropped (reference: bom_exporter.cc:16-28)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, r"[\n\t\r]", " "), r"[^\x20-\x7E]", ""
    )


def _sanitized(df: DataFrame) -> DataFrame:
    cols = [
        sanitize_ascii(f.name).alias(f.name) if f.dataType.typeName() == "string" else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines export with string sanitization (A6)."""
    out = _sanitized(df)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Quoted CSV export with header + sanitization (A7/A8; reference
    quotes every field, bom_exporter.cc:230-240 -> quoteAll)."""
    out = _sanitized(df)
    if single_file:
        out = out.coalesce(1)
    # escape='"' -> RFC-4180 doubled quotes (Spark defaults to backslash)
    out.write.mode("overwrite").option("header", True).option("quoteAll", True).option(
        "escape", '"'
    ).csv(path)
