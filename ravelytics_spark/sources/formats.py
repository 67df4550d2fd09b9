"""Format breadth: declarative-schema CSV and JSONL readers with the
dead-letter (corrupt-record quarantine) contract, plus ORC/CSV/JSON
round-trip writers.

The reference ingests exactly one wire shape (JSON arrays → JSONEachRow
→ ClickHouse); an engine that replaces it meets data where it lives.
Two rules everything here follows:

1. **Schema is declared, never inferred, in production paths** —
   inference is a full extra pass over the data (fatal at 100 TB) and
   can silently flip types between runs. Every reader takes a DDL
   string or StructType.
2. **Bad rows are data, not exceptions**: PERMISSIVE parsing keeps
   malformed rows in ``_corrupt_record``; ``split_corrupt`` forks the
   stream into (clean, quarantine) so ingest never dies on one bad
   line and the quarantine is auditable — the dead-letter pattern
   (maintenance.py applies the same idea to semantic cleansing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """PERMISSIVE CSV with declared schema + corrupt-record capture.

    The schema string must NOT include the corrupt column; it is
    appended here. Multiline quoted fields are on (RFC-4180), which
    costs per-file parallelism only for files that actually contain
    quoted newlines.
    """
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines with declared schema + corrupt capture.

    Deliberately NOT the native json reader's corrupt-column option:
    Spark forbids plans that reference only ``_corrupt_record`` on raw
    JSON (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which breaks the obvious
    ``quarantine.count()``. Reading as text + ``from_json`` sidesteps
    the restriction with the same scan cost (one pass, parse as an
    expression), and the corrupt column lives INSIDE the from_json
    output schema, where permissive parsing fills it for malformed
    lines exactly as the native reader would.
    """
    raw = spark.read.text(path).filter(F.trim("value") != "")
    parsed = raw.select(
        F.from_json(
            "value",
            f"{schema}, {CORRUPT_COL} string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__r")
    )
    return parsed.select("__r.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, quarantine rows).

    Spark refuses a query that only references ``_corrupt_record``
    (the raw line exists only while parsing fails), so both forks keep
    the full row; the quarantine keeps the raw line for replay after a
    schema fix.
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """One writer for parquet/orc/csv/json. ORC and parquet carry the
    schema and compress columnar (either is a fine warehouse format —
    ORC slots in where the ecosystem prefers it); csv/json are
    interchange-only (no types, row-oriented: document as exports,
    never as the warehouse)."""
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def round_trip_check(
    spark: SparkSession, df: DataFrame, path: str, fmt: str, schema: str
) -> bool:
    """Write → read back → compare (count + canonical sort) — the
    self-check a format migration runs before switching readers."""
    write_table(df, path, fmt=fmt)
    if fmt == "csv":
        back = read_csv(spark, path, schema)
        back, _ = split_corrupt(back)
    elif fmt == "json":
        back = read_jsonl(spark, path, schema)
        back, _ = split_corrupt(back)
    else:
        back = spark.read.format(fmt).load(path)
    cols = sorted(df.columns)
    a = df.select(*cols).orderBy(*cols).collect()
    b = back.select(*cols).orderBy(*cols).collect()
    return a == b
