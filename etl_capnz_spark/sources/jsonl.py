"""JSONL document source with per-record error isolation.

Training corpora land as JSON-lines; one mangled record must never kill a
100 TB ingest. This is the source-level twin of the reference's
per-record try/continue (T8, task.ts:632-634): PERMISSIVE mode parses
what it can, routes the raw text of failed lines into a corrupt-record
column, and the caller splits good from bad — both sides stay DataFrames
(the bad rows feed a quarantine sink, not an exception).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` with ``schema`` (DDL string), returning
    ``(good, quarantine)``.

    The corrupt column must be declared in the read schema for PERMISSIVE
    mode to populate it, and Spark refuses corrupt-column-only queries on
    the raw scan — the cache satisfies that (and keeps this a single
    physical read for the common ingest-batch size). At true 100 TB the
    quarantine side is a SECOND scan instead of a cache
    (``.json(path)`` again, filter not-null): corrupt rows are rare, the
    rescan is cold-storage-cheap, and nothing pins executor memory.
    """
    full_schema = f"{schema}, {CORRUPT_COL} STRING"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()  # Spark disallows corrupt-col-only queries on the raw scan
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, quarantine
