"""Partitioned-warehouse sink: day-partitioned tables with dynamic
partition overwrite — the standard lakehouse write pattern when no
transactional table format is available (the batch twin of
streaming/stream.py's manifest-logged sink).

``overwrite_partitions`` re-lands ONLY the partitions present in the
incoming batch (``partitionOverwriteMode=dynamic``): yesterday's late
data replaces yesterday's partition, history is untouched, and readers
prune to the partitions they filter on (PartitionFilters in the scan).
That triple — partition-scoped rewrite, untouched history, pruned
reads — is what makes a 100 TB fact table maintainable without MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Initial land: parquet partitioned by ``partition_cols``."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Replace ONLY the partitions present in ``df`` (dynamic mode);
    all other partitions are preserved. Restores the session's previous
    overwrite mode afterwards."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    finally:
        spark.conf.set(key, prev)
