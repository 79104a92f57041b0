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


def delete_keys(
    spark,
    path: str,
    partition_cols: list[str],
    key_col: str,
    keys: DataFrame,
) -> dict:
    """Hard-delete rows by key (GDPR/right-to-erasure) touching ONLY the
    partitions that contain matching keys.

    Steps: (1) find affected partitions via a broadcast semi-join —
    driver state is the (bounded) list of partition values, never rows;
    (2) re-read ONLY those partitions (the IN-filter partition-prunes
    the scan), anti-join the keys out, dynamic-overwrite them back;
    (3) partitions whose every row matched produce no output — dynamic
    mode would silently leave the old files, so those directories are
    removed explicitly (a transactional table format does this step via
    its log; this sink is the no-table-format fallback, like the
    streaming manifest sink).

    Returns {"partitions_rewritten": n, "partitions_removed": m}.
    History partitions with no matching keys are untouched (verifiable
    by file mtime). Single partition column only — the layouts this
    repo writes.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    if len(partition_cols) != 1:
        raise ValueError("delete_keys supports exactly one partition column")
    pcol = partition_cols[0]
    data = spark.read.parquet(path)
    kdf = keys.select(key_col).distinct()
    affected = sorted(
        str(r[pcol])
        for r in data.join(F.broadcast(kdf), key_col, "left_semi")
        .select(pcol)
        .distinct()
        .collect()
    )
    if not affected:
        return {"partitions_rewritten": 0, "partitions_removed": 0}
    scoped = data.filter(F.col(pcol).cast("string").isin(affected))
    remaining = scoped.join(F.broadcast(kdf), key_col, "left_anti")
    survived = {
        str(r[pcol])
        for r in remaining.select(pcol).distinct().collect()
    }
    if survived:
        overwrite_partitions(
            remaining.filter(
                F.col(pcol).cast("string").isin(sorted(survived))
            ),
            path,
            partition_cols,
        )
    emptied = [p for p in affected if p not in survived]
    if emptied:
        # Resolve directories from the ACTUAL listing, not string
        # interpolation: Spark %XX-escapes special chars in partition dir
        # names (' ' → '%20'), so f"{pcol}={value}" can name a dir that
        # does not exist — with ignore_errors that was a silent GDPR
        # hard-delete failure (ADVICE r3). Listing + post-delete existence
        # check turns any miss into a loud error. os.listdir also fails
        # loudly for non-local paths rather than pretending to delete.
        import re

        def _unescape(name: str) -> str:
            return re.sub(
                r"%([0-9A-Fa-f]{2})",
                lambda m: chr(int(m.group(1), 16)),
                name,
            )

        prefix = f"{pcol}="
        dirs = {
            _unescape(d[len(prefix):]): os.path.join(path, d)
            for d in os.listdir(path)
            if d.startswith(prefix)
            and os.path.isdir(os.path.join(path, d))
        }
        missing = [p for p in emptied if p not in dirs]
        if missing:
            raise RuntimeError(
                f"GDPR delete: partition dirs not found for "
                f"{pcol} values {missing} under {path}"
            )
        for p in emptied:
            shutil.rmtree(dirs[p])
            if os.path.exists(dirs[p]):
                raise RuntimeError(
                    f"GDPR delete incomplete: {dirs[p]} still present"
                )
    return {
        "partitions_rewritten": len(survived),
        "partitions_removed": len(emptied),
    }
