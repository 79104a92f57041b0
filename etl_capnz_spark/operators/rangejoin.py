"""Bucketed range join — the scalable form of an interval/time-range join.

Spark turns a raw inequality join (``a.ts BETWEEN b.ts - W AND b.ts``) into
a broadcast nested loop or a cartesian product — O(n·m) at 100 TB. The
standard rewrite buckets time into width-W cells: a row can only match rows
in its own or the adjacent bucket, so an EQUI-join on (key, bucket) ∪
(key, bucket−1) followed by the exact range filter produces the same rows
with hash-join cost. Fan-out is exactly 2× on one side; the equi-join is
AQE/skew-eligible like any other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    window_seconds: int = 600,
) -> DataFrame:
    """For every left row: count right rows with the same ``key`` whose
    ``ts`` lies in ``(left.ts - window, left.ts]``.

    Output: all left columns + ``n_in_window`` (0 when none).
    """
    w_us = window_seconds * 1_000_000
    l = left.withColumn("_us", F.unix_micros(F.col(ts)))
    r = right.select(
        F.col(key).alias("_rkey"), F.unix_micros(F.col(ts)).alias("_rus")
    )
    # left probes its own and the previous bucket
    l = l.withColumn("_bucket", F.explode(
        F.array(
            (F.col("_us") / w_us).cast("long"),
            (F.col("_us") / w_us).cast("long") - 1,
        )
    ))
    r = r.withColumn("_bucket", (F.col("_rus") / w_us).cast("long"))
    joined = l.join(
        r,
        (F.col(key) == F.col("_rkey")) & (l["_bucket"] == r["_bucket"]),
        "left",
    ).filter(
        F.col("_rus").isNull()
        | (
            (F.col("_rus") > F.col("_us") - F.lit(w_us))
            & (F.col("_rus") <= F.col("_us"))
        )
    )
    out_cols = [c for c in left.columns]
    return (
        joined.groupBy(*out_cols)
        .agg(F.count(F.col("_rus")).alias("n_in_window"))
    )
