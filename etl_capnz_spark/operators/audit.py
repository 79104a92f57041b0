"""Data-integrity auditing for large tables (north-star extension,
SURVEY.md §2.12): order-independent table fingerprints and snapshot
diffing — how a 100 TB pipeline answers "are these two copies identical?"
and "what changed between runs?" WITHOUT moving the data.

Both build on a deterministic per-row hash (md5 bits, the engine's
dialect-portable randomness — operators/sampling.py uses the same trick),
reduced with COMMUTATIVE aggregates (sum/count) so the result is
independent of partitioning, ordering, and engine. Two clusters each
compute their side's fingerprint locally and compare a handful of rows —
reconciliation traffic is O(groups), not O(data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash(*cols: Column) -> Column:
    """52-bit deterministic row hash over '|'-joined column values.

    NULL fields encode as the sentinel string 'NULL' so they still
    perturb the hash (a real "NULL" string collides — callers with that
    hazard pre-escape; none of the driver tables have it). 52 bits keep
    every value and modest sums exactly inside BIGINT on any engine.
    """
    joined = F.concat_ws(
        "|", *[F.coalesce(c.cast("string"), F.lit("NULL")) for c in cols]
    )
    return F.conv(F.substring(F.md5(joined), 1, 13), 16, 10).cast("bigint")


def table_fingerprint(
    df: DataFrame, group_col: str, *hash_cols: str
) -> DataFrame:
    """Per-group fingerprint: (n_rows, hash_sum, hash_min, hash_max).

    sum is the commutative reducer (order/partitioning-invariant); min
    and max catch the degenerate collisions a plain sum could mask. At
    sf100k rows the sum of 52-bit values stays far inside int64; at
    true 100 TB scale, group counts up to ~2^11 per group keep it exact
    too — beyond that, wrap-around is still deterministic and
    comparable, just no longer a sum (both sides wrap identically).
    """
    h = row_hash(*[F.col(c) for c in hash_cols])
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.sum(h).alias("hash_sum"),
        F.min(h).alias("hash_min"),
        F.max(h).alias("hash_max"),
    )


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    key_col: str,
    *value_cols: str,
) -> DataFrame:
    """Row-level diff of two snapshots of the same table: classify every
    key as added / removed / changed / unchanged.

    ONE full-outer equi-join on the key, comparing a per-side row hash —
    value payloads never cross the shuffle, only (key, hash). This is the
    CDC-reconciliation shape: at scale both sides pre-bucket on the key
    and the join is shuffle-free.
    """
    bh = before.select(
        F.col(key_col).alias("_k"),
        row_hash(*[F.col(c) for c in value_cols]).alias("_h_before"),
    )
    ah = after.select(
        F.col(key_col).alias("_k"),
        row_hash(*[F.col(c) for c in value_cols]).alias("_h_after"),
    )
    status = (
        F.when(F.col("_h_before").isNull(), F.lit("added"))
        .when(F.col("_h_after").isNull(), F.lit("removed"))
        .when(F.col("_h_before") != F.col("_h_after"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        bh.join(ah, "_k", "full_outer")
        .select(F.col("_k").alias(key_col), status.alias("change_type"))
    )
