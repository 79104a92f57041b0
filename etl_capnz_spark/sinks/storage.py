"""Storage-layout sinks: the write-side levers that decide 100 TB scan
performance.

* ``write_clustered`` — range-partition + sort-within-partitions on the
  cluster columns before writing parquet. Parquet keeps per-file and
  per-row-group min/max statistics; when the data is range-clustered,
  a reader's filter prunes whole files (PushedFilters never touches
  disk). This is THE difference between "scan 100 TB" and "scan the 40 GB
  that matches" for time- or key-ranged queries.
* ``write_training_shards`` — the pipeline endgame: pack documents into
  token-budget bins (operators/sampling.pack_sequences) and write one
  directory partition per shard, plus a manifest (shard → docs/tokens)
  computed from the same DataFrame, so trainers can schedule shards
  without listing files.

Both are plain DataFrame writers — every byte moves executor-side; the
driver only issues the jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Write parquet range-clustered on ``cluster_cols``.

    ``repartitionByRange`` samples the key distribution (one lightweight
    Spark job) and assigns contiguous key ranges to partitions, so file
    min/max stats are disjoint; the in-partition sort tightens row-group
    stats for row-group-level skipping too.
    """
    parts = [F.col(c) for c in cluster_cols]
    staged = (
        df.repartitionByRange(*([n_files] if n_files else []), *parts)
        .sortWithinPartitions(*parts)
    )
    staged.write.mode("overwrite").parquet(path)


def write_training_shards(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shard_col: str = "bin",
) -> DataFrame:
    """Write one directory partition per pre-assigned shard and return
    the manifest (shard → n_docs, n_tokens).

    Input rows already carry the shard assignment (from
    ``pack_sequences`` or any other binning); ``partitionBy`` routes each
    shard to its own directory in a single distributed write. The
    manifest is a 1-row-per-shard aggregate — compute it FROM THE SAME
    frame so it cannot drift from what was written.
    """
    docs.write.mode("overwrite").partitionBy(shard_col).parquet(path)
    return (
        docs.groupBy(shard_col)
        .agg(
            F.count(id_col).alias("n_docs"),
            F.sum(token_col).alias("n_tokens"),
        )
        .orderBy(shard_col)
    )


def z_value(x, y, bits: int = 16):
    """Morton/Z-order key: bit-interleave two non-negative int columns
    (x in even positions, y in odd). Range-clustering on z keeps rows
    close in BOTH dimensions close on disk, so a 2-D box predicate prunes
    files that 1-D clustering must read. Pure integer shifts — portable
    to any SQL dialect, no UDF.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        xbit = F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return z


def merge_aggregate_state(
    spark,
    batch: DataFrame,
    state_path: str,
    key_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental view maintenance for a distributive rollup: merge a
    new batch's partial aggregate into a persisted per-key state table —
    (count, sums) per key — WITHOUT recomputing history.

    The algebra: count and sum are distributive, so
    ``state ⊕ agg(batch)`` is a full-outer equi-join on the keys with
    coalesce-add, and the result equals aggregating all batches from
    scratch (pinned in tests/test_storage_jsonl.py). Only per-key
    aggregate rows move — the batch is pre-aggregated before touching
    state, and history is never re-read beyond the state table itself.
    At 100 TB the state lives bucketed on the keys so the merge join is
    shuffle-free; avg/ratios derive from (sum, count) at read time
    (store the pieces, not the quotient).

    Writes the merged state back (overwrite via a staging subdir +
    re-read, since parquet can't overwrite its own input in place) and
    returns the merged state DataFrame.
    """
    import os
    import shutil

    part = batch.groupBy(*key_cols).agg(
        F.count("*").alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
    agg_cols = ["n", *[f"sum_{c}" for c in sum_cols]]
    try:
        state = spark.read.parquet(state_path)
        merged = (
            state.select(
                *key_cols, *[F.col(c).alias(f"_s_{c}") for c in agg_cols]
            )
            .join(part, key_cols, "full_outer")
            .select(
                *key_cols,
                *[
                    (
                        F.coalesce(F.col(f"_s_{c}"), F.lit(0))
                        + F.coalesce(F.col(c), F.lit(0))
                    ).alias(c)
                    for c in agg_cols
                ],
            )
        )
    except Exception:
        merged = part
    staging = state_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    os.rename(staging, state_path)
    return spark.read.parquet(state_path)
