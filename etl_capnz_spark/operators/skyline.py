"""2-D skyline (Pareto-dominance frontier) — north-star extension of
SURVEY.md §2.12's analytics family (the reference, task.ts, has no
multi-criteria operator; this is the classic "cheapest AND biggest"
OLAP shape: return every row no other row beats on BOTH axes).

Dominance (minimize ``x``, maximize ``y``): q dominates p iff
q.x <= p.x AND q.y >= p.y AND at least one is strict. The oracle IS the
O(n²) NOT EXISTS self-join; the plan here must never contain it.

Scalable shape — three bounded steps, no cartesian, no global window:

1. Collapse to the distinct-``x`` frontier candidates:
   ``groupBy(x).agg(max(y))`` — a map-side-combinable aggregate; the
   survivor test only ever needs the best ``y`` at each ``x``.
2. Prefix max of ``y`` over ascending ``x`` WITHOUT a one-partition
   window: the two-phase sharded scan of
   sampling.training_order_sharded / audit.histogram_equidepth —
   repartitionByRange on x (localCheckpoint pins ONE sampled
   partitioning across the two actions), per-shard maxima to the
   driver (n_shards rows, bounded), strictly-previous-shard prefix
   broadcast back as a CASE column, within-shard running max over a
   ROWS 1-preceding frame. Rows here are DISTINCT x values, already
   one aggregation smaller than the data.
3. A point survives iff its group max ``y`` strictly beats every
   strictly-cheaper group's best ``y`` (equality loses: the cheaper
   point is strict in x). Survivors are the frontier — tiny — so the
   join back to recover all tied original rows (exact duplicates are
   mutually non-dominating and ALL kept) broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_shards: int = 32,
) -> DataFrame:
    """Rows not dominated under (minimize ``x_col``, maximize
    ``y_col``). Output: (id_col, x_col, y_col)."""
    grouped = df.groupBy(x_col).agg(F.max(y_col).alias("_gmax"))
    # localCheckpoint pins ONE materialized range partitioning: the
    # per-shard maxima and the survivor filter are two ACTIONS, and
    # repartitionByRange re-samples bounds per execution (the
    # histogram_equidepth hazard).
    staged = (
        grouped.repartitionByRange(n_shards, F.col(x_col))
        .sortWithinPartitions(x_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    shard_max = {
        r["_pid"]: r["m"]
        for r in staged.groupBy("_pid").agg(F.max("_gmax").alias("m")).collect()
    }
    prefix, best = {}, None
    for pid in sorted(shard_max):
        prefix[pid] = best
        if best is None or shard_max[pid] > best:
            best = shard_max[pid]
    prefix_col = F.lit(None).cast("double")
    for pid, pre in sorted(prefix.items()):
        if pre is not None:
            prefix_col = F.when(
                F.col("_pid") == pid, F.lit(float(pre))
            ).otherwise(prefix_col)
    w = (
        Window.partitionBy("_pid")
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cheaper = F.greatest(
        F.max("_gmax").over(w).cast("double"), prefix_col
    )
    survivors = (
        staged.withColumn("_cheaper", cheaper)
        .filter(
            F.col("_cheaper").isNull()
            | (F.col("_gmax").cast("double") > F.col("_cheaper"))
        )
        # Fresh names break the self-join lineage (both sides descend
        # from the same scan — Spark rejects the ambiguous attributes
        # otherwise, observed on the parquet-backed entry).
        .select(F.col(x_col).alias("_sky_x"), F.col("_gmax").alias("_sky_y"))
    )
    return (
        df.join(
            F.broadcast(survivors),
            on=[
                F.col(x_col) == F.col("_sky_x"),
                F.col(y_col) == F.col("_sky_y"),
            ],
        )
        .select(id_col, x_col, y_col)
    )
