"""Probe: the sharded-rank discipline at an UNQUANTIZED 1e7-distinct
domain — the regime where the r6 verdict's CAPACITY §19 claim was thin.

CAPACITY §19 measured the scorer/drift family FLAT to 16× growth
because the entries quantize to cents, collapsing the window input to
a small distinct-value DOMAIN. The standing `weak` was: feed raw
unquantized scores (domain ≈ rows) and the old single-partition
Window.orderBy becomes one core sorting the whole domain. Round 7
ported the family (auc_exact, ks_test, spearman, lift_gains,
conformal, bh_fdr, mann_whitney) onto operators/rank.py cumsum_sharded
— range shards + per-shard windows + broadcast offsets. This probe
measures exactly the thin spot:

1. domain = N DISTINCT values (every row unique — zero collapse), so
   the old shape would funnel all N through ONE partition's sort;
2. runs auc_exact end-to-end and records wall time;
3. records the per-shard row distribution of the staged range
   partitioning — the artifact the verdict asked for: no single
   partition ever receives more than ~domain/n_shards rank rows;
4. runs the same computation through a deliberately single-partition
   window (the pre-r7 shape) for the wall-time comparison, and checks
   the two AUCs are bit-identical;
5. at TWO scale points (1e7, 4e7) so the TREND is measured, not
   argued: the sharded form pays a roughly scale-linear checkpoint
   premium, while the single-partition form's one-core sort grows
   superlinearly and its peak memory is the whole domain on one task
   — the thing that dies first on a real executor.

Writes rank_shard_probe.json at the repo root.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_capnz_spark.session import get_session
from etl_capnz_spark.operators.mlmetrics import auc_exact
from etl_capnz_spark.operators.rank import staged_range

SCALES = [10_000_000, 40_000_000]


def probe(spark, n: int) -> dict:
    # Unquantized worst case: every score distinct (a bijective affine
    # scramble of id), label correlated with score so AUC is
    # non-trivial. Deterministic: no RNG, no Date.now.
    df = (
        spark.range(0, n, 1, 32)
        .select(
            ((F.col("id") * 2654435761) % F.lit(n * 10)).alias("score"),
            (
                (F.col("id") % 97 < 48)
                == (((F.col("id") * 2654435761) % F.lit(n * 10)) > n * 5)
            )
            .cast("int")
            .alias("y"),
        )
        .persist()
    )
    df.count()

    out = {"n_rows": n, "n_distinct": n}

    # per-shard distribution of the staged range partitioning
    staged = staged_range(
        df.groupBy(F.col("score").alias("_v")).agg(
            F.count(F.lit(1)).alias("n")
        ),
        [F.col("_v").asc()],
    )
    shard_rows = [
        r["n"]
        for r in staged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    ]
    out["n_shards"] = len(shard_rows)
    out["max_shard_rows"] = max(shard_rows)
    out["min_shard_rows"] = min(shard_rows)
    staged.unpersist()

    # sharded auc_exact end-to-end
    t0 = time.time()
    r_sharded = auc_exact(df, "score", "y").collect()[0]
    out["sharded_auc_sec"] = round(time.time() - t0, 2)
    out["auc"] = r_sharded["auc"]

    # the pre-r7 single-partition shape, same arithmetic (inline copy
    # of the old window form), for the honest comparison
    t0 = time.time()
    vals = (
        df.select(
            F.col("score").cast("bigint").alias("_v"),
            F.col("y").cast("int").alias("_y"),
        )
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("npos"))
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "lt", F.coalesce(F.sum("n").over(w), F.lit(0))
    ).withColumn("r2", 2 * F.col("lt") + F.col("n") + 1)
    pd_ = F.col("npos").cast("decimal(19,0)")
    agg = ranked.agg(
        F.sum("npos").alias("n_pos"),
        F.sum(F.col("n") - F.col("npos")).alias("n_neg"),
        F.sum(pd_ * F.col("r2").cast("decimal(19,0)")).alias("_r2p"),
    ).collect()[0]
    out["single_partition_sec"] = round(time.time() - t0, 2)
    auc_old = round(
        (
            float(agg["_r2p"])
            - float(agg["n_pos"]) * (float(agg["n_pos"]) + 1.0)
        )
        / (2.0 * float(agg["n_pos"]) * float(agg["n_neg"])),
        6,
    )
    out["auc_single_partition"] = auc_old
    out["bit_identical"] = auc_old == r_sharded["auc"]
    df.unpersist()
    return out


def main() -> None:
    spark = get_session("rank-shard-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"scales": [probe(spark, n) for n in SCALES]}
    a, b = out["scales"]
    out["growth_x"] = round(b["n_rows"] / a["n_rows"], 1)
    out["sharded_wall_x"] = round(
        b["sharded_auc_sec"] / a["sharded_auc_sec"], 2
    )
    out["single_partition_wall_x"] = round(
        b["single_partition_sec"] / a["single_partition_sec"], 2
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rank_shard_probe.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
