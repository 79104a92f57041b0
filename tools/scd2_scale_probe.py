"""Measure scd2_apply cost vs dimension size (CAPACITY.md evidence).

Synthesizes an N-row SCD-2 dimension and a 1% CDC batch (0.5% changed,
0.25% identical no-op images, 0.25% brand-new keys), applies the merge,
and times the full materialization at N and 4N. The claim under test:
cost is ONE map-side pass over the current slice (broadcast joins only,
zero dimension-row shuffles), so time scales linearly in N and is
independent of batch ordering.

Usage: python tools/scd2_scale_probe.py [N]   (default 2_000_000)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_capnz_spark.session import get_session
from etl_capnz_spark.sinks.warehouse import scd2_apply


def run(spark, n: int) -> dict:
    dim = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("double").alias("bal"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias("seg"),
        F.lit("2024-01-01").cast("date").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    upd = (
        dim.filter(F.col("k") % 200 == 0)  # 0.5%: changed
        .select("k", (F.col("bal") + 1.0).alias("bal"), "seg")
        .unionByName(
            dim.filter(F.col("k") % 400 == 1).select("k", "bal", "seg")
        )  # 0.25%: identical image (no-op)
        .unionByName(
            spark.range(n, n + n // 400).select(
                F.col("id").alias("k"),
                F.lit(0.0).alias("bal"),
                F.lit("new").alias("seg"),
            )
        )  # 0.25%: brand-new keys
    )
    t0 = time.time()
    out = scd2_apply(dim, upd, "k", ["bal", "seg"], "2024-06-01")
    rows = out.count()
    wall = time.time() - t0
    return {"n_dim": n, "rows_out": rows, "wall_s": round(wall, 2),
            "dim_rows_per_s": int(n / wall)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_session("scd2probe", master="local[32]",
                        shuffle_partitions=32)
    run(spark, n)  # untimed JVM/codegen warmup (bench.py methodology)
    results = [run(spark, n), run(spark, 4 * n)]
    ratio = results[1]["wall_s"] / results[0]["wall_s"]
    print(json.dumps({"points": results, "t_4x_over_t_1x": round(ratio, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
