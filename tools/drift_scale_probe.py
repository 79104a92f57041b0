"""Scaling probe for the round-6 drift/eval operators whose plans
contain a single-partition window (ks_test, spearman_corr,
lift_gains): the window runs on the DISTINCT-VALUE table, so its cost
is bounded by the value DOMAIN (cents units), not the row count —
blowing up the events table Nx must grow only the map-side collapse,
and wall time should stay near-flat while rows grow 16x.

Usage: python tools/drift_scale_probe.py [factors ...]  # 1 4 16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.mlmetrics import (  # noqa: E402
    ks_test,
    lift_gains,
    spearman_corr,
)
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("drift-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )

    for n in factors:
        parts = [
            ev.select(
                (F.col("event_id") + i * 100_000_000).alias("event_id"),
                (F.col("user_id") + i * 1_000_000).alias("user_id"),
                "event_type",
                "value",
            )
            for i in range(n)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big = big.repartition(32).cache()
        n_rows = big.count()
        cents = F.round(F.col("value") * 100).cast("bigint")

        def run():
            a = big.filter(F.col("event_type") == "purchase").select(
                cents.alias("c")
            )
            b = big.filter(F.col("event_type") == "click").select(
                cents.alias("c")
            )
            ks_test(a, b, "c").collect()
            per_user = big.groupBy("user_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("x"),
                F.sum(cents).alias("y"),
            )
            spearman_corr(per_user, "x", "y").collect()
            lift_gains(
                big.select(
                    cents.alias("s"),
                    (F.col("event_type") == "purchase")
                    .cast("int")
                    .alias("y"),
                ),
                "s",
                "y",
            ).collect()

        run()  # warmup
        t0 = time.time()
        run()
        dt = time.time() - t0
        print(
            f"factor={n} rows={n_rows} seconds={dt:.2f} "
            f"rows_per_sec={n_rows / dt:.0f}",
            flush=True,
        )
        big.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
