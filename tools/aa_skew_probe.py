"""Skew probe for the Adamic-Adar wedge join (round 6): a planted hub
right-node of degree D emits C(D,2) wedges uncapped — the quadratic
hazard every wedge enumeration has. The max_degree cap must hold
emissions FLAT while the uncapped path grows ~D².

Graph: 2000 background parts of degree 3 (wedges 3·C(3,2)=3 each... 
C(3,2)=3 per part) plus ONE hub part shared by D suppliers.

Usage: python tools/aa_skew_probe.py [hub degrees ...]  # 100 400 1600
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.graph import adamic_adar_bipartite  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402


def wedge_count(spark, edges, max_degree):
    """Emitted wedge rows = sum over kept right nodes of C(deg, 2)."""
    deg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= max_degree)
    return (
        deg.filter(F.col("deg") > 1)
        .agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2))
        .collect()[0][0]
    )


def main() -> None:
    hubs = [int(a) for a in sys.argv[1:]] or [100, 400, 1600]
    spark = get_session("aa-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    bg = (
        spark.range(2000)
        .select(
            F.col("id").alias("p"),
            F.explode(
                F.array(F.lit(0), F.lit(1), F.lit(2))
            ).alias("slot"),
        )
        .select("p", (F.col("p") * 3 + F.col("slot")).alias("s"))
    )
    for d in hubs:
        hub = spark.range(d).select(
            F.lit(999999).alias("p"), (F.col("id") + 10_000_000).alias("s")
        )
        edges = bg.unionByName(hub).select("s", "p").cache()
        edges.count()
        for cap in (None, 50):
            t0 = time.time()
            out = adamic_adar_bipartite(
                edges, "s", "p", k=20, max_degree=cap
            )
            n_out = out.count()
            dt = time.time() - t0
            wedges = int(wedge_count(spark, edges, cap))
            print(
                f"hub={d} cap={cap} wedges_emitted={wedges} "
                f"topk_rows={n_out} seconds={dt:.2f}",
                flush=True,
            )
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
