"""Scaling probe for clustering_coefficients (degree-ordered triangle
counting): the claim is that wedge enumeration is bounded by the
ORIENTED out-degrees (sum outdeg^2 <= O(m^1.5)), not the raw degrees
(sum deg^2, unbounded under skew) — so (a) wall time grows near-
linearly in edge count on the natural co-order graph across sf dirs,
and (b) a PLANTED star hub (degree D) adds ~zero wedges, because all
D of its edges orient INTO it (a degree-1 neighbor precedes the hub in
every (degree, node) comparison) where a naive apex-at-hub enumeration
would emit C(D, 2).

    python tools/triangle_scale_probe.py   # writes triangle_scale_probe.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.graph import (  # noqa: E402
    clustering_coefficients,
)
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def co_order_edges(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    pl = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    return (
        pl.alias("x")
        .join(pl.alias("y"), "o")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
    )


def main():
    spark = get_session(
        "triangle-probe",
        master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"natural": [], "hub": {}}

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        edges = co_order_edges(spark, sf_dir)
        m = (
            edges.select(
                F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
            )
            .distinct()
            .count()
        )
        t0 = time.time()
        res = clustering_coefficients(edges)
        n_tri = res.agg(
            (F.sum("triangles") / 3).cast("bigint").alias("t")
        ).collect()[0]["t"]
        wall = time.time() - t0
        out["natural"].append(
            {"sf": sf, "edges": m, "triangles": int(n_tri), "wall_s": round(wall, 2)}
        )
        print(out["natural"][-1], flush=True)

    # planted hub: background ring graph (10k nodes, each linked to
    # +1 and +2 -> 10k triangles) plus a degree-D star center
    for D in (0, 1000, 10000, 100000):
        n = 10_000
        ring = spark.range(n).select(
            F.col("id").alias("u"), ((F.col("id") + 1) % n).alias("v")
        ).unionByName(
            spark.range(n).select(
                F.col("id").alias("u"), ((F.col("id") + 2) % n).alias("v")
            )
        )
        hub = spark.range(D).select(
            F.lit(2_000_000).alias("u"), (F.col("id") + 1_000_000).alias("v")
        )
        edges = ring.unionByName(hub) if D else ring
        t0 = time.time()
        total = (
            clustering_coefficients(edges)
            .agg((F.sum("triangles") / 3).cast("bigint").alias("t"))
            .collect()[0]["t"]
        )
        wall = time.time() - t0
        out["hub"][str(D)] = {
            "triangles": int(total),
            "wall_s": round(wall, 2),
        }
        print(D, out["hub"][str(D)], flush=True)

    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "triangle_scale_probe.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
