"""Scaling probe for the round-3 join families: point-in-polygon (grid
equi-join + ray cast) and weighted SSSP (bounded Bellman-Ford).

PIP claim: candidate volume is O(points × local polygon density) — the
point side is blown up N×, the polygon side fixed, so time should grow
~linearly in N with rising throughput. SSSP claim: per-round cost is
O(edges); rounds fixed → time ~linear in edge count.

    python tools/geo_graph_scale_probe.py [factors ...]   # default 1 4 16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from etl_capnz_spark.operators.geometry import (  # noqa: E402
    parse_polygon,
    point_in_ring,
)
from etl_capnz_spark.operators.graph import sssp  # noqa: E402
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def points(cust, n_copies: int):
    parts = []
    for i in range(n_copies):
        def h(salt: str):
            basis = F.concat(
                F.lit(f"{salt}{i}"), F.col("c_custkey").cast("string")
            )
            return F.conv(F.substring(F.md5(basis), 1, 13), 16, 10).cast(
                "bigint"
            )

        lat = (h("plat") % 600000) / 10000.0 - 45.0
        lon = (h("plon") % 290000) / 10000.0 + 150.0
        parts.append(
            cust.select(
                (F.col("c_custkey") + i * 10_000_000).alias("station_id"),
                lon.alias("px"),
                lat.alias("py"),
                F.floor(lon).cast("int").alias("cx"),
                F.floor(lat).cast("int").alias("cy"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("geo-graph-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    cust = read_table(spark, sf_dir, "customer").select("c_custkey").cache()
    cust.count()
    rings = (
        entrymod.cap_alerts(spark, sf_dir)
        .select("k", F.posexplode("polygons").alias("poly_idx", "_ps"))
        .select("k", "poly_idx", parse_polygon(F.col("_ps")).alias("ring"))
        .filter(F.col("ring").isNotNull())
    )
    lons = F.transform("ring", lambda p: F.element_at(p, 1))
    lats = F.transform("ring", lambda p: F.element_at(p, 2))
    cells = rings.select(
        "k", "poly_idx", "ring",
        F.explode(
            F.sequence(
                F.floor(F.array_min(lons)).cast("int"),
                F.floor(F.array_max(lons)).cast("int"),
            )
        ).alias("cx"),
        F.sequence(
            F.floor(F.array_min(lats)).cast("int"),
            F.floor(F.array_max(lats)).cast("int"),
        ).alias("_cys"),
    ).select("k", "poly_idx", "ring", "cx", F.explode("_cys").alias("cy"))
    cells = cells.cache()
    n_cells = cells.count()

    pairs = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_quantity").cast("bigint").alias("w"))
    )
    p = F.concat(F.lit("p:"), F.col("l_partkey"))
    s = F.concat(F.lit("s:"), F.col("l_suppkey"))
    base_edges = pairs.select(p.alias("src"), s.alias("dst"), "w").unionByName(
        pairs.select(s.alias("src"), p.alias("dst"), "w")
    ).cache()
    n_edges = base_edges.count()
    seeds = spark.createDataFrame([("p:1",)], "node string")

    for n in factors:
        pts = points(cust, n).cache()
        n_pts = pts.count()
        # warmup
        pts.join(cells, ["cx", "cy"]).filter(
            point_in_ring(F.col("px"), F.col("py"), F.col("ring"))
        ).count()
        t0 = time.time()
        n_inside = pts.join(cells, ["cx", "cy"]).filter(
            point_in_ring(F.col("px"), F.col("py"), F.col("ring"))
        ).count()
        pip_dt = time.time() - t0
        print(
            f"pip factor={n} points={n_pts} poly_cells={n_cells} "
            f"inside={n_inside} seconds={pip_dt:.2f} "
            f"pts_per_sec={n_pts / pip_dt:.0f}",
            flush=True,
        )
        pts.unpersist()

    for n in factors:
        edges = base_edges
        for i in range(1, n):
            shifted = base_edges.select(
                F.concat(F.lit(f"g{i}_"), F.col("src")).alias("src"),
                F.concat(F.lit(f"g{i}_"), F.col("dst")).alias("dst"),
                "w",
            )
            edges = edges.unionByName(shifted)
        edges = edges.cache()
        ne = edges.count()
        sssp(edges, seeds, rounds=4).count()  # warmup
        t0 = time.time()
        nd = sssp(edges, seeds, rounds=4).count()
        dt = time.time() - t0
        print(
            f"sssp factor={n} edges={ne} reached={nd} seconds={dt:.2f} "
            f"edges_per_sec={ne / dt:.0f}",
            flush=True,
        )
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
