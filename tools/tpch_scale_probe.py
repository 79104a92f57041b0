"""TPC-H scaling probe: run representative relational shapes (scan-agg,
join+top-k, multi-join profit) on synthetic Nx blow-ups of the fact
tables and report wall time per scale — evidence that the plans scale
linearly in input size (the 100 TB design claim, measured).

The blow-up unions key-shifted copies of lineitem/orders (orderkey +
i·10⁹), preserving join fan-out and key distribution — no skew is
introduced, so a super-linear curve would indict the PLAN, not the data.

Usage: python tools/tpch_scale_probe.py   # sf0.1 base, scales 1/2/4
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.session import get_session, read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(s) for s in os.environ.get("SPARK_GRAFT_SCALES", "1,2,4").split(",")]


def blow_up(df, key_cols, n):
    parts = []
    for i in range(n):
        part = df
        for kc in key_cols:
            part = part.withColumn(kc, F.col(kc) + F.lit(i * 1_000_000_000))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q1_shape(li):
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_discount"), F.count("*"))
    )


def q3_shape(li, orders):
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .orderBy(F.col("rev").desc())
        .limit(10)
    )


def q9_shape(li, orders, part, supp):
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("s_nationkey", F.year("o_orderdate"))
        .agg(F.sum(profit))
    )


def main():
    spark = get_session("tpch-scale-probe")
    li0 = read_table(spark, SF_DIR, "lineitem")
    orders0 = read_table(spark, SF_DIR, "orders")
    part = read_table(spark, SF_DIR, "part")
    supp = read_table(spark, SF_DIR, "supplier")
    base_rows = li0.count()
    out = {}
    for n in SCALES:
        li = blow_up(li0, ["l_orderkey"], n)
        orders = blow_up(orders0, ["o_orderkey"], n)
        t = {}
        for name, fn in [
            ("q1_scan_agg", lambda: q1_shape(li)),
            ("q3_join_topk", lambda: q3_shape(li, orders)),
            ("q9_multi_join", lambda: q9_shape(li, orders, part, supp)),
        ]:
            t0 = time.time()
            fn().collect()
            t[name] = round(time.time() - t0, 3)
        t["rows"] = base_rows * n
        t["rows_per_sec_q1"] = round(base_rows * n / t["q1_scan_agg"])
        out[str(n)] = t
    print(json.dumps({"metric": "tpch_scale_probe", "base_sf_rows": base_rows, "scales": out}))
    spark.stop()


if __name__ == "__main__":
    main()
