"""Salted aggregation / salted join correctness (operators/skew.py)."""

from pyspark.sql import functions as F

from etl_capnz_spark.operators.skew import (
    explode_hot_dim,
    salted_agg,
    with_salted_key,
)


def test_salted_agg_matches_plain(spark, sf_dir):
    from etl_capnz_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): (r["n"], r["total"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], round(r["total"], 6), r["mx"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {"n": ("count", "*"), "total": ("sum", "value"), "mx": ("max", "value")},
        )
        .withColumn("total", F.round("total", 6))
        .collect()
    }
    # float sums may differ in the last ulps across grouping orders —
    # compare at 6 decimals (values ~1e4)
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-4
        assert plain[k][2] == salted[k][2]


def test_salted_join_matches_plain(spark, sf_dir):
    from etl_capnz_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    hot = [r["c_custkey"] for r in customer.limit(2).collect()]

    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey")
        .count()
    )
    fact = with_salted_key(orders, "o_custkey", hot)
    dim = explode_hot_dim(customer, "c_custkey", hot)
    salted = (
        fact.join(dim, fact.o_custkey_salted == dim.c_custkey_salted)
        .groupBy("c_custkey")
        .count()
    )
    assert {(r["c_custkey"], r["count"]) for r in plain.collect()} == {
        (r["c_custkey"], r["count"]) for r in salted.collect()
    }
