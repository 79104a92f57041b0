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


def test_aqe_skew_join_splits_hot_partition(spark):
    """The UNPLANNED-skew safety net: with a 95%-hot join key, AQE's
    skew-join must split the hot partition at runtime (SortMergeJoin
    (skew=true) + AQEShuffleRead skewed in the FINAL adaptive plan) and
    the answer must equal the plain computation. Thresholds are lowered
    so the mechanism triggers on local data sizes; production keeps the
    defaults (256 MB) — same code path."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 100_000).select(
            F.when(F.col("id") % 20 != 0, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, 5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = fact.join(dim, "k")
        rows = j.collect()  # collect() finalizes THIS adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
        # answer unchanged by the split: hot key 0 = all non-multiples
        # of 20 PLUS id=0 itself (0 % 20 == 0 -> otherwise(id) = 0)
        n_hot = sum(1 for r in rows if r["k"] == 0)
        assert n_hot == (100_000 - 100_000 // 20) + 1
        n_cold = sum(1 for i in range(0, 100_000, 20) if 0 < i < 5_000)
        assert len(rows) == n_hot + n_cold
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
