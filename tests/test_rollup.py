"""Incremental rollup algebra (operators/rollup.py): the merge must be
exactly the full recompute for ANY split of the fact table, and
key-disjoint merges must union."""

from pyspark.sql import functions as F

from etl_capnz_spark.operators.rollup import (
    merge_rollups,
    partial_rollup,
    rollup_with_avg,
)
from etl_capnz_spark.session import read_table

KEYS = ["day", "event_type"]


def _ev(spark, sf_dir):
    return read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value", "user_id"
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_full_recompute_any_split(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    full = partial_rollup(ev, KEYS)
    for split in (
        F.col("user_id") % 2 == 0,      # interleaved keys on both sides
        F.dayofmonth("day") <= 5,       # mostly-empty old side
        F.lit(False),                   # degenerate: everything is "new"
    ):
        merged = merge_rollups(
            partial_rollup(ev.filter(split), KEYS),
            partial_rollup(ev.filter(~split), KEYS),
            KEYS,
        )
        assert _sorted_rows(merged) == _sorted_rows(full)


def test_merge_is_associative(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    a = partial_rollup(ev.filter("user_id % 3 = 0"), KEYS)
    b = partial_rollup(ev.filter("user_id % 3 = 1"), KEYS)
    c = partial_rollup(ev.filter("user_id % 3 = 2"), KEYS)
    left = merge_rollups(merge_rollups(a, b, KEYS), c, KEYS)
    right = merge_rollups(a, merge_rollups(b, c, KEYS), KEYS)
    assert _sorted_rows(left) == _sorted_rows(right)


def test_avg_is_exact_from_cents(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    out = rollup_with_avg(partial_rollup(ev, KEYS), KEYS).collect()
    for r in out:
        assert r["avg_value"] == round(r["sum_cents"] / r["n"] / 100.0, 6)


def test_delta_join_view_equals_recompute_and_term_disjointness(spark):
    """The delta rule must reproduce the full join EXACTLY (row
    multiset, not just set — a doubled provenance term would inflate
    counts), on a planted case where every term is non-empty and a key
    appears on both sides of both walls."""
    from collections import Counter

    from etl_capnz_spark.operators.rollup import delta_join_view

    a_rows = [(i, f"a{i}", i % 4) for i in range(40)]       # (id, pay, k)
    b_rows = [(k, f"b{k}-{j}") for k in range(4) for j in range(3)]
    a = spark.createDataFrame(a_rows, "id long, pay string, k long")
    b = spark.createDataFrame(b_rows, "k long, bv string")
    a_old, d_a = a.filter("id < 25"), a.filter("id >= 25")
    b_old, d_b = b.filter("bv NOT LIKE '%-2'"), b.filter("bv LIKE '%-2'")
    delta = delta_join_view(a_old, d_a, b_old, d_b, ["k"])
    got = Counter(
        (r["id"], r["bv"])
        for r in a_old.join(b_old, ["k"]).unionByName(delta).collect()
    )
    want = Counter((r["id"], r["bv"]) for r in a.join(b, ["k"]).collect())
    assert got == want
    assert len(want) == 40 * 3 and max(want.values()) == 1


def test_delta_join_view_broadcasts_deltas(spark):
    """The two delta-driven joins against history must be broadcast
    joins (the big side never shuffles); with broadcast_deltas=False
    the hint must be absent."""
    from etl_capnz_spark.operators.rollup import delta_join_view

    a = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    b = spark.range(70).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("bv")
    )
    d = delta_join_view(
        a.filter("id < 900"), a.filter("id >= 900"),
        b.filter("bv < 60"), b.filter("bv >= 60"), ["k"],
    )
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
