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
