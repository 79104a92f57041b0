"""Edge cases for the as-of join and bucketed range join operators."""

import datetime

from pyspark.sql import functions as F

from etl_capnz_spark.operators.asof import asof_join
from etl_capnz_spark.operators.rangejoin import range_join_count


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _left(spark, rows):
    return spark.createDataFrame(rows, "lid int, key int, ts timestamp")


def _right(spark, rows):
    return spark.createDataFrame(rows, "key int, ts timestamp, v double")


def test_asof_basic_backward(spark):
    left = _left(spark, [(1, 7, _ts("2026-01-01 10:00:00"))])
    right = _right(
        spark,
        [
            (7, _ts("2026-01-01 09:00:00"), 1.0),
            (7, _ts("2026-01-01 09:30:00"), 2.0),
            (7, _ts("2026-01-01 11:00:00"), 9.0),  # future: excluded
        ],
    )
    out = asof_join(left, right, on="ts", by="key", value_cols=["v"]).collect()
    assert out[0]["asof_v"] == 2.0


def test_asof_exact_tie_included(spark):
    left = _left(spark, [(1, 7, _ts("2026-01-01 10:00:00"))])
    right = _right(spark, [(7, _ts("2026-01-01 10:00:00"), 5.0)])
    out = asof_join(left, right, on="ts", by="key", value_cols=["v"]).collect()
    assert out[0]["asof_v"] == 5.0  # right.ts == left.ts matches (<=)


def test_asof_no_match_is_null(spark):
    left = _left(spark, [(1, 7, _ts("2026-01-01 10:00:00"))])
    right = _right(spark, [(8, _ts("2026-01-01 09:00:00"), 1.0)])  # other key
    out = asof_join(left, right, on="ts", by="key", value_cols=["v"]).collect()
    assert out[0]["asof_v"] is None


def test_asof_multiple_left_share_one_right(spark):
    left = _left(
        spark,
        [
            (1, 7, _ts("2026-01-01 10:00:00")),
            (2, 7, _ts("2026-01-01 12:00:00")),
        ],
    )
    right = _right(spark, [(7, _ts("2026-01-01 09:00:00"), 3.0)])
    out = {
        r["lid"]: r["asof_v"]
        for r in asof_join(left, right, on="ts", by="key", value_cols=["v"]).collect()
    }
    assert out == {1: 3.0, 2: 3.0}


def test_range_join_window_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2026-01-01 10:00:00"))], "event_id int, key int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2026-01-01 09:50:00")),  # exactly window start: EXCLUDED (>)
            (7, _ts("2026-01-01 09:50:01")),  # inside
            (7, _ts("2026-01-01 10:00:00")),  # exactly left ts: included (<=)
            (7, _ts("2026-01-01 10:00:01")),  # future: excluded
        ],
        "key int, ts timestamp",
    )
    out = range_join_count(left, right, key="key", ts="ts", window_seconds=600)
    assert out.collect()[0]["n_in_window"] == 2


def test_range_join_zero_matches(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2026-01-01 10:00:00"))], "event_id int, key int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(8, _ts("2026-01-01 10:00:00"))], "key int, ts timestamp"
    )
    out = range_join_count(left, right, key="key", ts="ts", window_seconds=600)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_in_window"] == 0

def test_cogroup_asof_equals_expression_form(spark, sf_dir):
    """The cogrouped-pandas as-of (merge_asof per key) must return
    exactly the expression form's answer — same nulls for unmatched
    rows, same tie handling on this data."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.asof import asof_join, cogroup_asof_join
    from etl_capnz_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    cols = ["event_id", "user_id", "ts", "asof_ts", "asof_value"]
    a = sorted(
        map(
            tuple,
            asof_join(
                clicks, views, on="ts", by="user_id", value_cols=["ts", "value"]
            )
            .select(*cols)
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            cogroup_asof_join(
                clicks, views, on="ts", by="user_id", value_cols=["ts", "value"]
            )
            .select(*cols)
            .collect(),
        )
    )
    assert a == b and len(a) > 0


def test_asof_tied_right_rows_deterministic(spark):
    """ADVICE r2: multiple right rows at the SAME timestamp in one by-
    group — both forms must deterministically pick the max-payload row
    (the full-column sort order of the pandas path), regardless of
    partition/plan order."""
    from etl_capnz_spark.operators.asof import cogroup_asof_join

    left = _left(spark, [(1, 7, _ts("2026-01-01 10:00:00"))])
    right = _right(
        spark,
        [
            (7, _ts("2026-01-01 09:00:00"), 3.0),
            (7, _ts("2026-01-01 09:00:00"), 1.0),
            (7, _ts("2026-01-01 09:00:00"), 2.0),
        ],
    ).repartition(4)  # scatter the ties across partitions
    expr = asof_join(left, right, on="ts", by="key", value_cols=["v"]).collect()
    pand = cogroup_asof_join(
        left, right, on="ts", by="key", value_cols=["v"]
    ).collect()
    assert expr[0]["asof_v"] == 3.0
    assert pand[0]["asof_v"] == 3.0
