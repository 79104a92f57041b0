"""Interval sweep (max concurrency) + 2-D skyline pins."""
import datetime as dt
import random

from pyspark.sql import functions as F


def _mk_intervals(spark, rows):
    """rows: (key, start_second, dur_seconds) -> df with ts + dur col."""
    data = [
        (k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), d)
        for k, s, d in rows
    ]
    return spark.createDataFrame(
        data, "k long, ts timestamp, dur_s long"
    )


def _sweep(spark, rows):
    from etl_capnz_spark.operators.sessions import max_concurrency

    df = _mk_intervals(spark, rows)
    return {
        r["k"]: (r["max_concurrent"], r["ts_at_max"])
        for r in max_concurrency(
            df, "k", "ts", F.col("dur_s") * 1_000_000
        ).collect()
    }


EPOCH_US = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000


def test_max_concurrency_hand_case(spark):
    """Three overlapping + half-open boundary: [0,10) and [10,20) do
    NOT overlap; peak of 3 first reached at t=5."""
    got = _sweep(
        spark,
        [
            (1, 0, 10),   # [0,10)
            (1, 5, 10),   # [5,15)  -> overlap with first
            (1, 5, 3),    # [5,8)   -> peak 3 at t=5
            (1, 10, 10),  # [10,20) -> starts exactly at first's end
            (2, 0, 10),
            (2, 10, 5),   # half-open: never concurrent with the first
        ],
    )
    assert got[1] == (3, EPOCH_US + 5_000_000)
    assert got[2] == (1, EPOCH_US)


def test_max_concurrency_matches_brute_force(spark):
    """Random intervals: peak == brute count over start instants, and
    ts_at_max is the first start instant achieving it (a -1 never
    raises concurrency, so the peak is always attained at a start)."""
    rng = random.Random(42)
    rows = [
        (k, rng.randrange(0, 100), rng.randrange(1, 30))
        for k in (1, 2, 3)
        for _ in range(40)
    ]
    got = _sweep(spark, rows)
    for key in (1, 2, 3):
        ivals = [(s, s + d) for k, s, d in rows if k == key]
        starts = sorted({s for s, _ in ivals})
        conc = {
            t: sum(1 for s, e in ivals if s <= t < e) for t in starts
        }
        peak = max(conc.values())
        first = min(t for t in starts if conc[t] == peak)
        assert got[key] == (peak, EPOCH_US + first * 1_000_000)


def test_max_concurrency_partition_invariance(spark):
    rng = random.Random(7)
    rows = [
        (k, rng.randrange(0, 50), rng.randrange(1, 20))
        for k in (1, 2)
        for _ in range(30)
    ]
    from etl_capnz_spark.operators.sessions import max_concurrency

    df = _mk_intervals(spark, rows)
    dur = F.col("dur_s") * 1_000_000
    a = sorted(max_concurrency(df, "k", "ts", dur).collect())
    b = sorted(
        max_concurrency(df.repartition(7), "k", "ts", dur).collect()
    )
    assert a == b


def _brute_skyline(pts):
    """NOT EXISTS dominance: minimize x, maximize y, >=1 strict."""
    out = []
    for i, (px, py) in pts:
        dominated = any(
            (qx <= px and qy >= py and (qx < px or qy > py))
            for _, (qx, qy) in pts
        )
        if not dominated:
            out.append((i, px, py))
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    from etl_capnz_spark.operators.skyline import skyline_2d

    rng = random.Random(3)
    pts = [
        (i, (round(rng.uniform(0, 100), 2), rng.randrange(1, 50)))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts], "id long, x double, y long"
    )
    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in skyline_2d(df, "x", "y", "id").collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_keeps_exact_duplicates(spark):
    """Two identical points: neither dominates (no strict coordinate),
    both stay; a worse point at the same x is dominated."""
    from etl_capnz_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(1, 5.0, 10), (2, 5.0, 10), (3, 5.0, 9), (4, 4.0, 1)],
        "id long, x double, y long",
    )
    got = sorted(r["id"] for r in skyline_2d(df, "x", "y", "id").collect())
    assert got == [1, 2, 4]


def test_skyline_partition_invariance_and_no_cartesian(spark):
    from etl_capnz_spark.operators.skyline import skyline_2d

    rng = random.Random(11)
    pts = [
        (i, round(rng.uniform(0, 10), 1), rng.randrange(1, 10))
        for i in range(300)
    ]
    df = spark.createDataFrame(pts, "id long, x double, y long")
    a = sorted(map(tuple, skyline_2d(df, "x", "y", "id").collect()))
    b = sorted(
        map(tuple, skyline_2d(df.repartition(13), "x", "y", "id").collect())
    )
    assert a == b
    plan = skyline_2d(df, "x", "y", "id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
