"""Ordered funnel + weekly cohort retention (operators/funnel.py)."""

from datetime import datetime

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_strict_ordering(spark):
    """A later step only counts STRICTLY AFTER the previous step's
    earliest qualifying time: purchase-before-view users don't
    convert, same-timestamp doesn't convert, and the earliest view
    (not any view) anchors the chain."""
    from etl_capnz_spark.operators.funnel import funnel

    rows = [
        # u1: view d1 -> click d2 -> purchase d3: full conversion
        (1, 1, 0, "view"), (1, 2, 0, "click"), (1, 3, 0, "purchase"),
        # u2: purchase BEFORE view: stops at step 1
        (2, 5, 0, "purchase"), (2, 6, 0, "view"),
        # u3: click at the SAME instant as view: strict > excludes it
        (3, 1, 0, "view"), (3, 1, 0, "click"),
        # u4: never viewed: not even step 1
        (4, 1, 0, "click"), (4, 2, 0, "purchase"),
        # u5: view d4, click d2 (before) and d5 (after) -> counts via d5
        (5, 4, 0, "view"), (5, 2, 0, "click"), (5, 5, 0, "click"),
    ]
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
    }
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_anchors_on_earliest_qualifying_time(spark):
    """The chain uses the EARLIEST qualifying time per level, so a
    user is never penalized for an extra late event: view d1,
    click d2 and d9, purchase d3 must convert (via the d2 click)."""
    from etl_capnz_spark.operators.funnel import funnel

    rows = [
        (1, 1, 0, "view"), (1, 2, 0, "click"), (1, 9, 0, "click"),
        (1, 3, 0, "purchase"),
    ]
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        ).collect()
    }
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_retention_offset_zero_equals_cohort_size(spark, sf_dir):
    """Offset-0 of every cohort equals the cohort's size (everyone is
    active in their own first week), and every offset count is <= the
    cohort size."""
    from etl_capnz_spark.operators.funnel import retention_cohorts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = retention_cohorts(ev, "user_id", "ts").collect()
    size = {
        r["cohort_week"]: r["n_users"]
        for r in rows
        if r["week_offset"] == 0
    }
    cohorts = {
        r["cohort_week"]: r["n_users"]
        for r in ev.groupBy("user_id")
        .agg(
            F.date_trunc("week", F.min("ts")).cast("date").alias("cw")
        )
        .groupBy("cw")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .withColumnRenamed("cw", "cohort_week")
        .collect()
    }
    assert size == cohorts
    for r in rows:
        assert r["n_users"] <= size[r["cohort_week"]]
        assert r["week_offset"] >= 0


def test_sequence_match_semantics(spark):
    """CEP pins: B matches the MOST RECENT A before it; a blocker
    strictly between kills the match; a blocker at exactly A's
    timestamp does NOT (strictness); a blocker BEFORE A is harmless;
    the within window rejects; B without a prior A never matches."""
    from etl_capnz_spark.operators.sessions import sequence_match

    rows = [
        # u1: A(d1) C(d2) B(d3): blocked
        (1, 1, 1, "A"), (1, 2, 2, "C"), (1, 3, 3, "B"),
        # u2: C(d1) A(d2) B(d3): blocker before A -> match, a=d2
        (2, 4, 1, "C"), (2, 5, 2, "A"), (2, 6, 3, "B"),
        # u3: A(d1) A(d2) B(d3): most recent A (d2) anchors
        (3, 7, 1, "A"), (3, 8, 2, "A"), (3, 9, 3, "B"),
        # u4: B(d1) A(d2): no prior A -> no match
        (4, 10, 1, "B"), (4, 11, 2, "A"),
        # u5: A(d1) B(d20): outside within=10 days
        (5, 12, 1, "A"), (5, 13, 20, "B"),
        # u6: A and C at the SAME ts, B later: C not strictly between
        (6, 14, 1, "A"), (6, 15, 1, "C"), (6, 16, 2, "B"),
    ]
    import datetime as dt

    data = [
        (u, i, dt.datetime(2024, 1, d), t) for u, i, d, t in rows
    ]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {
        (r["user_id"], r["first_ts"].day, r["then_ts"].day)
        for r in sequence_match(
            df, "user_id", "ts", "event_id", "event_type",
            first="A", then="B", not_between="C",
            within_seconds=10 * 86400,
        ).collect()
    }
    assert got == {(2, 2, 3), (3, 2, 3), (6, 1, 2)}


def test_attribution_hand_case(spark):
    """u1: click(1) view(2) purchase(3) click(4) purchase(5):
    touches 1,2 -> conv3 (first=click,last=view); touch 4 -> conv5
    (first=last=click). u2: view(1) purchase(40d later): outside
    lookback. u3: click at SAME ts as purchase but higher id -> the
    purchase sorts first, so the click has no next conv."""
    import datetime as dt

    from etl_capnz_spark.operators.funnel import attribution

    d = dt.datetime
    rows = [
        (1, 1, d(2024, 1, 1), "click"),
        (1, 2, d(2024, 1, 2), "view"),
        (1, 3, d(2024, 1, 3), "purchase"),
        (1, 4, d(2024, 1, 4), "click"),
        (1, 5, d(2024, 1, 5), "purchase"),
        (2, 6, d(2024, 1, 1), "view"),
        (2, 7, d(2024, 2, 10), "purchase"),
        (3, 8, d(2024, 1, 1, 12), "purchase"),
        (3, 9, d(2024, 1, 1, 12), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {
        r["channel"]: (r["n_touches"], r["n_conversions"],
                       r["first_touch"], r["last_touch"])
        for r in attribution(
            df, "user_id", "ts", "event_id", "event_type",
            ["click", "view"], "purchase", 7 * 86400,
        ).collect()
    }
    assert got == {
        "click": (2, 2, 2, 1),
        "view": (1, 1, 0, 1),
    }


def test_attribution_same_ts_conversion_after_touch_counts(spark):
    """A purchase at the touch's exact ts but HIGHER id sorts after ->
    attributed (the ROWS-frame tie rule, mirrored by the oracle)."""
    import datetime as dt

    from etl_capnz_spark.operators.funnel import attribution

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), "click"),
         (1, 2, dt.datetime(2024, 1, 1), "purchase")],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    got = attribution(
        df, "user_id", "ts", "event_id", "event_type",
        ["click"], "purchase", 3600,
    ).collect()
    assert [(r["channel"], r["n_touches"], r["first_touch"])
            for r in got] == [("click", 1, 1)]


def test_attribution_matches_brute_force_and_partition_invariant(spark):
    import datetime as dt
    import random

    from etl_capnz_spark.operators.funnel import attribution

    rng = random.Random(17)
    types = ["click", "view", "purchase", "error"]
    rows = [
        (u, u * 1000 + i,
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randrange(0, 5000)),
         types[rng.randrange(4)])
        for u in range(1, 8)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    lookback = 86400
    # brute force
    convs = {}   # conv key -> list of (ts,id,channel)
    for u, i, t, ty in rows:
        if ty not in ("click", "view"):
            continue
        nxt = min(
            ((t2, i2) for u2, i2, t2, ty2 in rows
             if u2 == u and ty2 == "purchase" and (t2, i2) > (t, i)),
            default=None,
        )
        if nxt and (nxt[0] - t).total_seconds() <= lookback:
            convs.setdefault((u, nxt), []).append((t, i, ty))
    exp = {}
    for (u, c), ts in convs.items():
        ts.sort()
        for t, i, ch in ts:
            e = exp.setdefault(ch, [0, set(), 0, 0])
            e[0] += 1
            e[1].add((u, c))
        exp[ts[0][2]][2] += 1
        exp[ts[-1][2]][3] += 1
    want = {ch: (a, len(b), c, d) for ch, (a, b, c, d) in exp.items()}
    for frame in (df, df.repartition(11)):
        got = {
            r["channel"]: (r["n_touches"], r["n_conversions"],
                           r["first_touch"], r["last_touch"])
            for r in attribution(
                frame, "user_id", "ts", "event_id", "event_type",
                ["click", "view"], "purchase", lookback,
            ).collect()
        }
        assert got == want


def test_transition_counts_hand_case(spark):
    """A->B->A->C on u1, B->B on u2: counts incl. terminal NULLs; per-src
    sums equal per-src event counts."""
    import datetime as dt

    from etl_capnz_spark.operators.sessions import transition_counts

    rows = [(1, i, dt.datetime(2024, 1, 1, 0, i), t)
            for i, t in enumerate(["A", "B", "A", "C"], start=1)]
    rows += [(2, i, dt.datetime(2024, 1, 1, 0, i), "B")
             for i in (10, 11)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    for frame in (df, df.repartition(5)):
        got = {
            (r["src_type"], r["dst_type"]): r["n"]
            for r in transition_counts(
                frame, "user_id", "ts", "event_id", "event_type"
            ).collect()
        }
        assert got == {
            ("A", "B"): 1, ("B", "A"): 1, ("A", "C"): 1, ("C", None): 1,
            ("B", "B"): 1, ("B", None): 1,
        }


def test_cuped_perfect_covariate_kills_variance(spark):
    """When y = 2x exactly, θ = 2 and the adjusted variance must
    collapse to ~0 (var_reduction → 1) in BOTH arms, while adjusted
    means stay finite; with an x that is pure noise w.r.t. y the
    reduction must be near 0. Integer-cents inputs keep every moment
    exact, so the θ=2 case is algebraically exact."""
    from etl_capnz_spark.operators.funnel import cuped

    rows = []
    for i in range(200):
        x = (i * 37) % 991 + 100
        rows.append(("A" if i % 2 == 0 else "B", i, x, 2 * x))
    df = spark.createDataFrame(rows, "arm string, id long, x long, y long")
    got = {r["arm"]: r for r in cuped(df, "arm", "x", "y").collect()}
    for arm in ("A", "B"):
        assert got[arm]["n_users"] == 100
        assert got[arm]["var_y"] > 0
        assert abs(got[arm]["var_y_adj"]) < 1e-6
        assert abs(got[arm]["var_reduction"] - 1.0) < 1e-6

    # x unrelated to y: reduction near zero
    rows = []
    for i in range(400):
        x = (i * 37) % 991          # fast-cycling residues
        y = ((i * 811) % 997) * 3   # unrelated cycle
        rows.append(("A" if i % 2 == 0 else "B", i, x, y))
    df = spark.createDataFrame(rows, "arm string, id long, x long, y long")
    got = {r["arm"]: r for r in cuped(df, "arm", "x", "y").collect()}
    for arm in ("A", "B"):
        assert abs(got[arm]["var_reduction"]) < 0.1


def test_mann_whitney_against_scipy_convention_hand_case(spark):
    """Hand case with ties: A = [1, 2, 2, 5], B = [2, 3, 4, 6].
    Ranks: 1→1; the three 2s share (2+3+4)/3 = 3; 3→5; 4→6; 5→7; 8→6? —
    computed by hand: sumranks_A = 1 + 3 + 3 + 7 = 14, U_A = 14 − 10 =
    4, U_B = 16 − 4 = 12; identity u_a + u_b = nA·nB; z negative (A
    stochastically smaller). A pure-Python rank computation reproduces
    the operator's u values exactly."""
    from etl_capnz_spark.operators.funnel import mann_whitney

    a = [1, 2, 2, 5]
    b = [2, 3, 4, 6]
    rows = [("A", i, v) for i, v in enumerate(a)] + [
        ("B", 100 + i, v) for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(rows, "arm string, id long, cents long")
    r = mann_whitney(df, "arm", "cents").collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["u_a"] == 4.0 and r["u_b"] == 12.0
    assert r["u_a"] + r["u_b"] == r["n_a"] * r["n_b"]
    assert r["z"] < 0

    # pure-python average-rank parity on a messier case
    import itertools

    a = [(i * 13) % 7 for i in range(30)]
    b = [(i * 11) % 9 for i in range(40)]
    allv = sorted(a + b)
    ranks = {}
    for v, grp in itertools.groupby(allv):
        n = len(list(grp))
        first = allv.index(v) + 1
        ranks[v] = (first + (first + n - 1)) / 2
    sum_a = sum(ranks[v] for v in a)
    u_a = sum_a - len(a) * (len(a) + 1) / 2
    rows = [("A", i, v) for i, v in enumerate(a)] + [
        ("B", 100 + i, v) for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(rows, "arm string, id long, cents long")
    r = mann_whitney(df, "arm", "cents").collect()[0]
    assert r["u_a"] == u_a
    assert r["u_a"] + r["u_b"] == len(a) * len(b)


def test_top_paths_hand_case(spark):
    """Path extraction is ORDERED and bounded: a user-day with events
    C,A,B by timestamp yields 'C>A>B' (arrival order, not value
    order); a 2-event day yields a 2-step path; ranking ties break by
    path string."""
    import datetime as dt

    import __spark_entry__ as entry

    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 9), "C"),
        (1, 2, dt.datetime(2024, 1, 1, 10), "A"),
        (1, 3, dt.datetime(2024, 1, 1, 11), "B"),
        (1, 4, dt.datetime(2024, 1, 1, 12), "D"),  # 4th: truncated away
        (2, 5, dt.datetime(2024, 1, 1, 9), "C"),
        (2, 6, dt.datetime(2024, 1, 1, 10), "A"),
        (2, 7, dt.datetime(2024, 1, 1, 11), "B"),
        (3, 8, dt.datetime(2024, 1, 1, 9), "X"),
        (3, 9, dt.datetime(2024, 1, 1, 10), "Y"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["path"]: (r["rank"], r["n_sessions"])
           for r in entry.queries()["events_top_paths"](spark, d).collect()}
    assert out["C>A>B"] == (1, 2)
    assert out["X>Y"] == (2, 1)


def test_weighted_median_hand_case(spark):
    """Lower weighted median: values (1¢ w=1), (2¢ w=2), (10¢ w=1):
    total 4, half 2 → cumulative at v=2 is 3 ≥ 2 → median 2 — a heavy
    middle value wins over both the unweighted median of values and
    the mean; and a dominant weight (w=100 on 10¢) drags it there."""
    import datetime as dt  # noqa: F401
    import os
    import tempfile

    import __spark_entry__ as entry

    def run(rows):
        df = spark.createDataFrame(
            rows,
            "l_returnflag string, l_extendedprice double, l_quantity long",
        )
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(
            os.path.join(d, "lineitem.parquet")
        )
        return {
            r["flag"]: r["weighted_median_cents"]
            for r in entry.queries()["lineitem_weighted_median"](
                spark, d
            ).collect()
        }

    got = run([("A", 0.01, 1), ("A", 0.02, 2), ("A", 0.10, 1)])
    assert got["A"] == 2
    got = run([("B", 0.01, 1), ("B", 0.02, 2), ("B", 0.10, 100)])
    assert got["B"] == 10


def test_churn_features_leakproof_wall_and_label(spark):
    """The wall must be leak-proof and the label balanced: plant users
    whose pre/post behavior differs sharply and verify (1) post-wall
    events never leak into any *_pre feature, (2) the below-median
    label splits the population, (3) a user entirely post-wall has
    all-zero features."""
    import datetime as dt
    import os
    import tempfile

    import __spark_entry__ as entry

    t1 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # users 1-4: lots of pre activity, varying post activity 0..3
    for u in range(1, 5):
        for i in range(10):
            eid += 1
            rows.append((eid, t1 - dt.timedelta(days=20 + i), u,
                         "view", 10.0))
        for i in range(u - 1):
            eid += 1
            rows.append((eid, t1 - dt.timedelta(days=2 + i), u,
                         "view", 10.0))
    # user 9: ONLY post-wall activity
    eid += 1
    rows.append((eid, t1 - dt.timedelta(days=1), 9, "purchase", 99.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["user_id"]: r
           for r in entry.queries()["events_churn_features"](
               spark, d).collect()}
    for u in range(1, 5):
        assert got[u]["n_events_pre"] == 10      # post events excluded
        assert got[u]["n_purchases_pre"] == 0
    assert got[9]["n_events_pre"] == 0           # entirely post-wall
    assert got[9]["cents_pre"] == 0
    labels = [r["low_future_engagement"] for r in got.values()]
    assert 0 < sum(labels) < len(labels)         # balanced, not constant
    # user 1 has 0 post events (below median), user 4 has 3 (above)
    assert got[1]["low_future_engagement"] == 1
    assert got[4]["low_future_engagement"] == 0


def test_user_entropy_identities(spark):
    """Entropy identities: a 1-type user scores exactly 0 (both
    columns); a perfectly uniform 4-type user scores ln(4) and
    normalized exactly 1.0; a skewed user lands strictly between."""
    import datetime as dt
    import math
    import os
    import tempfile

    import __spark_entry__ as entry

    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for _ in range(8):
        eid += 1
        rows.append((eid, t, 1, "view", 1.0))         # constant user
    for ty in ("a", "b", "c", "d") * 3:
        eid += 1
        rows.append((eid, t, 2, ty, 1.0))             # uniform user
    for ty in ["a"] * 9 + ["b"]:
        eid += 1
        rows.append((eid, t, 3, ty, 1.0))             # skewed user
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["user_id"]: r
           for r in entry.queries()["events_user_entropy"](
               spark, d).collect()}
    assert got[1]["entropy_nats"] == 0.0
    assert got[1]["entropy_norm"] == 0.0
    assert abs(got[2]["entropy_nats"] - math.log(4)) < 1e-6
    assert got[2]["entropy_norm"] == 1.0
    assert 0.0 < got[3]["entropy_norm"] < 1.0


def test_lorenz_deciles_properties(spark):
    """Lorenz invariants on the driver data at sf0.001: deciles
    1..10, cumulative share strictly increasing to exactly 1.0,
    bottom-decile share below the equal-split 0.1 (spend is skewed),
    and population sizes match SQL-ntile (ceil-first buckets)."""
    import __spark_entry__ as entry

    rows = sorted(
        entry.queries()["orders_lorenz"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1.0
    assert shares[0] < 0.1
    sizes = [r["n_customers"] for r in rows]
    n = sum(sizes)
    big, small = -(-n // 10), n // 10
    assert all(s in (big, small) for s in sizes)
    assert sizes == sorted(sizes, reverse=True) or big == small


def test_theil_and_fano_identities(spark):
    """Theil: equal shares give exactly 0; one-owner gives ln(n) (the
    Theil maximum). Fano: a constant daily count gives 0; a planted
    bursty pattern exceeds 1 (over-dispersed); a Poisson-ish spread
    sits near 1."""
    import datetime as dt
    import math
    import os
    import tempfile

    import __spark_entry__ as entry

    def write(rows, schema, name, d):
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, name))

    d = tempfile.mkdtemp()
    t = dt.datetime(2024, 1, 1)
    # equal spend: 40 customers x 1 order of $1
    write([(i, i, "O", 1.0, t, "x") for i in range(40)],
          "o_orderkey long, o_custkey long, o_orderstatus string, "
          "o_totalprice double, o_orderdate timestamp, "
          "o_orderpriority string", "orders.parquet", d)
    r = entry.queries()["orders_theil"](spark, d).collect()[0]
    assert r["theil_t"] == 0.0

    d2 = tempfile.mkdtemp()
    rows = [(0, 0, "O", 100.0, t, "x")] + [
        (i, i, "O", 0.0, t, "x") for i in range(1, 40)
    ]
    write(rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
          "o_totalprice double, o_orderdate timestamp, "
          "o_orderpriority string", "orders.parquet", d2)
    r = entry.queries()["orders_theil"](spark, d2).collect()[0]
    assert abs(r["theil_t"] - math.log(40)) < 1e-6

    d3 = tempfile.mkdtemp()
    ev = []
    eid = 0
    for day in range(10):           # user 1: constant 5/day
        for _ in range(5):
            eid += 1
            ev.append((eid, t + dt.timedelta(days=day), 1, "view", 1.0))
    for day in range(10):           # user 2: 1/day except one 50-burst
        for _ in range(50 if day == 3 else 1):
            eid += 1
            ev.append((eid, t + dt.timedelta(days=day), 2, "view", 1.0))
    write(ev, "event_id long, ts timestamp, user_id long, "
          "event_type string, value double", "events.parquet", d3)
    got = {r["user_id"]: r["fano"]
           for r in entry.queries()["events_burstiness"](
               spark, d3).collect()}
    assert got[1] == 0.0
    assert got[2] > 1.0


def test_hhi_identities(spark):
    """HHI identities: n equal customers give exactly 1/n (n_effective
    = n); a monopoly gives exactly 1.0 (n_effective = 1)."""
    import datetime as dt
    import os
    import tempfile

    import __spark_entry__ as entry

    t = dt.datetime(2024, 1, 1)
    oschema = ("o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp, "
               "o_orderpriority string")
    cschema = ("c_custkey long, c_name string, c_nationkey int, "
               "c_acctbal double, c_mktsegment string")
    d = tempfile.mkdtemp()
    orders = [(i, i % 8, "O", 5.0, t, "x") for i in range(80)]
    orders += [(100 + i, 100, "O", 7.0, t, "x") for i in range(3)]
    cust = [(i, f"c{i}", 0, 0.0, "EQ") for i in range(8)]
    cust += [(100, "mono", 0, 0.0, "MONO")]
    spark.createDataFrame(orders, oschema).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet"))
    spark.createDataFrame(cust, cschema).write.mode("overwrite").parquet(
        os.path.join(d, "customer.parquet"))
    got = {r["c_mktsegment"]: r
           for r in entry.queries()["orders_hhi"](spark, d).collect()}
    assert got["EQ"]["hhi"] == 0.125 and got["EQ"]["n_effective"] == 8.0
    assert got["MONO"]["hhi"] == 1.0 and got["MONO"]["n_effective"] == 1.0


def test_poisson_bootstrap_weights_and_ci(spark):
    """Three pins for the Poisson bootstrap: (1) replicate weights
    behave like Poisson(1) — mean effective n within 5% of n and not
    all equal; (2) results are partition-invariant (hash RNG, no
    sampling state); (3) a 95% CI from exact order statistics over
    the replicate means covers the true mean."""
    from etl_capnz_spark.operators.funnel import poisson_bootstrap

    n = 400
    rows = [(i, float(100 + (i * 37) % 211)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = poisson_bootstrap(df, "id", "v", replicates=48).collect()
    assert len(out) == 48
    effs = [r["n_eff"] for r in out]
    assert abs(sum(effs) / len(effs) - n) < 0.05 * n
    assert len(set(effs)) > 1
    means = sorted(r["mean_cents"] for r in out)
    true_mean = sum(v for _, v in rows) / n * 100
    lo, hi = means[1], means[-2]  # ~95% band from 48 replicates
    assert lo <= true_mean <= hi
    # partition invariance
    out2 = poisson_bootstrap(
        df.repartition(13), "id", "v", replicates=48
    ).collect()
    assert sorted((r["b"], r["n_eff"], r["sum_cents"]) for r in out2) == \
        sorted((r["b"], r["n_eff"], r["sum_cents"]) for r in out)


def test_ols_multi_matches_numpy_lstsq(spark):
    """Closed-form Cramer OLS must match numpy's lstsq on a planted
    linear model with noise (coefficients within 1e-6 of lstsq, which
    is itself near the planted truth), and a collinear design (x2 =
    2*x1) must emit NULL coefficients, not garbage."""
    import numpy as np

    from etl_capnz_spark.operators.funnel import ols_multi
    from pyspark.sql import functions as F2

    rng = np.random.RandomState(4)
    n = 500
    x1 = rng.randint(0, 24, n)
    x2 = rng.randint(1, 8, n)
    y = (250 + 30 * x1 - 12 * x2 + rng.randint(-40, 41, n)).astype(int)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "x1 long, x2 long, y long",
    )
    got = ols_multi(
        df, F2.col("y"), F2.col("x1"), F2.col("x2")
    ).collect()[0]
    X = np.column_stack([np.ones(n), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
    assert abs(got["b0"] - beta[0]) < 1e-5
    assert abs(got["b1"] - beta[1]) < 1e-5
    assert abs(got["b2"] - beta[2]) < 1e-5
    assert 0.9 < got["r2"] <= 1.0

    collinear = df.withColumn("x2", 2 * F2.col("x1"))
    bad = ols_multi(
        collinear, F2.col("y"), F2.col("x1"), F2.col("x2")
    ).collect()[0]
    assert bad["b0"] is None and bad["b1"] is None and bad["r2"] is None


def test_markov_removal_hand_case(spark):
    """Two disjoint single-touch journeys: u1 start→A→conv, u2
    start→B→null.  p_base = 0.5 exactly; removing A kills the only
    converting path (p=0, effect 1), removing B changes nothing on
    the conv side (p stays 0.5, effect 0) — so A takes the full
    attribution share and B none."""
    from etl_capnz_spark.operators.funnel import (
        markov_removal_attribution,
    )

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 1, "A"),
        (1, datetime(2024, 1, 1, 0, 1), 2, "purchase"),
        (2, datetime(2024, 1, 1, 0, 0), 3, "B"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        r["channel"]: r
        for r in markov_removal_attribution(
            df, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert set(out) == {"A", "B"}
    assert abs(out["A"]["p_base"] - 0.5) < 1e-9
    assert abs(out["A"]["p_removed"] - 0.0) < 1e-9
    assert abs(out["A"]["removal_effect"] - 1.0) < 1e-9
    assert abs(out["A"]["attribution_share"] - 1.0) < 1e-9
    assert abs(out["B"]["p_removed"] - 0.5) < 1e-9
    assert abs(out["B"]["removal_effect"] - 0.0) < 1e-9
    assert abs(out["B"]["attribution_share"] - 0.0) < 1e-9


def test_markov_removal_post_conversion_touches_ignored(spark):
    """Only events strictly BEFORE the first conversion are touches:
    a channel seen only after purchase must not appear at all, and a
    converting user with zero touches absorbs via start→conv (keeping
    p_base > 0 even when every touch channel is removed)."""
    from etl_capnz_spark.operators.funnel import (
        markov_removal_attribution,
    )

    rows = [
        # u1: A then purchase then C (C is post-conv: invisible)
        (1, datetime(2024, 1, 1, 0, 0), 1, "A"),
        (1, datetime(2024, 1, 1, 0, 1), 2, "purchase"),
        (1, datetime(2024, 1, 1, 0, 2), 3, "C"),
        # u2: converts with no touches -> start→conv edge
        (2, datetime(2024, 1, 1, 0, 0), 4, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        r["channel"]: r
        for r in markov_removal_attribution(
            df, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert set(out) == {"A"}  # C never appears
    assert abs(out["A"]["p_base"] - 1.0) < 1e-9
    # removing A: start edges = {A->null (1), conv (1)} -> p = 0.5
    assert abs(out["A"]["p_removed"] - 0.5) < 1e-9
    assert abs(out["A"]["removal_effect"] - 0.5) < 1e-9


def test_markov_removal_symmetric_channels_equal_shares(spark):
    """Two structurally identical channels must get identical removal
    effects and shares summing to 1 — and the result must be
    partition-invariant (integer fixed point has no float sum
    order)."""
    from etl_capnz_spark.operators.funnel import (
        markov_removal_attribution,
    )

    rows = []
    eid = 0
    for u in range(20):
        ch = "A" if u % 2 == 0 else "B"
        rows.append((u, datetime(2024, 1, 1, 0, 0), eid, ch))
        eid += 1
        if u % 4 < 2:  # half of each channel converts
            rows.append((u, datetime(2024, 1, 1, 0, 1), eid, "purchase"))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = markov_removal_attribution(
        df, "user_id", "ts", "event_id", "event_type", "purchase"
    ).collect()
    byc = {r["channel"]: r for r in out}
    assert byc["A"]["removal_effect"] == byc["B"]["removal_effect"]
    assert (
        abs(
            byc["A"]["attribution_share"]
            + byc["B"]["attribution_share"]
            - 1.0
        )
        < 1e-9
    )
    out2 = markov_removal_attribution(
        df.repartition(7),
        "user_id", "ts", "event_id", "event_type", "purchase",
    ).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_position_attribution_hand_case(spark):
    """Three-touch converting journey A,B,C→purchase plus a
    non-converter D: linear thirds, U 40/20/40, first/last winner
    take all, D absent (no credit from non-converters)."""
    from etl_capnz_spark.operators.funnel import position_attribution

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 1, "A"),
        (1, datetime(2024, 1, 1, 0, 1), 2, "B"),
        (1, datetime(2024, 1, 1, 0, 2), 3, "C"),
        (1, datetime(2024, 1, 1, 0, 3), 4, "purchase"),
        (2, datetime(2024, 1, 1, 0, 0), 5, "D"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        r["channel"]: r
        for r in position_attribution(
            df, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert set(out) == {"A", "B", "C"}
    third = (10**9 // 3) / 1e9
    assert out["A"]["linear"] == third == out["B"]["linear"]
    assert out["A"]["u_shape"] == 0.4 and out["C"]["u_shape"] == 0.4
    assert out["B"]["u_shape"] == 0.2
    assert out["A"]["first_touch"] == 1.0 and out["A"]["last_touch"] == 0.0
    assert out["C"]["last_touch"] == 1.0 and out["C"]["first_touch"] == 0.0
    assert out["B"]["first_touch"] == 0.0 and out["B"]["last_touch"] == 0.0


def test_position_attribution_k1_k2_and_invariance(spark):
    """k=1 journey gives its only touch full credit under every rule;
    k=2 U-shape splits 50/50; totals conserve ~one unit per
    conversion; partition-invariant."""
    from etl_capnz_spark.operators.funnel import position_attribution

    rows = [
        # u1: single touch
        (1, datetime(2024, 1, 1, 0, 0), 1, "A"),
        (1, datetime(2024, 1, 1, 0, 1), 2, "purchase"),
        # u2: two touches
        (2, datetime(2024, 1, 1, 0, 0), 3, "B"),
        (2, datetime(2024, 1, 1, 0, 1), 4, "A"),
        (2, datetime(2024, 1, 1, 0, 2), 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    res = position_attribution(
        df, "user_id", "ts", "event_id", "event_type", "purchase"
    )
    out = {r["channel"]: r for r in res.collect()}
    assert out["A"]["linear"] == 1.0 + 0.5
    assert out["A"]["u_shape"] == 1.0 + 0.5
    assert out["B"]["u_shape"] == 0.5
    assert out["A"]["first_touch"] == 1.0  # u1 only; u2 first is B
    assert out["B"]["first_touch"] == 1.0
    assert out["A"]["last_touch"] == 2.0  # last in both journeys
    for col in ("linear", "u_shape", "first_touch", "last_touch"):
        total = sum(r[col] for r in out.values())
        assert abs(total - 2.0) < 1e-6  # 2 conversions
    out2 = {
        r["channel"]: r
        for r in position_attribution(
            df.repartition(7),
            "user_id", "ts", "event_id", "event_type", "purchase",
        ).collect()
    }
    assert out2 == out


def test_did_estimator_planted_effect_and_guards(spark):
    """A planted +7 treatment effect on top of a +3 common trend
    recovers exactly 7; z/se match a pure-Python replay; an empty
    cell → NULL did; <2-value cells → NULL se/z/p."""
    import math

    from etl_capnz_spark.operators.funnel import did_estimator

    rows = []
    # control: pre base 10/12, post +3 trend
    rows += [(0, 0, v) for v in (10, 12, 14, 8)]
    rows += [(0, 1, v) for v in (13, 15, 17, 11)]
    # treatment: pre base 20/22, post +3 trend +7 effect
    rows += [(1, 0, v) for v in (20, 22, 24, 18)]
    rows += [(1, 1, v) for v in (30, 32, 34, 28)]
    df = spark.createDataFrame(rows, "t int, p int, v long")
    r = did_estimator(df, "t", "p", "v").collect()[0]
    assert r["did"] == 7.0
    assert (r["n_t_pre"], r["n_t_post"], r["n_c_pre"], r["n_c_post"]) == (
        4, 4, 4, 4,
    )

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    cells = {
        (t, p): [v for tt, pp, v in rows if tt == t and pp == p]
        for t in (0, 1)
        for p in (0, 1)
    }
    se = math.sqrt(sum(var(c) / len(c) for c in cells.values()))
    assert r["se"] == round(se, 6)
    assert r["z"] == round(7.0 / se, 6)
    assert r["p_value"] is not None

    # no-effect case: same trend both groups → did exactly 0
    null_rows = [(t, p, 10 + 3 * p + 5 * t + d) for t in (0, 1)
                 for p in (0, 1) for d in (-1, 0, 1)]
    r0 = did_estimator(
        spark.createDataFrame(null_rows, "t int, p int, v long"),
        "t", "p", "v",
    ).collect()[0]
    assert r0["did"] == 0.0

    # missing treated-post cell → the contrast is undefined
    partial = [(0, 0, 1), (0, 1, 2), (1, 0, 3)]
    rp = did_estimator(
        spark.createDataFrame(partial, "t int, p int, v long"),
        "t", "p", "v",
    ).collect()[0]
    assert rp["did"] is None and rp["se"] is None
    assert rp["n_t_post"] == 0

    # 1-value cells: estimate exists, inference doesn't
    single = [(0, 0, 1), (0, 1, 2), (1, 0, 3), (1, 1, 11)]
    rs = did_estimator(
        spark.createDataFrame(single, "t int, p int, v long"),
        "t", "p", "v",
    ).collect()[0]
    assert rs["did"] == 7.0
    assert rs["se"] is None and rs["z"] is None and rs["p_value"] is None


def test_srm_check_balanced_planted_and_share(spark):
    """A 500/500 split is quiet (z=0, p≈1); a 600/400 split screams
    (z=6.32, p<0.001 → srm); NULL arms drop; a non-half design share
    evaluates against ITS expectation."""
    import math

    from etl_capnz_spark.operators.funnel import srm_check

    def run(n_a, n_b, nulls=0, share=0.5):
        rows = [(1,)] * n_a + [(0,)] * n_b + [(None,)] * nulls
        df = spark.createDataFrame(rows, "arm int")
        return srm_check(df, "arm", expected_share=share).collect()[0]

    r = run(500, 500)
    assert r["z"] == 0.0 and r["srm"] is False
    assert r["share_observed"] == 0.5

    r = run(600, 400, nulls=3)
    z = (600 - 1000 * 0.5) / math.sqrt(1000 * 0.25)
    assert r["z"] == round(z, 6)
    assert r["srm"] is True and r["n_dropped"] == 3

    # design share 0.9 realized exactly → quiet even though unequal
    r = run(900, 100, share=0.9)
    assert r["z"] == 0.0 and r["srm"] is False

    empty = spark.createDataFrame([], "arm int")
    r = srm_check(empty, "arm").collect()[0]
    assert r["z"] is None and r["srm"] is None


def test_power_analysis_textbook_and_guards(spark):
    """n_required equals the textbook 2(z_a+z_b)^2 sigma^2/delta^2 on
    a hand case; halving the MDE quadruples n (the inverse-square
    law); 1-value and zero-mean groups emit NULL."""
    import math

    from etl_capnz_spark.operators.funnel import power_analysis

    vals = [90, 100, 100, 110, 95, 105]
    rows = [("g", v) for v in vals] + [("one", 5)] + [
        ("zero", -4), ("zero", 4),
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        r["grp"]: r
        for r in power_analysis(df, "grp", "v", mde_share=0.05).collect()
    }
    m = sum(vals) / len(vals)
    var = sum((x - m) ** 2 for x in vals) / (len(vals) - 1)
    zsum = 1.959964 + 0.841621
    want = math.ceil(2 * zsum * zsum * var / ((0.05 * m) ** 2))
    g = got["g"]
    assert g["mean"] == round(m, 6) and g["variance"] == round(var, 6)
    assert g["n_required_per_arm"] == want

    assert got["one"]["variance"] is None
    assert got["one"]["n_required_per_arm"] is None
    assert got["zero"]["mean"] == 0.0
    assert got["zero"]["n_required_per_arm"] is None

    half = power_analysis(df, "grp", "v", mde_share=0.025).collect()
    g2 = {r["grp"]: r for r in half}["g"]
    # inverse-square law, up to the two ceils
    assert abs(g2["n_required_per_arm"] - 4 * want) <= 4
