"""Time-series similarity pins (operators/timeseries.py): the
distributed DTW must be EXACTLY the pure-Python reference (same DP,
same band), and the series build + L2 tier get shape/invariant pins."""

import math

from pyspark.sql import functions as F

from etl_capnz_spark.operators.timeseries import (
    daily_series,
    dtw_reference,
    dtw_topk,
    l2_topk,
)
from etl_capnz_spark.session import read_table


def test_dtw_reference_known_values():
    # identical series → 0
    assert dtw_reference([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) == 0.0
    # time-shifted ramp aligns almost freely (DTW ≪ L2)
    a = [0.0, 1.0, 2.0, 3.0, 4.0]
    b = [0.0, 0.0, 1.0, 2.0, 3.0]
    assert dtw_reference(a, b) == 1.0  # one unmatched step of cost 1²
    l2 = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert dtw_reference(a, b) < l2
    # band=0 degenerates to the diagonal = plain L2
    assert abs(dtw_reference(a, b, band=0) - l2) < 1e-12


def test_distributed_dtw_equals_reference(spark):
    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [4.0, 3.0, 2.0, 1.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
        (4, [1.0, 2.0, 2.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, vals array<double>")
    q = [1.0, 2.0, 3.0, 4.0]
    for band in (None, 1, 2):
        got = {
            r["user_id"]: r["dist"]
            for r in dtw_topk(df, q, k=10, band=band).collect()
        }
        want = {
            uid: round(dtw_reference(vals, q, band=band), 6)
            for uid, vals in rows
        }
        assert got == want, f"band={band}"


def test_daily_series_shape_and_determinism(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    s = daily_series(ev)
    rows = s.collect()
    n_users = ev.select("user_id").distinct().count()
    assert len(rows) == n_users
    assert all(len(r["vals"]) == 8 for r in rows)
    again = {r["user_id"]: r["vals"] for r in daily_series(ev).collect()}
    assert {r["user_id"]: r["vals"] for r in rows} == again


def test_l2_topk_plans_take_ordered(spark, sf_dir):
    s = daily_series(read_table(spark, sf_dir, "events"))
    out = l2_topk(s, [1.0] * 8, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    assert len(rows) == 5
    assert rows == sorted(rows, key=lambda r: (r["dist"], r["user_id"]))


def test_user_trend_grouped_map(spark):
    """Grouped-map applyInPandas OLS: known slope on a crafted ramp,
    NULL on zero x-variance (single-day user)."""
    from etl_capnz_spark.operators.timeseries import user_trend

    rows = [
        # user 1: y = 2x + 1 over days 0..3
        (1, "2026-01-01 10:00:00", 1.0),
        (1, "2026-01-02 10:00:00", 3.0),
        (1, "2026-01-03 10:00:00", 5.0),
        (1, "2026-01-04 10:00:00", 7.0),
        # user 2: all on one day -> no x variance
        (2, "2026-01-01 09:00:00", 4.0),
        (2, "2026-01-01 11:00:00", 8.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts_s string, value double"
    ).selectExpr("user_id", "cast(ts_s as timestamp) AS ts", "value")
    got = {r["user_id"]: r for r in user_trend(df).collect()}
    assert got[1]["slope"] == 2.0 and got[1]["intercept"] == 1.0
    assert got[2]["slope"] is None and got[2]["intercept"] is None
    assert got[1]["n"] == 4 and got[2]["n"] == 2


def test_user_trend_arrow_equals_pandas_seam(spark, sf_dir):
    """applyInArrow and applyInPandas grouped maps must agree
    bit-for-bit — the RecordBatch seam is a faster boundary, not
    different math."""
    from etl_capnz_spark.operators.timeseries import (
        user_trend,
        user_trend_arrow,
    )

    ev = read_table(spark, sf_dir, "events")
    a = {r["user_id"]: (r["n"], r["slope"], r["intercept"])
         for r in user_trend(ev).collect()}
    b = {r["user_id"]: (r["n"], r["slope"], r["intercept"])
         for r in user_trend_arrow(ev).collect()}
    assert a == b and len(a) > 0


def test_ewma_matches_closed_form_and_partition_invariant(spark):
    """The sequential recursion must equal the closed-form power sum
    y_i = (1-a)^(i-1) x_1 + a * sum_{j=2..i} (1-a)^(i-j) x_j (a
    DIFFERENT algorithm, so agreement is evidence, not tautology) to
    float tolerance, resolve ts ties by id, and draw identical values
    regardless of input partitioning."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.timeseries import ewma_per_group

    rows = []
    vals = {}
    for g in (1, 2):
        xs = [float((g * 7 + i * 13) % 50) + 0.25 for i in range(40)]
        vals[g] = xs
        for i, x in enumerate(xs):
            # two ts ties per series: id breaks them
            t = dt.datetime(2024, 1, 1) + dt.timedelta(hours=i // 2)
            rows.append((g, i, t, x))
    df = spark.createDataFrame(
        rows, "g int, rid long, ts timestamp, x double"
    )
    a = 0.3
    got = {
        (r["g"], r["rid"]): r["ewma"]
        for r in ewma_per_group(df, "g", "ts", "x", "rid", alpha=a).collect()
    }
    for g, xs in vals.items():
        for i in range(len(xs)):
            closed = (1 - a) ** i * xs[0] + a * sum(
                (1 - a) ** (i - j) * xs[j] for j in range(1, i + 1)
            )
            assert abs(got[(g, i)] - closed) < 1e-9
    re = {
        (r["g"], r["rid"]): r["ewma"]
        for r in ewma_per_group(
            df.repartition(13, "rid"), "g", "ts", "x", "rid", alpha=a
        ).collect()
    }
    assert re == got


def test_holt_matches_pure_python_and_partition_invariant(spark):
    """holt_per_group must equal a from-scratch pure-Python Holt
    recursion BIT-EXACTLY (dyadic α, β: products exact, same
    association), resolve ts ties by id, and be partition-invariant."""
    import datetime as dt

    from etl_capnz_spark.operators.timeseries import holt_per_group

    rows = []
    vals = {}
    for g in (1, 2):
        xs = [float((g * 7 + i * 13) % 50) + 0.25 for i in range(40)]
        vals[g] = xs
        for i, x in enumerate(xs):
            t = dt.datetime(2024, 1, 1) + dt.timedelta(hours=i // 2)
            rows.append((g, i, t, x))
    df = spark.createDataFrame(
        rows, "g int, rid long, ts timestamp, x double"
    )
    a, b = 0.5, 0.25
    got = {
        (r["g"], r["rid"]): (r["level"], r["trend"])
        for r in holt_per_group(
            df, "g", "ts", "x", "rid", alpha=a, beta=b
        ).collect()
    }
    for g, xs in vals.items():
        lev, trend = xs[0], 0.0
        assert got[(g, 0)] == (lev, trend)
        for i in range(1, len(xs)):
            prior = lev + trend
            new_lev = a * xs[i] + (1.0 - a) * prior
            trend = b * (new_lev - lev) + (1.0 - b) * trend
            lev = new_lev
            assert got[(g, i)] == (lev, trend), (g, i)
    re = {
        (r["g"], r["rid"]): (r["level"], r["trend"])
        for r in holt_per_group(
            df.repartition(13, "rid"), "g", "ts", "x", "rid",
            alpha=a, beta=b,
        ).collect()
    }
    assert re == got


def test_holt_tracks_linear_ramp_exactly_in_the_limit(spark):
    """On a pure linear ramp x_t = c + m·t the Holt trend must converge
    to the slope m (a property a single EWMA cannot have — it lags by
    m·(1−α)/α forever). Checks the operator computes a genuine trend
    component, not a relabeled EWMA."""
    import datetime as dt

    from etl_capnz_spark.operators.timeseries import holt_per_group

    m, c = 3.0, 10.0
    rows = [
        (1, i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), c + m * i)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "g int, rid long, ts timestamp, x double"
    )
    out = {
        r["rid"]: (r["level"], r["trend"])
        for r in holt_per_group(df, "g", "ts", "x", "rid").collect()
    }
    lev, trend = out[59]
    assert abs(trend - m) < 1e-6
    assert abs(lev - (c + m * 59)) < 1e-5


def test_cusum_alarm_and_reset_hand_case(spark):
    """level=10, threshold=5: values 12,4,9,20,1 give s=2,0,0(?),...
    hand-traced: s1=max(0,12-10)=2 (no alarm), s2=max(0,2+4-10)=0,
    s3=max(0,0+9-10)=0, s4=max(0,0+20-10)=10>5 ALARM then reset,
    s5=max(0,0+1-10)=0. Exactly one alarm, at row 4, value 10."""
    import datetime as dt

    from etl_capnz_spark.operators.timeseries import cusum_alarms

    data = [
        (1, i, dt.datetime(2024, 1, 1, 0, i), float(x))
        for i, x in enumerate([12.0, 4.0, 9.0, 20.0, 1.0], start=1)
    ]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, value double"
    )
    got = cusum_alarms(
        df, "user_id", "ts", "value", "event_id", level=10.0, threshold=5.0
    ).collect()
    assert [(r["event_id"], r["cusum"]) for r in got] == [(4, 10.0)]


def test_cusum_matches_pure_python_bitwise_and_partition_invariant(spark):
    """Random series: the distributed recursion equals the sequential
    reference BIT-EXACTLY (same association, adds only — no FMA), on
    any input partitioning."""
    import datetime as dt
    import random

    from etl_capnz_spark.operators.timeseries import cusum_alarms

    rng = random.Random(5)
    data = [
        (u, u * 1000 + i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
         rng.uniform(0.0, 150.0))
        for u in (1, 2, 3)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, value double"
    )
    expect = []
    for u in (1, 2, 3):
        s = 0.0
        for (uu, i, t, x) in data:
            if uu != u:
                continue
            v = max(0.0, (s + x) - 64.0)
            if v > 128.0:
                expect.append((u, i, v))
                s = 0.0
            else:
                s = v
    got = sorted(
        (r["user_id"], r["event_id"], r["cusum"])
        for r in cusum_alarms(
            df, "user_id", "ts", "value", "event_id"
        ).collect()
    )
    assert got == sorted(expect)
    got7 = sorted(
        (r["user_id"], r["event_id"], r["cusum"])
        for r in cusum_alarms(
            df.repartition(7), "user_id", "ts", "value", "event_id"
        ).collect()
    )
    assert got7 == got


def test_rolling_median_hand_case_and_even_interpolation(spark):
    """Window of 3 over 1,5,2,9: medians 1, 3 (even: (lo+hi)/2),
    2, 5 — matching DuckDB's windowed median on doubles."""
    import datetime as dt

    from etl_capnz_spark.operators.timeseries import rolling_median

    data = [
        (1, i, dt.datetime(2024, 1, 1, 0, i), x)
        for i, x in enumerate([1.0, 5.0, 2.0, 9.0], start=1)
    ]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["med"]
        for r in rolling_median(
            df, "user_id", "ts", "value", "event_id", window_rows=3
        ).collect()
    }
    assert got == {1: 1.0, 2: 3.0, 3: 2.0, 4: 5.0}


def test_rolling_median_matches_pure_python_and_partition_invariant(spark):
    import datetime as dt
    import random

    from etl_capnz_spark.operators.timeseries import rolling_median

    rng = random.Random(23)
    data = [
        (u, u * 100 + i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
         round(rng.uniform(0, 100), 2))
        for u in (1, 2)
        for i in range(50)
    ]
    df = spark.createDataFrame(
        data, "user_id long, event_id long, ts timestamp, value double"
    )
    k = 5
    expect = {}
    for u in (1, 2):
        vals = [x for uu, _, _, x in data if uu == u]
        for i in range(len(vals)):
            wnd = sorted(vals[max(0, i - k + 1): i + 1])
            n = len(wnd)
            if n % 2 == 1:
                m = wnd[n // 2]
            else:
                lo, hi = wnd[n // 2 - 1], wnd[n // 2]
                m = (lo + hi) / 2.0
            expect[u * 100 + i] = m
    for frame in (df, df.repartition(9)):
        got = {
            r["event_id"]: r["med"]
            for r in rolling_median(
                frame, "user_id", "ts", "value", "event_id", window_rows=k
            ).collect()
        }
        assert got == expect


def test_kaplan_meier_hand_case_and_partition_invariance(spark):
    """Textbook check: durations (1,e) (2,e) (2,c) (3,e) (4,c) give
    S = 0.8, 0.6, 0.3 at t = 1, 2, 3 — the censored subject at t=2
    counts in n_risk at 2 but adds no step; t=4 (censored only) emits
    nothing. Exact fractions chosen so the float fold is exact and the
    equality can be ==, not approx. Partition-invariant."""
    from etl_capnz_spark.operators.timeseries import kaplan_meier

    rows = [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)]
    df = spark.createDataFrame(rows, "dur long, observed int")
    got = {r["t"]: r for r in kaplan_meier(df, "dur", "observed").collect()}
    assert sorted(got) == [1, 2, 3]
    assert (got[1]["n_risk"], got[1]["n_events"], got[1]["n_censored"]) == (5, 1, 0)
    assert (got[2]["n_risk"], got[2]["n_events"], got[2]["n_censored"]) == (4, 1, 1)
    assert (got[3]["n_risk"], got[3]["n_events"], got[3]["n_censored"]) == (2, 1, 0)
    assert got[1]["survival"] == 0.8
    assert got[2]["survival"] == 0.8 * (1 - 1 / 4)
    assert got[3]["survival"] == 0.8 * (1 - 1 / 4) * (1 - 1 / 2)
    re = {r["t"]: r["survival"]
          for r in kaplan_meier(
              df.repartition(7), "dur", "observed"
          ).collect()}
    assert re == {t: got[t]["survival"] for t in got}


def test_kaplan_meier_all_observed_matches_empirical_survivor(spark):
    """With NO censoring KM must reduce to the empirical survivor
    function S(t) = (# durations > t) / n — a closed-form identity a
    wrong at-risk accounting cannot satisfy."""
    from etl_capnz_spark.operators.timeseries import kaplan_meier

    durs = [1, 1, 2, 3, 3, 3, 5, 8, 8, 9]
    df = spark.createDataFrame(
        [(d, 1) for d in durs], "dur long, observed int"
    )
    got = {r["t"]: r["survival"]
           for r in kaplan_meier(df, "dur", "observed").collect()}
    n = len(durs)
    for t, s in got.items():
        assert abs(s - sum(1 for d in durs if d > t) / n) < 1e-12, t


def test_seasonal_decompose_recovers_planted_components(spark):
    """Plant x_t = 1000·t (linear trend, in cents) + a period-4
    seasonal pattern [+500, −500, +300, −300]: with half=2 (w=5) and a
    zero-mean seasonal whose 5-row moving average is NOT constant, the
    identity trend+seasonal+residual == x must hold EXACTLY (integer
    numerators), edges must be NULL, and the recovered seasonal must
    correlate with the planted one slot-by-slot in sign."""
    import datetime as dt

    from etl_capnz_spark.operators.timeseries import seasonal_decompose

    season = [500, -500, 300, -300]
    rows = []
    for t in range(48):
        rows.append((
            dt.datetime(2024, 5, 1) + dt.timedelta(hours=t),
            1000 * t + season[t % 4],
            t % 4,
        ))
    df = spark.createDataFrame(rows, "h timestamp, c long, slot int")
    out = sorted(
        seasonal_decompose(df, "h", "c", "slot", half=2).collect(),
        key=lambda r: r["h"],
    )
    assert all(r["trend"] is None for r in out[:2] + out[-2:])
    mids = out[2:-2]
    assert all(r["trend"] is not None for r in mids)
    for r in mids:
        # exact reconstruction: cents == trend + seasonal + residual
        assert abs(r["cents"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-9
    by_slot = {}
    for r in mids:
        by_slot.setdefault(r["slot"], r["seasonal"])
    for s_idx, planted in enumerate(season):
        assert by_slot[s_idx] * planted > 0, (s_idx, by_slot[s_idx])


def test_isotonic_pava_hand_case_and_minimax_identity(spark):
    """Hand case: bin means 0.6, 0.2, 0.8 violate monotonicity at the
    first step -> PAVA pools bins 0+1 to 0.4 and leaves 0.8; the
    distributed fit equals pava_reference; and every fit obeys the
    minimax identity max-min formula computed in pure Python (a third
    independent algorithm)."""
    from etl_capnz_spark.operators.timeseries import (
        isotonic_fit,
        pava_reference,
    )

    pts = [(0, 5, 3), (1, 5, 1), (2, 5, 4)]  # means .6, .2, .8
    ref = pava_reference(pts)
    assert [round(f, 9) for *_, f in ref] == [0.4, 0.4, 0.8]

    df = spark.createDataFrame(pts, "bin long, n long, sy long")
    got = sorted(
        ((r["bin"], r["n"], r["sy"], r["fit"])
         for r in isotonic_fit(df, "bin", "n", "sy").collect())
    )
    assert got == ref

    # minimax identity on a longer random-ish case
    pts = [(x, 3 + x % 4, (x * 7) % 11) for x in range(12)]
    ref = {x: f for x, _, _, f in pava_reference(pts)}
    cn = [0]
    cy = [0]
    for _, n, sy in pts:
        cn.append(cn[-1] + n)
        cy.append(cy[-1] + sy)

    def avg(i, j):  # 1-based inclusive
        return (cy[j] - cy[i - 1]) / (cn[j] - cn[i - 1])

    n = len(pts)
    for k in range(1, n + 1):
        mm = max(
            min(avg(i, j) for j in range(k, n + 1))
            for i in range(1, k + 1)
        )
        assert ref[pts[k - 1][0]] == mm, k
    # and the fit is non-decreasing
    fits = [ref[x] for x, _, _ in pts]
    assert fits == sorted(fits)


def test_seasonal_anomaly_pages_on_residual_not_raw_peaks(spark):
    """The reason the composition exists: plant (a) a tall-but-NORMAL
    busy-hour peak that recurs every day (seasonal — must NOT flag)
    and (b) one hour whose value breaks its own slot's pattern
    (must flag). A raw-value MAD gate over the same series flags the
    daily peaks instead — pinned as the contrast."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.audit import mad_outliers
    from etl_capnz_spark.operators.timeseries import seasonal_decompose

    rows = []
    anomaly_h = dt.datetime(2024, 5, 4, 3)
    for d in range(8):
        for hod in range(24):
            h = dt.datetime(2024, 5, 1) + dt.timedelta(days=d, hours=hod)
            # moderate spike: a 25-row MA over a period-24 signal
            # leaks amplitude/25 into residuals (the textbook even-
            # period artifact) - keep leakage well under the gate
            v = 1000 + (1500 if hod == 12 else 0)  # daily noon spike
            v += (hod * 37) % 100                  # slot texture
            # aperiodic noise: a perfectly periodic series has
            # IDENTICAL residuals on most rows -> MAD = 0 -> the gate
            # degenerates to flag-everything (observed); ±70 noise
            # keeps MAD healthy and well under the anomaly
            import math
            v += round(70 * math.sin(d * 24 + hod))
            if h == anomaly_h:
                v += 4000                           # the real anomaly
            rows.append((h, v, hod))
    df = spark.createDataFrame(rows, "h timestamp, c long, slot int")
    dec = (
        seasonal_decompose(df, "h", "c", "slot", half=12)
        .filter(F.col("residual").isNotNull())
        .select("h", "residual", F.lit(1).alias("g"))
    )
    flagged = {
        r["h"] for r in mad_outliers(dec, "residual", "g", 3.5).collect()
    }
    assert anomaly_h in flagged
    noon_hours = {r[0] for r in rows if r[0].hour == 12}
    assert not (flagged & noon_hours)  # seasonal peaks never page

    raw = df.select("h", F.col("c").cast("double").alias("v"),
                    F.lit(1).alias("g"))
    raw_flagged = {
        r["h"] for r in mad_outliers(raw, "v", "g", 3.5).collect()
    }
    assert raw_flagged & noon_hours  # the raw gate DOES page on noon


def test_autocorrelation_finds_planted_period(spark):
    """A period-24 cosine must put the ACF maximum at lag 24 (≈ +1)
    and the minimum at lag 12 (≈ −1); an aperiodic ramp-free noise
    series must stay small at every lag."""
    import datetime as dt
    import math

    from etl_capnz_spark.operators.timeseries import autocorrelation

    rows = [
        (
            dt.datetime(2024, 5, 1) + dt.timedelta(hours=t),
            round(1000 + 500 * math.cos(2 * math.pi * t / 24)),
        )
        for t in range(24 * 10)
    ]
    df = spark.createDataFrame(rows, "h timestamp, c long")
    acf = {r["lag"]: r["acf"]
           for r in autocorrelation(df, "h", "c", max_lag=30).collect()}
    assert acf[24] > 0.99
    assert acf[12] < -0.99
    assert max(acf, key=lambda L: acf[L]) == 24
    assert min(acf, key=lambda L: acf[L]) == 12

    noise = [
        (
            dt.datetime(2024, 5, 1) + dt.timedelta(hours=t),
            round(1000 + 300 * math.sin(t * 12.9898 + t * t * 0.7)),
        )
        for t in range(240)
    ]
    df = spark.createDataFrame(noise, "h timestamp, c long")
    acf = {r["lag"]: r["acf"]
           for r in autocorrelation(df, "h", "c", max_lag=30).collect()}
    assert all(abs(v) < 0.35 for v in acf.values())


def test_cross_correlation_finds_planted_lead(spark):
    """Plant B as A shifted by +6 hours (plus texture): the XCF peak
    must land exactly at lag +6 with r ≈ 1, and the reversed pair
    peaks at −6 — sign convention pinned (positive lag = A leads)."""
    import datetime as dt
    import math

    from etl_capnz_spark.operators.timeseries import cross_correlation

    n = 240
    sig = [round(1000 + 400 * math.sin(t * 0.7) + 150 * math.cos(t * 1.3))
           for t in range(n + 6)]
    rows = [
        (dt.datetime(2024, 5, 1) + dt.timedelta(hours=t),
         sig[t], sig[t + 6])
        for t in range(n)
    ]
    df = spark.createDataFrame(rows, "h timestamp, a long, b long")
    # b_t = a_{t+6}: pairing (a_t, b_{t+lag}) peaks when t+lag+6 = t+... 
    xcf = {r["lag"]: r["xcf"]
           for r in cross_correlation(df, "h", "a", "b", 12).collect()}
    best = max(xcf, key=lambda L: xcf[L])
    assert xcf[best] > 0.99
    rev = {r["lag"]: r["xcf"]
           for r in cross_correlation(df, "h", "b", "a", 12).collect()}
    best_rev = max(rev, key=lambda L: rev[L])
    assert rev[best_rev] > 0.99
    assert best == -best_rev and abs(best) == 6


def test_forecast_backtest_calendar_lags_and_ratio(spark):
    """Calendar predecessors, not row lags: a missing day removes the
    origins that depend on it instead of mis-aligning the window; a
    perfectly weekly series gives mae_seasonal 0 (ratio 0); a
    constant series gives mae_naive 0 → NULL ratio."""
    import datetime as dt

    from etl_capnz_spark.operators.timeseries import forecast_backtest

    base = dt.date(2026, 1, 5)  # a Monday

    def day(i):
        return base + dt.timedelta(days=i)

    # group A: value = weekday index (period-7 exact), 21 days with
    # day 10 MISSING — days 11 (needs d-1) and 17 (needs d-7) drop
    rows = [
        ("A", day(i), (i % 7) + 10) for i in range(21) if i != 10
    ]
    # group B: constant series → naive is perfect
    rows += [("B", day(i), 5) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, d date, v long")
    got = {
        r["g"]: r for r in forecast_backtest(df, "g", "d", "v").collect()
    }
    a = got["A"]
    # origins: days 7..20 minus {10 (absent), 11 (no d-1), 17 (no d-7)}
    assert a["n_evals"] == 14 - 3
    assert a["mae_seasonal"] == 0.0  # exact weekly period
    assert a["mae_naive"] > 0
    assert a["mase_like_ratio"] == 0.0

    b = got["B"]
    assert b["n_evals"] == 3  # days 7,8,9
    assert b["mae_naive"] == 0.0 and b["mae_seasonal"] == 0.0
    assert b["mase_like_ratio"] is None
