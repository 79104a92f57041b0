"""Time-series similarity search (north-star extension, SURVEY.md §2.12,
cf. PAPERS.md: EDBT'19 streaming TS similarity, ICDE'21 REPOSE top-k).

Per-entity activity series (here: a user's daily event values) compared
against a query series, two tiers mirroring the ANN stack's
brute/approx split:

* ``l2_topk`` — exact L2 over fixed-length resampled series: fully
  Catalyst-expressible (zip_with + fold), oracle-checkable, and the
  cheap first-pass filter of every TS-similarity system.
* ``dtw_topk`` — Dynamic Time Warping with an optional Sakoe-Chiba
  band: the alignment-invariant distance (shifts/speed changes don't
  penalize). The O(n·m) DP is imperative → the sanctioned
  ``mapInPandas`` seam (Arrow-batched, numpy DP per row); everything
  around it (series build, top-k) stays JVM-side. Exactness is pinned
  in tests against a pure-Python reference (BPE-style discipline).

Series build (``daily_series``) is engine-portable: per-user days are
bucketed into ``n_buckets`` equal slices of the user's own [min_day,
max_day] span, bucket value = avg of the day sums, missing buckets 0 —
deterministic, no RNG, the same arithmetic in the DuckDB oracle.

Scale: the series table is one row per entity (corpus >> series), the
query side is a broadcast literal, distances are map-only, and top-k
plans as TakeOrderedAndProject — no global sort, no shuffle of losers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_series(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_buckets: int = 8,
) -> DataFrame:
    """One fixed-length activity series per user: (user, vals[n_buckets]).

    bucket = floor((day - user_min_day) * n / (span_days + 1)) — each
    user's own time range is split into ``n`` equal slices, so series
    compare SHAPE, not absolute calendar position. Values are rounded to
    6 dp (avg is a float; rounding keeps the series dialect-portable).
    """
    daily = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).alias("v"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("v").alias("day_v"))
    )
    w = (
        daily.groupBy("user_id").agg(
            F.min("day").alias("_d0"), F.max("day").alias("_d1")
        )
    )
    bucketed = (
        daily.join(w, "user_id")
        .select(
            "user_id",
            F.floor(
                F.datediff("day", "_d0")
                * n_buckets
                / (F.datediff("_d1", "_d0") + 1)
            )
            .cast("int")
            .alias("bucket"),
            "day_v",
        )
        .groupBy("user_id", "bucket")
        .agg(F.round(F.avg("day_v"), 6).alias("bv"))
    )
    grid = w.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket")
    )
    filled = grid.join(bucketed, ["user_id", "bucket"], "left").select(
        "user_id", "bucket", F.coalesce("bv", F.lit(0.0)).alias("bv")
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "bv"))),
                lambda s: s["bv"],
            ).alias("vals")
        )
    )


def _l2(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_topk(
    series: DataFrame, query_vals: list[float], k: int = 5
) -> DataFrame:
    """Exact L2 top-k against a literal query series (broadcast-free:
    the query is a constant array expression). Deterministic tie-break
    on user_id; distance rounded BEFORE ranking."""
    q = F.array(*[F.lit(float(x)) for x in query_vals])
    return (
        series.select(
            "user_id", F.round(_l2(F.col("vals"), q), 6).alias("dist")
        )
        .orderBy(F.col("dist").asc(), F.col("user_id").asc())
        .limit(k)
    )


def dtw_reference(a: list[float], b: list[float], band: int | None = None) -> float:
    """Pure-Python DTW (squared-step, sqrt at the end) — the exactness
    oracle for :func:`dtw_topk` and a readable spec of the DP."""
    import math

    n, m = len(a), len(b)
    inf = float("inf")
    prev = [inf] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [inf] * (m + 1)
        lo = 1 if band is None else max(1, i - band)
        hi = m if band is None else min(m, i + band)
        for j in range(lo, hi + 1):
            cost = (a[i - 1] - b[j - 1]) ** 2
            cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return math.sqrt(prev[m])


def dtw_topk(
    series: DataFrame,
    query_vals: list[float],
    k: int = 5,
    band: int | None = None,
) -> DataFrame:
    """DTW top-k via the sanctioned Arrow seam: ``mapInPandas`` computes
    the per-row DP with numpy (vectorized over the inner loop), the
    surrounding plan stays JVM-side and the top-k is
    TakeOrderedAndProject. ``band`` = Sakoe-Chiba half-width (None =
    unconstrained)."""
    import numpy as np

    q = np.asarray(query_vals, dtype=np.float64)
    bd = band

    def compute(batches):
        import pandas as pd

        m = len(q)
        for pdf in batches:
            dists = []
            for vals in pdf["vals"]:
                a = np.asarray(vals, dtype=np.float64)
                n = len(a)
                prev = np.full(m + 1, np.inf)
                prev[0] = 0.0
                for i in range(1, n + 1):
                    cur = np.full(m + 1, np.inf)
                    lo = 1 if bd is None else max(1, i - bd)
                    hi = m if bd is None else min(m, i + bd)
                    # vectorized inner loop: costs for the open band
                    cost = (a[i - 1] - q[lo - 1 : hi]) ** 2
                    # cur[j-1] dependency forces a scan, but numpy
                    # handles the min(prev[j], prev[j-1]) half
                    base = np.minimum(prev[lo : hi + 1], prev[lo - 1 : hi])
                    running = np.inf
                    for idx in range(hi - lo + 1):
                        running = cost[idx] + min(base[idx], running)
                        cur[lo + idx] = running
                    prev = cur
                dists.append(float(np.sqrt(prev[m])))
            yield pd.DataFrame(
                {"user_id": pdf["user_id"], "dist": np.round(dists, 6)}
            )

    scored = series.mapInPandas(compute, "user_id bigint, dist double")
    return scored.orderBy(F.col("dist").asc(), F.col("user_id").asc()).limit(k)


def user_trend(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity OLS trend via ``groupBy().applyInPandas`` — the
    grouped-map Arrow surface (each user's rows meet ONE pandas
    callback), fitting value ~ days-since-first-activity.

    The closed form (n·Σxy − ΣxΣy) / (n·Σx² − (Σx)²) is exact-checkable
    against the same SQL formula (sums of small doubles; slope and
    intercept rounded to 6 dp); a user whose activity all falls on one
    day has zero variance in x → NULL slope/intercept in both engines.
    x is computed JVM-side before the callback so the Python kernel is
    pure arithmetic. One shuffle on the user key; per-task state is one
    user's rows — the canonical grouped-map bound.
    """
    import pandas as pd
    from pyspark.sql.window import Window

    x = F.datediff(
        F.to_date(ts_col),
        F.min(F.to_date(ts_col)).over(Window.partitionBy(user_col)),
    )
    staged = events.select(
        F.col(user_col).alias("user_id"),
        x.cast("double").alias("x"),
        F.col(value_col).cast("double").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        xs = pdf["x"].tolist()
        ys = pdf["y"].tolist()
        n = float(len(xs))
        sx, sy = math.fsum(xs), math.fsum(ys)
        sxy = math.fsum(a * b for a, b in zip(xs, ys))
        sxx = math.fsum(a * a for a in xs)
        den = n * sxx - sx * sx
        if den != 0:
            slope = (n * sxy - sx * sy) / den
            slope_r = round(slope, 6)
            icept_r = round((sy - slope * sx) / n, 6)
        else:
            slope_r = icept_r = None
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [int(n)],
                "slope": [slope_r],
                "intercept": [icept_r],
            }
        )

    return staged.groupBy("user_id").applyInPandas(
        fit, "user_id bigint, n bigint, slope double, intercept double"
    )


def user_trend_arrow(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """:func:`user_trend` through ``groupBy().applyInArrow`` — the
    grouped RecordBatch seam (Spark 4's Arrow-native grouped map, no
    pandas materialization). Same fsum closed form, bit-identical
    output (equivalence pinned in tests); completes the engine's Arrow
    API matrix: mapInPandas / mapInArrow / applyInPandas(±state) /
    applyInArrow / cogroup."""
    import math

    import pyarrow as pa

    from pyspark.sql.window import Window

    x = F.datediff(
        F.to_date(ts_col),
        F.min(F.to_date(ts_col)).over(Window.partitionBy(user_col)),
    )
    staged = events.select(
        F.col(user_col).alias("user_id"),
        x.cast("double").alias("x"),
        F.col(value_col).cast("double").alias("y"),
    )

    def fit(table: pa.Table) -> pa.Table:
        xs = table.column("x").to_pylist()
        ys = table.column("y").to_pylist()
        n = float(len(xs))
        sx, sy = math.fsum(xs), math.fsum(ys)
        sxy = math.fsum(a * b for a, b in zip(xs, ys))
        sxx = math.fsum(a * a for a in xs)
        den = n * sxx - sx * sx
        if den != 0:
            slope = (n * sxy - sx * sy) / den
            slope_r = round(slope, 6)
            icept_r = round((sy - slope * sx) / n, 6)
        else:
            slope_r = icept_r = None
        return pa.table(
            {
                "user_id": pa.array(
                    [table.column("user_id")[0].as_py()], pa.int64()
                ),
                "n": pa.array([int(n)], pa.int64()),
                "slope": pa.array([slope_r], pa.float64()),
                "intercept": pa.array([icept_r], pa.float64()),
            }
        )

    return staged.groupBy("user_id").applyInArrow(
        fit, "user_id bigint, n bigint, slope double, intercept double"
    )


def ewma_per_group(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-group exponentially-weighted moving average — the canonical
    SEQUENTIAL recursion (y_i = α·x_i + (1−α)·y_{i−1}, y_1 = x_1) that
    no Spark window expresses: state at row i depends on row i−1's
    OUTPUT, not its input, so this is the sanctioned grouped-kernel
    seam (applyInPandas, same family as user_trend).

    The recursion is computed with the exact expression
    ``alpha*x + (1-alpha)*y`` per step and emitted RAW (no rounding:
    round-half ties are resolved differently across engines — Python
    half-even vs SQL half-away — and a dyadic alpha like 0.5 makes
    exact ties COMMON, observed breaking a 6dp-rounded oracle). With a
    power-of-two alpha both products are exact, each step's only
    rounding is the final add, and a DuckDB recursive CTE evaluating
    the same expression tree reproduces every double bit-identically
    even under FMA — an exact oracle for an iterative operator. Rows
    order by (ts, id) within the group for cross-engine ties.

    Shape: ONE hash exchange on the group key; per-task state is one
    group's series (same bound as any per-entity kernel — at 100 TB
    groups are users/devices, not the corpus). Output: (group, id, ts,
    value, ewma raw double).
    """
    import pandas as pd

    a = float(alpha)

    def _ewma(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts_col, id_col])
        ys = []
        y = None
        for x in pdf[value_col]:
            x = float(x)
            y = x if y is None else a * x + (1.0 - a) * y
            ys.append(y)
        pdf = pdf.copy()
        pdf["ewma"] = ys
        return pdf

    fields = df.select(group_col, id_col, ts_col, value_col).schema
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", ewma double"
    return (
        df.select(group_col, id_col, ts_col, value_col)
        .groupBy(group_col)
        .applyInPandas(_ewma, out_schema)
    )


def holt_per_group(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Per-group Holt's linear trend (double exponential smoothing) —
    the level+trend extension of :func:`ewma_per_group`, forecasting
    the short-horizon drift a plain EWMA lags behind:

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        l_1 = x_1, b_1 = 0

    Like the EWMA, row t's state depends on row t−1's OUTPUT, so no
    Spark window expresses it and it lives in the sanctioned
    applyInPandas seam (ONE hash exchange on the group key; per-task
    state is one group's series). The bit-exactness discipline carries
    over: with dyadic α and β every product is exact (halving never
    rounds), each step's only roundings are the adds/subtract, and the
    kernel evaluates the recursion in EXACTLY the association written
    above — so a DuckDB RECURSIVE CTE evaluating the same expression
    tree reproduces every raw double bit-identically, even under FMA
    (a fused 0.5·x + s rounds once on an already-exact product, which
    equals the separate rounding). Output is RAW doubles — per-step
    rounding trips on half-even-vs-half-away ties (the EWMA lesson).

    Ties within a group order by (ts, id) in both engines.
    """
    import pandas as pd

    a = float(alpha)
    b_ = float(beta)

    def _holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts_col, id_col])
        ls, bs = [], []
        lev = trend = None
        for x in pdf[value_col]:
            x = float(x)
            if lev is None:
                lev, trend = x, 0.0
            else:
                prior = lev + trend
                new_lev = a * x + (1.0 - a) * prior
                trend = b_ * (new_lev - lev) + (1.0 - b_) * trend
                lev = new_lev
            ls.append(lev)
            bs.append(trend)
        pdf = pdf.copy()
        pdf["level"] = ls
        pdf["trend"] = bs
        return pdf

    fields = df.select(group_col, id_col, ts_col, value_col).schema
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", level double, trend double"
    return (
        df.select(group_col, id_col, ts_col, value_col)
        .groupBy(group_col)
        .applyInPandas(_holt, out_schema)
    )


def cusum_alarms(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    level: float = 64.0,
    threshold: float = 128.0,
) -> DataFrame:
    """Per-group one-sided CUSUM changepoint detection with
    reset-on-alarm: s_i = max(0, s_{i-1} + x_i − level); when s_i
    exceeds ``threshold`` the row is emitted as an alarm and the
    statistic resets to 0 — the sequential monitor for "has this
    series drifted high?" that, like :func:`ewma_per_group`, no Spark
    window expresses (state depends on the previous row's OUTPUT).

    Bit-exact oracle discipline (the EWMA rules): the step is adds and
    subtracts ONLY — no multiply, so no FMA hazard — evaluated in the
    exact association ``max(0, (s + x) − level)`` that the DuckDB
    recursive-CTE oracle writes as ``greatest(0.0, (s + x) − level)``;
    the statistic is emitted RAW (round-half ties across engines broke
    a rounded oracle before). Rows order by (ts, id) within the group.

    Shape: ONE hash exchange on the group key; per-task state is one
    group's series. Output: (group, id, ts, cusum) — alarm rows only.
    """
    import pandas as pd

    lvl, thr = float(level), float(threshold)

    def _cusum(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts_col, id_col])
        mask, vs = [], []
        s = 0.0
        for x in pdf[value_col]:
            v = max(0.0, (s + float(x)) - lvl)
            if v > thr:
                mask.append(True)
                vs.append(v)
                s = 0.0
            else:
                mask.append(False)
                s = v
        # Slice the input frame rather than rebuilding columns: an
        # all-quiet group otherwise emits empty float64 columns that
        # Arrow refuses to cast back to timestamp/int (observed).
        out = pdf.loc[mask, [group_col, id_col, ts_col]].copy()
        out["cusum"] = vs
        return out

    fields = df.select(group_col, id_col, ts_col).schema
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", cusum double"
    return (
        df.select(group_col, id_col, ts_col, value_col)
        .groupBy(group_col)
        .applyInPandas(_cusum, out_schema)
    )


def cusum_step(
    batch: DataFrame,
    state: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    level: float = 64.0,
    threshold: float = 128.0,
) -> DataFrame:
    """One micro-batch of the CUSUM recursion CONTINUED from carried
    per-group state — the streaming half of :func:`cusum_alarms`
    (identical step arithmetic, so streamed == batch is pinnable
    bit-for-bit). ``state`` has columns (group, s double): the
    statistic as of the end of the previous batch; groups absent from
    it start at 0 like a fresh series.

    Cogrouped seam (state ⟕⟖ batch by group): every group present on
    EITHER side emits exactly one carry-over row (``is_state`` true,
    the end-of-batch statistic in ``cusum``, id/ts NULL) plus its alarm
    rows (``is_state`` false) — one output frame so the sink can
    localCheckpoint once and split. State-only groups pass their
    statistic through unchanged (a quiet sensor keeps its level).
    """
    import pandas as pd

    lvl, thr = float(level), float(threshold)

    def _step(key, left: "pd.DataFrame", right: "pd.DataFrame"):
        s = float(left["s"].iloc[0]) if len(left) else 0.0
        right = right.sort_values([ts_col, id_col])
        mask, vs = [], []
        for x in right[value_col]:
            v = max(0.0, (s + float(x)) - lvl)
            if v > thr:
                mask.append(True)
                vs.append(v)
                s = 0.0
            else:
                mask.append(False)
                s = v
        alarms = right.loc[mask, [group_col, id_col, ts_col]].copy()
        alarms["cusum"] = vs
        alarms["is_state"] = False
        carry = pd.DataFrame(
            {
                group_col: pd.Series([key[0]]),
                id_col: pd.Series([pd.NA], dtype="Int64"),
                ts_col: pd.Series([pd.NaT], dtype="datetime64[ns]"),
                "cusum": pd.Series([s], dtype="float64"),
                "is_state": pd.Series([True]),
            }
        )
        return pd.concat([alarms, carry], ignore_index=True)

    fields = batch.select(group_col, id_col, ts_col).schema
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", cusum double, is_state boolean"
    return (
        batch.select(group_col, id_col, ts_col, value_col)
        .groupby(group_col)
        .cogroup(state.groupby(group_col))
        .applyInPandas(
            lambda key, r, l: _step(key, l, r), out_schema
        )
    )


def rolling_median(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    window_rows: int = 5,
) -> DataFrame:
    """Per-group rolling median over the last ``window_rows`` rows —
    the robust smoother Spark has no window aggregate for (there is no
    median() OVER). Bridged JVM-side: collect_list over the ROWS frame
    + array_sort + order-statistic pick, all whole-stage-codegen
    built-ins on ONE group-key exchange — the window holds ≤
    ``window_rows`` values per row, so the arrays are bounded and
    map-side cheap (this is NOT the unbounded collect_list hazard).

    Even windows interpolate as ``(lo + hi) / 2`` — PROBED to be
    DuckDB's actual median formula on doubles, deliberately NOT the
    algebraically-equal lerp ``lo + (hi−lo)*0.5``, which rounds at a
    different point and differed in the last ulp on 2 of 1000 rows at
    sf0.001 (observed; the EWMA float-trap discipline: mirror the
    oracle's expression tree, emit raw). Rows order by (ts, id) for
    cross-engine ties.

    Output: input keys + ``med`` (raw double).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.array_sort(
        F.collect_list(F.col(value_col).cast("double")).over(w)
    )
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)
    return df.select(
        group_col, id_col, ts_col, F.col(value_col).cast("double")
    ).withColumn("med", med)


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan-Meier survival estimator over right-censored durations —
    the time-to-event curve (retention, churn, time-to-conversion)
    computed distributively: S(t) = Π_{u ≤ t} (1 − d_u / n_u) with
    d_u events at time u and n_u subjects still at risk.

    Exactness discipline: d and n are integers from one aggregate;
    the only float steps are the per-time ratio (one division) and the
    cumulative product, which BOTH engines evaluate as the identical
    left fold over the time-ordered ratio list (collect_list over a
    ROWS UNBOUNDED PRECEDING frame + F.aggregate here; list(... ORDER
    BY) + list_reduce in the oracle) — same association, bit-exact,
    raw doubles out (the EWMA lesson: no rounding).

    Shape: one groupBy(duration) aggregate collapses the cohort to at
    most |distinct durations| rows; the cumulative windows then run on
    that TIME-AXIS table, which is calendar-bounded (days in the
    observation window), not cohort-sized — the one-partition window
    is over dozens of rows by construction. (For an unbounded time
    axis, swap in the two-phase sharded prefix scan used by
    histogram_equidepth.) Censored-only times carry ratio 1 and drop
    from the output after accumulation, so they shape n_risk without
    adding steps — the textbook curve.

    Output: (t, n_risk, n_events, n_censored, survival), event times
    only, ascending.
    """
    from pyspark.sql.window import Window

    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(observed_col).cast("long")).alias("n_events"),
        F.count(F.lit(1)).alias("n_at_t"),
    )
    from .rank import bounded_const_key

    # distinct-duration table (time-grid bounded); constant-keyed so
    # the deliberate single-effective-partition windows stay
    # warning-silent (rank.bounded_const_key)
    _k = bounded_const_key(F.col("t"))
    w_all = Window.partitionBy(_k).orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.partitionBy(_k).orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.partitionBy(_k).orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_risk = per_t.withColumn(
        "n_risk",
        F.sum("n_at_t").over(w_all)
        - F.coalesce(F.sum("n_at_t").over(w_prev), F.lit(0)),
    ).withColumn(
        "_ratio",
        F.lit(1.0) - F.col("n_events") / F.col("n_risk"),
    )
    surv = with_risk.withColumn(
        "survival",
        F.aggregate(
            F.collect_list("_ratio").over(w_cum),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ),
    )
    return surv.filter(F.col("n_events") > 0).select(
        "t",
        "n_risk",
        "n_events",
        (F.col("n_at_t") - F.col("n_events")).alias("n_censored"),
        "survival",
    )


def seasonal_decompose(
    hourly: DataFrame,
    t_col: str,
    cents_col: str,
    slot_col: str,
    half: int = 12,
) -> DataFrame:
    """Classical additive seasonal decomposition (trend + seasonal +
    residual) of a regular integer-valued series — the anomaly-
    triage lens (is the spike trend, time-of-day, or genuinely
    unexplained?).

    The whole decomposition is arranged so every float is an exact
    integer numerator over a constant denominator, making raw doubles
    bit-reproducible cross-engine with NO rounding anywhere:

    * trend = (Σ window cents) / w, w = 2·half+1 — the window sum of
      INTEGERS is exact whatever the evaluation order;
    * detrended ≡ (w·x − Σwindow)/w — the numerator stays integer;
    * seasonal(slot) = (Σ_slot detrend_num) / (w · n_slot) — again an
      integer sum over an integer product;
    * residual = detrend_num/w − seasonal — two exact-numerator
      divisions and one subtract, identical trees per engine.

    Trend (and everything downstream) is NULL on the first/last
    ``half`` rows (incomplete window) — the textbook edge contract.
    The ordered window runs on the TIME AXIS (calendar-bounded rows,
    the kaplan_meier argument), not the raw events.

    Input: one row per time step (t_col ascending-unique, cents_col
    exact integer, slot_col the seasonal position — e.g. hour of day).
    Output: (t_col, cents, slot, trend, seasonal, residual).
    """
    from pyspark.sql.window import Window

    from .rank import bounded_const_key

    w = 2 * half + 1
    # one row per time step (grid-bounded); warning-silent const key
    win = (
        Window.partitionBy(bounded_const_key(F.col(t_col)))
        .orderBy(t_col)
        .rowsBetween(-half, half)
    )
    base = hourly.select(
        F.col(t_col),
        F.col(cents_col).cast("bigint").alias("cents"),
        F.col(slot_col).alias("slot"),
    ).withColumn(
        "_tn",
        F.when(
            F.count(F.lit(1)).over(win) == w, F.sum("cents").over(win)
        ),
    ).withColumn(
        "_dn", F.lit(w) * F.col("cents") - F.col("_tn")
    )
    seas = (
        base.filter(F.col("_dn").isNotNull())
        .groupBy("slot")
        .agg(
            F.sum("_dn").alias("_sn"),
            F.count(F.lit(1)).alias("_sc"),
        )
    )
    out = base.join(F.broadcast(seas), "slot", "left")
    seasonal = F.col("_sn") / (F.lit(float(w)) * F.col("_sc"))
    return out.select(
        t_col,
        "cents",
        "slot",
        (F.col("_tn") / F.lit(float(w))).alias("trend"),
        F.when(F.col("_dn").isNotNull(), seasonal).alias("seasonal"),
        F.when(
            F.col("_dn").isNotNull(),
            F.col("_dn") / F.lit(float(w)) - seasonal,
        ).alias("residual"),
    )


def pava_reference(
    points: "list[tuple[int, int, int]]",
) -> "list[tuple[int, int, int, float]]":
    """Pure-Python pool-adjacent-violators over (x, n, sum_y) triples
    sorted by x: merge adjacent pools while a left pool's mean exceeds
    its right neighbour's, tracking EXACT integer (sum, count) per
    pool. Returns (x, n, sum_y, fit) — fit is the pool mean, ONE
    division of exact integers. The readable spec for
    :func:`isotonic_fit` and the direct algorithmic contrast to the
    oracle's minimax identity fit_k = max_{i≤k} min_{j≥k} avg(y_i..j)
    (equal as reals; IEEE rounding is monotone, so max/min commute
    with it and the doubles agree exactly)."""
    pools: list[list[int]] = []  # [sum_y, n, first_idx]
    for idx, (_, n, sy) in enumerate(points):
        pools.append([sy, n, idx])
        while len(pools) > 1 and (
            pools[-2][0] * pools[-1][1] >= pools[-1][0] * pools[-2][1]
        ):
            s, c, i0 = pools.pop()
            pools[-1][0] += s
            pools[-1][1] += c
    out = []
    bounds = [p[2] for p in pools] + [len(points)]
    for (sy, c, _), lo, hi in zip(pools, bounds, bounds[1:]):
        for idx in range(lo, hi):
            x, n, y = points[idx]
            out.append((x, n, y, sy / c))
    return out


def isotonic_fit(
    bins: DataFrame,
    x_col: str,
    n_col: str,
    y_col: str,
) -> DataFrame:
    """Isotonic regression (PAVA) over pre-binned (x, count, Σlabel)
    rows — the classifier-calibration step (monotone P(label | score)
    without a parametric form).

    The sequential pool-merging is inherently imperative, BUT it runs
    on the BIN table (bounded by the binning grid, not the data — the
    same bounded-domain argument as kaplan_meier's time axis), so one
    grouped kernel sees a few dozen rows regardless of corpus size;
    the O(data) work (binning, counting) stays in the JVM aggregate
    upstream. Pools carry EXACT integer (Σy, n); the fit is one
    division per pool, so raw doubles cross-check against the
    brute-force minimax oracle exactly (see :func:`pava_reference`).

    PAVA merges on >= (ties pool), the standard convention. Output:
    (x_col, n, sum_y, fit), ascending x.
    """
    import pandas as pd

    def _fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("_x")
        pts = list(zip(pdf["_x"], pdf["_n"], pdf["_sy"]))
        rows = pava_reference([(int(x), int(n), int(s)) for x, n, s in pts])
        return pd.DataFrame(
            rows, columns=["_x", "_n", "_sy", "fit"]
        )

    staged = bins.select(
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(n_col).cast("bigint").alias("_n"),
        F.col(y_col).cast("bigint").alias("_sy"),
        F.lit(1).alias("_g"),
    )
    out = staged.groupBy("_g").applyInPandas(
        _fit, "_x bigint, _n bigint, _sy bigint, fit double"
    )
    return out.select(
        F.col("_x").alias(x_col),
        F.col("_n").alias(n_col),
        F.col("_sy").alias(y_col),
        "fit",
    )


def autocorrelation(
    series: DataFrame,
    t_col: str,
    cents_col: str,
    max_lag: int = 48,
) -> DataFrame:
    """Autocorrelation function over a regular integer-valued series —
    the PERIOD DETECTOR: :func:`seasonal_decompose` assumes you know
    the season length; the ACF's first major peak (lag 24 on hourly
    business data) is how you find it, and a flat ACF says "don't
    bother decomposing".

    Pearson r at each lag L over the (x_t, x_{t+L}) pairs. Lag pairs
    come from ONE equi-join: each row fans out to (rn + L) target
    slots for L = 1..max_lag (bounded fan-out of the time-axis table,
    the calendar-bounded argument), joined back on the row number —
    no per-lag window pass, no dynamic `lead` offset (Spark requires
    literal offsets). Every moment is an exact integer sum per lag;
    r is one closed-form float tree over sums cast to double (the
    int64-overflow rule), rounded 6dp.

    Input must be one row per time step. Output: (lag, n_pairs, acf).
    """
    from pyspark.sql.window import Window

    from .rank import bounded_const_key

    # one row per time step (grid-bounded); warning-silent const key
    w = Window.partitionBy(bounded_const_key(F.col(t_col))).orderBy(t_col)
    base = series.select(
        F.col(cents_col).cast("bigint").alias("x"),
        F.row_number().over(w).alias("rn"),
    )
    fan = base.select(
        "x",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(max_lag)))
        ).alias("lag"),
        (F.col("rn") + F.col("lag")).alias("target"),
    )
    pairs = fan.join(
        base.select(
            F.col("x").alias("y"), F.col("rn").alias("target")
        ),
        "target",
    )
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    n = d("n_pairs")
    num = n * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (n * d("sxx") - d("sx") * d("sx"))
        * (n * d("syy") - d("sy") * d("sy"))
    )
    return agg.select(
        "lag",
        "n_pairs",
        F.round(num / den, 6).alias("acf"),
    ).orderBy("lag")


def cross_correlation(
    series: DataFrame,
    t_col: str,
    a_col: str,
    b_col: str,
    max_lag: int = 24,
) -> DataFrame:
    """Cross-correlation between two aligned integer series — the
    lead/lag discovery tool (`does A lead B, and by how much?`): the
    lag of the XCF peak is the offset at which A best predicts B
    (positive lag = A leads). The causal-structure complement of
    :func:`autocorrelation`'s period detection.

    Pairs (a_t, b_{t+lag}) for lag = −max_lag..max_lag via the same
    bounded fan-out + row-number equi-join (negative lags ride the
    same join — the target index just shifts the other way). Exact
    integer moments per lag; closed-form Pearson over double-cast
    sums, 6dp. Output: (lag, n_pairs, xcf), lag ascending.
    """
    from pyspark.sql.window import Window

    from .rank import bounded_const_key

    # one row per time step (grid-bounded); warning-silent const key
    w = Window.partitionBy(bounded_const_key(F.col(t_col))).orderBy(t_col)
    base = series.select(
        F.col(a_col).cast("bigint").alias("a"),
        F.col(b_col).cast("bigint").alias("b"),
        F.row_number().over(w).alias("rn"),
    )
    fan = base.select(
        "a",
        F.explode(
            F.sequence(F.lit(-int(max_lag)), F.lit(int(max_lag)))
        ).alias("lag"),
        (F.col("rn") + F.col("lag")).alias("target"),
    )
    pairs = fan.join(
        base.select(F.col("b").alias("y"), F.col("rn").alias("target")),
        "target",
    )
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("a").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("a") * F.col("y")).alias("sxy"),
        F.sum(F.col("a") * F.col("a")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    n = d("n_pairs")
    num = n * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (n * d("sxx") - d("sx") * d("sx"))
        * (n * d("syy") - d("sy") * d("sy"))
    )
    return agg.select(
        "lag", "n_pairs", F.round(num / den, 6).alias("xcf")
    ).orderBy("lag")


def forecast_backtest(
    df: DataFrame,
    group_col: str,
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Rolling-origin backtest of the two baseline forecasters every
    real model must beat — naive (yesterday's value) and
    seasonal-naive (same weekday last week) — over a daily series:
    the time-series analogue of dedup_eval_prf's 'measure the
    operating point before trusting it'. For each group, every day
    whose d−1 AND d−7 both exist is an evaluation origin (both
    forecasters must be comparable on the SAME origins, else the MAE
    ratio is meaningless); per group the report is n_evals, each
    MAE, and the seasonal/naive ratio — ratio < 1 means weekly
    seasonality is real and a seasonal model is worth building.

    CALENDAR lags, not row lags: predecessors come from two self
    equi-joins on (group, date−1)/(group, date−7), so a missing day
    is a missing forecast, never a silently mis-aligned window.
    Errors are exact |integer − integer|; MAEs are one division each
    at the end, 6dp; the ratio emits NULL when mae_naive = 0 (a
    constant series makes the comparison undefined, not infinite).

    Input contract: one row per (group, date) — the operator consumes
    an already-aggregated daily series (the rouge2_pairs discipline:
    duplicate keys would fan out the calendar joins and double-count
    their origins; callers aggregate first, as the
    events_forecast_backtest entry does with its groupBy).

    Scale shape: the daily table is (groups × days)-sized; both
    predecessor joins re-use the same (group, date) hash
    partitioning, and the final per-group aggregate is
    group-domain-sized.

    Output: one row per group —
    (group_col, n_evals, mae_naive, mae_seasonal, mase_like_ratio).
    """
    day = df.select(
        F.col(group_col).alias("g"),
        F.col(date_col).alias("d"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    cur = day.alias("cur")
    prev1 = day.select(
        "g", F.date_add(F.col("d"), 1).alias("d"), F.col("v").alias("p1")
    ).alias("p1")
    prev7 = day.select(
        "g", F.date_add(F.col("d"), 7).alias("d"), F.col("v").alias("p7")
    ).alias("p7")
    joined = cur.join(prev1, ["g", "d"]).join(prev7, ["g", "d"])
    scored = joined.select(
        "g",
        F.abs(F.col("v") - F.col("p1")).alias("e1"),
        F.abs(F.col("v") - F.col("p7")).alias("e7"),
    )
    agg = scored.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_evals"),
        F.sum("e1").cast("bigint").alias("_s1"),
        F.sum("e7").cast("bigint").alias("_s7"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    mae1 = d("_s1") / d("n_evals")
    mae7 = d("_s7") / d("n_evals")
    return agg.select(
        F.col("g").alias(group_col),
        "n_evals",
        F.round(mae1, 6).alias("mae_naive"),
        F.round(mae7, 6).alias("mae_seasonal"),
        F.when(F.col("_s1") > 0, F.round(mae7 / mae1, 6)).alias(
            "mase_like_ratio"
        ),
    )



def decayed_counts(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    ref_date: str,
    half_life_days: int = 7,
) -> DataFrame:
    """Time-decayed ("trending") counters — the recency-weighted count
    a feed ranker or hot-topic monitor keeps per key: each event
    contributes weight 2^(−steps) where steps = age_days div
    half_life_days (piecewise-constant exponential decay, halving once
    per half-life). The power-of-2 base is the point: every weight is
    the exact integer 2³⁰ >> steps in micro-units, so the aggregate is
    a plain bigint SUM — order-independent, partition-independent, and
    oracle-exact, where an e^(−λ·age) weight would hit both the libm
    ln/exp divergence AND the float-sum ordering hazard (the q9
    class). The single float is the final unscale division.

    One narrow projection + one two-phase hash aggregate; only
    (group, n, weight-sum) tuples shuffle. Events from after
    ``ref_date`` (negative age) clamp to full weight rather than
    amplifying — a decayed counter never exceeds 1 per event.

    Output: (group_col, n, decayed_count, decay_ratio) — decayed_count
    = Σ weights (≤ n), decay_ratio = decayed_count / n, both 6dp.
    """
    if half_life_days <= 0:
        raise ValueError("half_life_days must be positive")
    # ref_date is interpolated into an F.expr SQL string below: a
    # malformed (or quote-carrying) value must fail HERE as a clear
    # ValueError, not as a confusing parse error at plan time — the
    # half_life_days int() discipline applied to the date (ADVICE r8)
    import datetime

    ref_date = datetime.date.fromisoformat(str(ref_date)).isoformat()
    # SQL form because the python-API shift helpers take only literal
    # counts; greatest(0, ...) clamps future events to full weight and
    # least(62, ...) keeps the shift in bigint range
    w = F.expr(
        f"shiftright(1073741824L, cast(greatest(0, least(62, "
        f"datediff(cast('{ref_date}' as date), cast(`{ts_col}` as date)) "
        f"div {int(half_life_days)})) as int))"
    )
    per = (
        df.select(F.col(group_col).alias("grp"), w.alias("_w"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_w").cast("bigint").alias("_ws"),
        )
    )
    unscale = 1073741824.0
    return per.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(F.col("_ws").cast("double") / F.lit(unscale), 6).alias(
            "decayed_count"
        ),
        F.round(
            F.col("_ws").cast("double")
            / (F.lit(unscale) * F.col("n").cast("double")),
            6,
        ).alias("decay_ratio"),
    )
