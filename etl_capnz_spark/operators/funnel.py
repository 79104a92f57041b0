"""Ordered-funnel and cohort-retention analytics over event streams —
the two classic product-analytics aggregations every events warehouse
serves (and therefore this engine must), both exactly SQL-expressible
and oracle-checked.

Scale shape: every stage aggregates or joins on the user key, so the
whole computation re-uses ONE hash partitioning; event payloads never
shuffle (only (user, ts) pairs per funnel level, each pre-filtered to
its step's event type — predicate pushdown keeps non-participating
rows out of the exchange entirely). Funnel levels chain joins instead
of window-scanning whole user timelines, so per-user state is one
timestamp, not the event history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Strictly-ordered funnel: a user converts to step i+1 only with
    an event of that type STRICTLY AFTER their earliest qualifying
    time for step i (the standard product-analytics semantics — a
    purchase logged before the first view does not count, pinned in
    tests).

    Level i is (user, earliest qualifying ts); level i+1 filters the
    next step's events to ts > level_i.t and takes the min — a chain
    of keys-only joins, each step's scan pre-filtered to one event
    type. Output: (step int 1-based, step_name, n_users), one row per
    step, monotonically non-increasing.
    """
    user, ts = F.col(user_col), F.col(ts_col)
    level = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("_t"))
    )
    out = level.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit(1).alias("step"),
        F.lit(steps[0]).alias("step_name"),
        "n_users",
    )
    for i, step in enumerate(steps[1:], start=2):
        level = (
            df.filter(F.col(type_col) == step)
            .join(level, user_col)
            .filter(ts > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts).alias("_t"))
        )
        out = out.unionByName(
            level.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step"),
                F.lit(step).alias("step_name"),
                "n_users",
            )
        )
    return out


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    FIRST event; for each (cohort, week-offset) the number of cohort
    members active that week. Offset 0 is the cohort's own week, so
    its count equals the cohort size.

    Two aggregations on the user key (first-seen, distinct
    user-weeks) plus one keys-only join; the offset is integer
    arithmetic on date_trunc('week') boundaries — exact and
    dialect-portable. Output: (cohort_week date, week_offset int,
    n_users), useful directly as the retention-triangle table.
    """
    first = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    active = df.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("_week"),
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    touch_types: list[str],
    convert_type: str,
    lookback_seconds: int,
) -> DataFrame:
    """Multi-touch attribution: every touchpoint (event with type in
    ``touch_types``) is credited to the NEXT conversion after it on the
    same user within ``lookback_seconds`` — each touch counts toward at
    most ONE conversion (the standard no-double-counting rule), and per
    conversion the first and last touches carry the position credits.

    No self-join: one per-user window ordered by (ts, id) carries "next
    conversion after me" as a running min over a FOLLOWING ROWS frame.
    Composite (ts, id) keys travel as fixed-width zero-padded strings —
    the dialect-portable struct-min (DuckDB can't min a struct in a
    window; the lpad encoding orders identically in both engines), and
    the first/last channel per conversion rides the same trick with the
    channel name appended AFTER the fixed-width prefix (unique ids make
    prefix ties impossible). Everything downstream is integer counts —
    exact cross-engine; the fractional "linear credit" variant is
    deliberately n_touches-based so no float sum order can wobble.

    Shape: one hash exchange on the user for the window, then
    key-only aggregates by conversion and by channel; the three
    channel-level aggregates join on the tiny channel key (broadcast).

    Output per channel: (channel, n_touches, n_conversions,
    first_touch, last_touch) — touches attributed, conversions the
    channel participated in, and conversions where the channel was
    the first / the last touch. Channels with no attributed touches
    do not appear (they have no rows to count).
    """
    us = F.unix_micros(F.col(ts_col))
    key = F.format_string(
        "%020d%012d", us, F.col(id_col).cast("bigint")
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    is_conv = F.col(type_col) == convert_type
    staged = df.withColumn("_k", key).withColumn(
        "_next_conv", F.min(F.when(is_conv, key)).over(w)
    )
    conv_us = F.substring("_next_conv", 1, 20).cast("bigint")
    touches = staged.filter(
        F.col(type_col).isin(list(touch_types))
        & F.col("_next_conv").isNotNull()
        & (conv_us - us <= lookback_seconds * 1_000_000)
    ).select(
        F.col(user_col).alias("_u"),
        F.col("_next_conv").alias("_conv"),
        F.col(type_col).alias("channel"),
        F.concat(F.col("_k"), F.col(type_col)).alias("_tagged"),
    )
    per_conv = touches.groupBy("_u", "_conv").agg(
        F.substring(F.min("_tagged"), 33, 1024).alias("_first"),
        F.substring(F.max("_tagged"), 33, 1024).alias("_last"),
    )
    by_channel = touches.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.count_distinct(F.col("_conv")).alias("n_conversions"),
    )
    firsts = per_conv.groupBy(F.col("_first").alias("channel")).agg(
        F.count(F.lit(1)).alias("first_touch")
    )
    lasts = per_conv.groupBy(F.col("_last").alias("channel")).agg(
        F.count(F.lit(1)).alias("last_touch")
    )
    return (
        by_channel.join(firsts, "channel", "left")
        .join(lasts, "channel", "left")
        .select(
            "channel",
            "n_touches",
            "n_conversions",
            F.coalesce("first_touch", F.lit(0)).cast("bigint").alias(
                "first_touch"
            ),
            F.coalesce("last_touch", F.lit(0)).cast("bigint").alias(
                "last_touch"
            ),
        )
    )


def _q6(c: Column) -> Column:
    """6dp quantization in pure IEEE ops — floor(x·10⁶ + 0.5)/10⁶:
    round-half-up like ROUND(x, 6), but ENGINE-PORTABLE. The round-9
    sf1.0 sweep caught DuckDB's round() mis-rounding within an ulp at
    ≥16 significant digits (the identical double 1603980571.7090034 —
    bit-for-bit the same in both engines — rounded to …709004 there
    and …709003 in Spark's exact BigDecimal round). Multiply, add,
    floor, divide are each IEEE-correctly-rounded in every engine, so
    this form maps the same input double to the same output double
    everywhere. Use it instead of ROUND for any 6dp output whose
    magnitude can reach ~1e9+ (16 significant digits)."""
    m = F.lit(1000000.0)
    return F.floor(c * m + F.lit(0.5)) / m


def cuped(
    df: DataFrame,
    arm_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. WSDM'13) — the modern
    experiment readout: adjust the post-period metric with the
    pre-period covariate, y_adj = y − θ·(x − x̄_pool) with
    θ = cov(x,y)/var(x) pooled across arms, shrinking variance by the
    squared x↔y correlation without biasing the contrast.

    Exactness: x and y are expected as EXACT integers (cents — the
    rollup discipline: float per-user sums are partition-order-
    dependent), so every moment (Σx, Σy, Σxy, Σx², Σy²) is exact off
    ONE per-arm aggregate; θ and the adjusted stats are closed forms
    over those sums — var(y−θx) = var_y − 2θ·cov + θ²·var_x — so no
    second pass materializes y_adj. Sums cast to double BEFORE the
    moment products (n·Σxy − Σx·Σy overflows int64 in the 100 TB
    regime; one double product rounds once, identically per engine).

    Shape: one per-arm aggregate (arm-count rows), pooled θ from
    summing those rows (a second tiny aggregate), broadcast back into
    the per-arm projection. Output per arm: n_users, mean_y, var_y,
    mean_y_adj, var_y_adj, var_reduction — all rounded 6dp.
    """
    # Σxy / Σx² / Σy² accumulate in DECIMAL(38,0): per-row products of
    # cent-scale int64s (~1e6² = 1e12 each) leave int64 near 1e7 rows —
    # trivially the 100 TB regime. decimal(19,0)·decimal(19,0) widens
    # to decimal(38,0) and sums exactly (the gini_coefficient
    # discipline, audit.py); totals cast to double once in the closed
    # forms below.
    xd = F.col(x_col).cast("decimal(19,0)")
    yd = F.col(y_col).cast("decimal(19,0)")
    per_arm = df.groupBy(arm_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x_col).alias("sx"),
        F.sum(y_col).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    pooled = per_arm.agg(
        F.sum("n").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
        F.sum("sxx").alias("psxx"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    theta = (d("pn") * d("psxy") - d("psx") * d("psy")) / (
        d("pn") * d("psxx") - d("psx") * d("psx")
    )
    xbar_pool = d("psx") / d("pn")
    j = per_arm.crossJoin(
        F.broadcast(
            pooled.select(
                theta.alias("_theta"), xbar_pool.alias("_xbar")
            )
        )
    )
    mean_x = d("sx") / d("n")
    mean_y = d("sy") / d("n")
    var_y = d("syy") / d("n") - mean_y * mean_y
    var_x = d("sxx") / d("n") - mean_x * mean_x
    cov = d("sxy") / d("n") - mean_x * mean_y
    t = F.col("_theta")
    mean_adj = mean_y - t * (mean_x - F.col("_xbar"))
    var_adj = var_y - F.lit(2.0) * t * cov + t * t * var_x
    # _q6, not F.round: var magnitudes reach 1e9+ cents² (16 sig
    # digits at 6dp), where DuckDB's round() mis-rounds within an ulp
    # — the round-9 sf1.0 sweep catch
    return j.select(
        arm_col,
        F.col("n").alias("n_users"),
        _q6(mean_y).alias("mean_y"),
        _q6(var_y).alias("var_y"),
        _q6(mean_adj).alias("mean_y_adj"),
        _q6(var_adj).alias("var_y_adj"),
        _q6(F.lit(1.0) - var_adj / var_y).alias("var_reduction"),
    )


def mann_whitney(
    df: DataFrame,
    arm_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test — the nonparametric
    experiment readout: compares arms by RANKS, so a heavy-tailed
    metric (revenue!) can't hand the verdict to a few whales the way
    the t/z families do. Completes the experiment suite: proportions
    (events_ab_test), variance-reduced means (cuped), now ranks.

    Exact-arithmetic construction: values are expected integer
    (cents), ranks live at the VALUE level — one groupBy(value) then
    the two-phase sharded prefix sum (operators/rank.py
    cumsum_sharded) over the distinct-value table (domain-bounded:
    distinct cent amounts, not units — and no partition ever sorts
    more than ~domain/32 of it). Tied values take the average
    rank, carried DOUBLED (min+max rank = 2·lt + n + 1 stays integer)
    so every rank sum is an exact integer halved once at the end.
    The tie-corrected z uses the standard normal approximation
    σ² = (nA·nB/12)·((N+1) − Σ(t³−t)/(N(N−1))) — moments cast to
    double BEFORE products (the 100 TB int64-overflow rule), one
    identical expression tree per engine, rounded 6dp.

    ``arm_col`` must have exactly TWO values; the lexicographically
    smaller one is "a". Output: 1 row (n_a, n_b, u_a, u_b, z) with
    u_a + u_b = nA·nB (the identity, pinned in tests).
    """
    from pyspark.sql.window import Window

    arms = df.select(F.col(arm_col).alias("_arm")).distinct()
    lo = arms.agg(F.min("_arm").alias("_lo"))
    vals = (
        df.select(
            F.col(arm_col).alias("_arm"),
            F.col(value_col).cast("bigint").alias("_v"),
        )
        .crossJoin(F.broadcast(lo))
        .groupBy("_v")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("_arm") == F.col("_lo"), 1).otherwise(0)
            ).alias("na"),
        )
    )
    from .rank import cumsum_sharded

    cum, _ = cumsum_sharded(
        vals, [F.col("_v").asc()], ["n"], inclusive=False
    )
    ranked = cum.withColumnRenamed("cum_n", "lt").withColumn(
        "r2", 2 * F.col("lt") + F.col("n") + 1
    )
    # Σ(na·r2) and Σ(n³−n) accumulate in DECIMAL(38,0): r2 ~ 2N so
    # na·r2 sums toward N² (int64 exit near N≈2e9), and a single value
    # with ≳2.1M occurrences overflows n³ outright (zero-inflated
    # revenue — the headline use case). decimal factors widen the
    # products to decimal(38,0); totals go to double once below.
    nad = F.col("na").cast("decimal(19,0)")
    nd = F.col("n").cast("decimal(19,0)")
    agg = ranked.agg(
        F.sum("na").alias("n_a"),
        F.sum(F.col("n") - F.col("na")).alias("n_b"),
        F.sum(nad * F.col("r2").cast("decimal(19,0)")).alias("_s2a"),
        F.sum(nd * nd * nd - nd).alias("_ties"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    nn = d("n_a") + d("n_b")
    sumrank_a = d("_s2a") / F.lit(2.0)
    u_a = sumrank_a - d("n_a") * (d("n_a") + F.lit(1.0)) / F.lit(2.0)
    u_b = d("n_a") * d("n_b") - u_a
    mu = d("n_a") * d("n_b") / F.lit(2.0)
    sigma2 = (
        d("n_a") * d("n_b") / F.lit(12.0)
    ) * ((nn + F.lit(1.0)) - d("_ties") / (nn * (nn - F.lit(1.0))))
    z = (u_a - mu) / F.sqrt(sigma2)
    return agg.select(
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        u_b.alias("u_b"),
        F.round(z, 6).alias("z"),
    )


# Poisson(1) inverse-CDF thresholds scaled to the 52-bit hash domain,
# computed ONCE in exact-enough Python floats and embedded as INTEGER
# constants: both engines compare the bigint hash directly against
# these, so replicate weights carry zero float-comparison hazard.
def _poisson1_thresholds():
    import math

    cdf, term = 0.0, math.exp(-1.0)
    out = []
    for k in range(9):  # P(X > 8) < 1e-6: cap the ladder at 8
        cdf += term
        out.append(min(int(cdf * (1 << 52)), (1 << 52) - 1))
        term /= k + 1
    return out


_POISSON1_T = _poisson1_thresholds()


def poisson_bootstrap(
    df: DataFrame,
    id_col: str,
    value_col: str,
    replicates: int = 64,
    seed: str = "boot0",
) -> DataFrame:
    """Distributed bootstrap WITHOUT resampling — the Poisson bootstrap
    (the classic large-scale trick: at n rows, multinomial(n) resample
    weights converge to independent Poisson(1), so each replicate is a
    per-row WEIGHT, not a shuffle of the data). The weight for (row,
    replicate b) is the Poisson(1) inverse CDF evaluated on
    hash52(seed:id:b) — md5 as the RNG (the random-walks discipline:
    replayable, oracle-checkable, partition-invariant), compared
    against precomputed INTEGER thresholds so no float ever decides a
    weight.

    Scale shape: explode(sequence(0..B-1)) fans each row to B
    (replicate, weight) pairs, but partial aggregation collapses them
    to B partial sums per partition BEFORE the exchange — the shuffle
    carries B rows per partition regardless of data size, which is
    the whole reason this estimator exists at 100 TB. Money in exact
    cents; the per-replicate mean is the one float, rounded 6dp.

    Output: one row per replicate (b, n_eff, sum_cents, mean_cents) —
    the caller derives CIs by exact order statistics over these B
    rows (pinned in tests).
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    b = F.explode(
        F.sequence(F.lit(0), F.lit(int(replicates) - 1))
    ).alias("b")
    rows = df.select(
        F.col(id_col).cast("string").alias("_id"), cents.alias("_c")
    ).select("_id", "_c", b)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("_id"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    w = F.lit(9)
    for k in range(8, -1, -1):
        w = F.when(h <= F.lit(_POISSON1_T[k]), F.lit(k)).otherwise(w)
    weighted = rows.select("b", w.alias("_w"), "_c")
    agg = weighted.groupBy("b").agg(
        F.sum("_w").alias("n_eff"),
        F.sum(F.col("_w") * F.col("_c")).alias("sum_cents"),
    )
    return agg.select(
        "b",
        "n_eff",
        "sum_cents",
        F.round(
            F.col("sum_cents").cast("double")
            / F.col("n_eff").cast("double"),
            6,
        ).alias("mean_cents"),
    )


def ols_multi(
    df: DataFrame,
    y_col: Column,
    x1_col: Column,
    x2_col: Column,
) -> DataFrame:
    """Two-feature OLS by CLOSED-FORM normal equations — in-engine
    multiple regression with no iteration and no ML library: one
    two-phase aggregate collects the nine moment sums (n, Σx1, Σx2,
    Σx1², Σx2², Σx1x2, Σy, Σx1y, Σx2y) plus Σy², and Cramer's rule
    over the 3x3 system yields (b0, b1, b2); R² follows from the
    moment identity SSE = Σy² − b0Σy − b1Σx1y − b2Σx2y.

    Exactness: callers pass INTEGER-valued expressions (cents, hours,
    weekday codes); the moments accumulate in decimal(38,0) (the cuped
    discipline — x²y-scale products leave int64 far below 100 TB row
    counts), and the determinant arithmetic is one pinned double
    expression tree per engine. Singular systems (collinear features)
    emit NULL coefficients rather than garbage (det guarded at 0).

    Output: 1 row (n, b0, b1, b2, r2), 6dp.
    """
    d19 = "decimal(19,0)"
    x1 = x1_col.cast(d19)
    x2 = x2_col.cast(d19)
    y = y_col.cast(d19)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(x1 * x1).alias("sx11"),
        F.sum(x2 * x2).alias("sx22"),
        F.sum(x1 * x2).alias("sx12"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
        F.sum(y * y).alias("syy"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    a, b, c = d("n"), d("sx1"), d("sx2")
    dd, e, f = d("sx1"), d("sx11"), d("sx12")
    g, h, i = d("sx2"), d("sx12"), d("sx22")
    r1, r2_, r3 = d("sy"), d("sx1y"), d("sx2y")

    def det3(m11, m12, m13, m21, m22, m23, m31, m32, m33):
        return (
            m11 * (m22 * m33 - m23 * m32)
            - m12 * (m21 * m33 - m23 * m31)
            + m13 * (m21 * m32 - m22 * m31)
        )

    det = det3(a, b, c, dd, e, f, g, h, i)
    # Cramer: det_k replaces column k of M with the RHS (Sy, Sx1y, Sx2y)
    det0 = det3(r1, b, c, r2_, e, f, r3, h, i)
    det1 = det3(a, r1, c, dd, r2_, f, g, r3, i)
    det2 = det3(a, b, r1, dd, e, r2_, g, h, r3)
    b0 = det0 / det
    b1 = det1 / det
    b2 = det2 / det
    sse = d("syy") - b0 * d("sy") - b1 * d("sx1y") - b2 * d("sx2y")
    sst = d("syy") - d("sy") * d("sy") / d("n")
    ok = det != F.lit(0.0)
    return agg.select(
        "n",
        F.when(ok, F.round(b0, 6)).alias("b0"),
        F.when(ok, F.round(b1, 6)).alias("b1"),
        F.when(ok, F.round(b2, 6)).alias("b2"),
        F.when(
            ok & (sst != F.lit(0.0)),
            F.round(F.lit(1.0) - sse / sst, 6),
        ).alias("r2"),
    )


def markov_removal_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    conv_type: str,
    iters: int = 40,
) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al.) — the
    principled multi-touch model: journeys become a first-order chain
    start → touches → conv/null; a channel's credit is how much the
    start→conv absorption probability DROPS when every transition into
    that channel is redirected to null (the standard removal — no
    renormalization: removed visits are lost journeys).

    Journey semantics: per user, events strictly BEFORE the first
    ``conv_type`` event are touches; users with a conversion absorb at
    conv from their last touch (start→conv when no touches), others at
    null. One window pass builds transitions; counts aggregate to at
    most (channels+2)² rows.

    Determinism across engines is the design center: absorption
    probabilities come from ``iters`` rounds of the fixed-point
    v ← (Σ_t n_st·v(t)) DIV total_s in INTEGER NANO-UNITS (v(conv) =
    1e9) — integer sums are order-independent where a float iteration
    would drift with aggregation order, and the per-round DIV
    quantization (≤ states·iters·1e-9) sits far below the 6dp output
    rounding. The matrix solve runs on BOUNDED driver state (the
    k-means/BPE discipline: ≤ (channels+2)² counts collected, never
    data); the oracle replays the identical integer iteration as
    unrolled SQL. Shares likewise derive from integer removal effects
    so no float sum order exists anywhere.

    Output per channel: (channel, p_base, p_removed, removal_effect,
    attribution_share), 6dp.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_t"),
    ).withColumn("_rn", F.row_number().over(w))
    conv_rn = ev.filter(F.col("_t") == conv_type).groupBy("_u").agg(
        F.min("_rn").alias("_crn")
    )
    j = ev.join(conv_rn, "_u", "left")
    touches = j.filter(
        (F.col("_t") != conv_type)
        & (F.col("_crn").isNull() | (F.col("_rn") < F.col("_crn")))
    )
    wt = Window.partitionBy("_u").orderBy("_rn")
    steps = touches.select(
        "_u",
        F.coalesce(F.lag("_t").over(wt), F.lit("_start")).alias("src"),
        F.col("_t").alias("dst"),
    )
    last = touches.groupBy("_u").agg(
        F.max_by("_t", "_rn").alias("_last")
    )
    users = j.groupBy("_u").agg(
        F.max(F.col("_crn").isNotNull()).alias("_conv")
    )
    terminal = users.join(last, "_u", "left").select(
        "_u",
        F.coalesce("_last", F.lit("_start")).alias("src"),
        F.when(F.col("_conv"), F.lit("_conv"))
        .otherwise(F.lit("_null"))
        .alias("dst"),
    )
    counts = (
        steps.select("src", "dst")
        .unionByName(terminal.select("src", "dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # BOUNDED driver state: at most (channels + 2)^2 transition rows
    cnt = {(r["src"], r["dst"]): r["n"] for r in counts.collect()}
    channels = sorted(
        {s for s, _ in cnt if s != "_start"}
        | {d for _, d in cnt if d not in ("_conv", "_null")}
    )

    NANO = 10**9

    def absorb(removed):
        trans: dict = {}
        for (s, d), n in cnt.items():
            if removed is not None and s == removed:
                continue
            if removed is not None and d == removed:
                d = "_null"
            trans.setdefault(s, []).append((d, n))
        totals = {s: sum(n for _, n in lst) for s, lst in trans.items()}
        v = {s: 0 for s in trans}
        for _ in range(iters):
            v = {
                s: sum(
                    n * (NANO if d == "_conv" else v.get(d, 0))
                    for d, n in lst
                    if d != "_null"
                )
                // totals[s]
                for s, lst in trans.items()
            }
        return v.get("_start", 0)

    p_base = absorb(None)
    rows = []
    effects = {}
    for c in channels:
        p_c = absorb(c)
        # clamp at 0: integer-DIV quantization can put an irrelevant
        # channel's p_c a nano above p_base
        effects[c] = (
            max(0, (NANO * (p_base - p_c)) // p_base)
            if p_base > 0
            else 0
        )
        rows.append((c, p_c))
    total_eff = sum(effects.values())
    spark = df.sparkSession
    # raw doubles from SINGLE divisions of exact integers — bit-identical
    # in any engine (the EWMA raw-doubles discipline); no rounding, so no
    # half-way convention can diverge
    out = [
        (
            c,
            p_base / NANO,
            p_c / NANO,
            effects[c] / NANO if p_base > 0 else None,
            effects[c] / total_eff if total_eff > 0 else None,
        )
        for c, p_c in rows
    ]
    return spark.createDataFrame(
        out,
        "channel string, p_base double, p_removed double, "
        "removal_effect double, attribution_share double",
    )


def position_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    conv_type: str,
) -> DataFrame:
    """Heuristic position-based attribution — the rule family every
    marketing stack runs beside the Markov model
    (:func:`markov_removal_attribution`): each CONVERTING journey
    distributes exactly one unit of credit over its touches by
    position. Four standard rules side by side per channel, because
    the disagreement BETWEEN rules is the actual readout (a channel
    that wins under last-touch and loses under linear is a closer,
    not a prospector):

    - linear: 1/k to each of k touches
    - u-shaped (position-based 40/20/40): 40% first, 40% last,
      20% split over the middle; k=1 takes 100%, k=2 splits 50/50
    - first_touch / last_touch: winner-take-all at either end

    Journey semantics identical to the Markov operator: touches are
    events strictly before the first ``conv_type`` event; users who
    never convert assign no credit (their journeys are the null-path
    evidence the heuristics ignore — exactly why Markov exists).

    Exact-arithmetic: credits are INTEGER NANO-units via integer
    division (1/k → NANO // k), summed as BIGINTs — no float sum
    order anywhere; each journey leaks < k nano to quantization
    (documented, far under the 6dp output). One user-partitioned
    window pass positions the touches; one groupBy(channel) sums
    credits — ids and small ints are all that shuffle.

    Output per channel: (channel, n_touch_conv, linear, u_shape,
    first_touch, last_touch), credits as raw doubles from single
    divisions of the exact integer sums.
    """
    from pyspark.sql.window import Window

    NANO = 1_000_000_000
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_t"),
    ).withColumn("_rn", F.row_number().over(w))
    conv_rn = ev.filter(F.col("_t") == conv_type).groupBy("_u").agg(
        F.min("_rn").alias("_crn")
    )
    # converting users only: inner join, touches strictly before
    touches = ev.join(conv_rn, "_u").filter(
        (F.col("_t") != conv_type) & (F.col("_rn") < F.col("_crn"))
    )
    wj = Window.partitionBy("_u").orderBy("_rn")
    pos = touches.select(
        "_u",
        "_t",
        F.row_number().over(wj).alias("_p"),
        F.count(F.lit(1)).over(
            Window.partitionBy("_u")
        ).alias("_k"),
    )
    k, p = F.col("_k"), F.col("_p")
    first, last = p == 1, p == k
    # true integer DIV (not floor-of-double-division): bit-for-bit
    # the oracle's // by construction, no float in the credit path
    lin = F.expr(f"{NANO} DIV _k").cast("bigint")
    u_credit = (
        F.when(k == 1, F.lit(NANO))
        .when(k == 2, F.lit(NANO // 2))
        .when(first | last, F.lit(4 * NANO // 10))
        .otherwise(F.expr(f"{2 * NANO // 10} DIV (_k - 2)"))
        .cast("bigint")
    )
    ft = F.when(first, F.lit(NANO)).otherwise(F.lit(0)).cast("bigint")
    lt = F.when(last, F.lit(NANO)).otherwise(F.lit(0)).cast("bigint")
    agg = pos.groupBy(F.col("_t").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touch_conv"),
        F.sum(lin).alias("_lin"),
        F.sum(u_credit).alias("_u"),
        F.sum(ft).alias("_ft"),
        F.sum(lt).alias("_lt"),
    )
    def dn(c: str) -> Column:
        return F.col(c).cast("double") / F.lit(float(NANO))

    return agg.select(
        "channel",
        "n_touch_conv",
        dn("_lin").alias("linear"),
        dn("_u").alias("u_shape"),
        dn("_ft").alias("first_touch"),
        dn("_lt").alias("last_touch"),
    )


def did_estimator(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Two-group × two-period difference-in-differences — the
    quasi-experimental workhorse for launches WITHOUT randomization
    (feature rolled out to one segment; did the metric move beyond
    the trend the control segment shows?):
    DiD = (m̄_T,post − m̄_T,pre) − (m̄_C,post − m̄_C,pre), with the
    large-sample SE from the four cell variances
    SE = sqrt(Σ_cells v_ij/n_ij) and z/p against the normal.

    Exactness discipline (welch_z_tests): ONE two-phase aggregate
    builds all twelve cell moments (count, Σv, Σv² per cell) in
    decimal(38,0); estimate/SE/z/p are one identical float tree per
    engine over the exact moments, p via the shared A&S erfc
    polynomial (mlmetrics.erfc_as). ``value_col`` must be
    integer-valued (cents); NULL value/treat/post rows are dropped.
    An empty cell → NULL did (the contrast is undefined); any cell
    with < 2 values → NULL se/z/p.

    Output: 1 row — (n_t_pre, n_t_post, n_c_pre, n_c_post, m_t_pre,
    m_t_post, m_c_pre, m_c_post, did, se, z, p_value), 6dp floats.
    """
    from etl_capnz_spark.operators.mlmetrics import two_sided_p

    dec = "decimal(38,0)"
    src = df.select(
        F.col(treat_col).cast("int").alias("_t"),
        F.col(post_col).cast("int").alias("_p"),
        F.col(value_col).cast("bigint").alias("_v"),
    ).filter(
        F.col("_v").isNotNull()
        & F.col("_t").isNotNull()
        & F.col("_p").isNotNull()
    )
    vd = F.col("_v").cast(dec)
    cells = {
        "t_pre": (F.col("_t") == 1) & (F.col("_p") == 0),
        "t_post": (F.col("_t") == 1) & (F.col("_p") == 1),
        "c_pre": (F.col("_t") == 0) & (F.col("_p") == 0),
        "c_post": (F.col("_t") == 0) & (F.col("_p") == 1),
    }
    aggs = []
    for k, cond in cells.items():
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{k}")
        )
        aggs.append(
            F.sum(F.when(cond, vd).otherwise(F.lit(0).cast(dec))).alias(
                f"_s_{k}"
            )
        )
        aggs.append(
            F.sum(
                F.when(cond, vd * vd).otherwise(F.lit(0).cast(dec))
            ).alias(f"_ss_{k}")
        )
    agg = src.agg(*aggs)

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    def mean(k: str) -> Column:
        return d(f"_s_{k}") / d(f"n_{k}")

    def var(k: str) -> Column:
        return (
            d(f"_ss_{k}")
            - d(f"_s_{k}") * d(f"_s_{k}") / d(f"n_{k}")
        ) / (d(f"n_{k}") - 1)

    nonempty = None
    enough = None
    for k in cells:
        ne = F.col(f"n_{k}") > 0
        en = F.col(f"n_{k}") >= 2
        nonempty = ne if nonempty is None else (nonempty & ne)
        enough = en if enough is None else (enough & en)
    did = F.when(
        nonempty,
        (mean("t_post") - mean("t_pre"))
        - (mean("c_post") - mean("c_pre")),
    )
    se2 = (
        var("t_post") / d("n_t_post")
        + var("t_pre") / d("n_t_pre")
        + var("c_post") / d("n_c_post")
        + var("c_pre") / d("n_c_pre")
    )
    se = F.when(enough & (se2 > 0), F.sqrt(se2))
    z = did / se
    cols = [F.col(f"n_{k}") for k in cells]
    cols += [
        F.when(F.col(f"n_{k}") > 0, F.round(mean(k), 6)).alias(f"m_{k}")
        for k in cells
    ]
    cols += [
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p(z), 6).alias("p_value"),
    ]
    return agg.select(*cols)


def srm_check(
    df: DataFrame,
    arm_col: str,
    expected_share: float = 0.5,
) -> DataFrame:
    """Sample-ratio mismatch — the sanity gate EVERY experiment must
    pass before anyone reads its metrics: if the realized assignment
    split differs from the design share beyond chance, the
    randomization (or logging) is broken and all downstream results
    are untrustworthy. Binomial normal approximation:
    z = (n_a − n·s) / sqrt(n·s·(1−s)), two-sided p via the shared
    A&S erfc polynomial; the conventional alarm fires at p < 0.001
    (SRM is a data-quality defect, not a hypothesis — the threshold
    is deliberately conservative).

    Exactness: counts are the only aggregate (one two-phase count —
    nothing else shuffles); z and p are one identical float tree per
    engine. ``arm_col`` is boolean-ish (1/true = arm A); NULL arm
    rows are dropped into ``n_dropped``. Empty input → NULL z/p, no
    alarm on nothing.

    Output: 1 row — (n_a, n_b, n_dropped, share_observed, z,
    p_value, srm), with ``srm`` computed on the UNROUNDED p.
    """
    from etl_capnz_spark.operators.mlmetrics import two_sided_p

    src = df.select(F.col(arm_col).cast("int").alias("_ia"))
    agg = src.agg(
        F.sum(F.when(F.col("_ia") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(
            F.when(F.col("_ia").isNotNull() & (F.col("_ia") != 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("_ia").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    n = d("n_a") + d("n_b")
    s = F.lit(float(expected_share))
    z = F.when(
        n > 0,
        (d("n_a") - n * s) / F.sqrt(n * s * (F.lit(1.0) - s)),
    )
    p = two_sided_p(z)
    return agg.select(
        "n_a",
        "n_b",
        "n_dropped",
        F.when(n > 0, F.round(d("n_a") / n, 6)).alias("share_observed"),
        F.round(z, 6).alias("z"),
        F.round(p, 6).alias("p_value"),
        F.when(n > 0, p < F.lit(0.001)).alias("srm"),
    )


def power_analysis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    mde_share: float = 0.05,
    z_alpha: float = 1.959964,
    z_beta: float = 0.841621,
) -> DataFrame:
    """Experiment DESIGN, not analysis: per group (metric family),
    the required per-arm sample size to detect a ``mde_share``
    relative lift at two-sided α=5% / power 80% — the number a team
    needs BEFORE launching, derived from the metric's MEASURED
    variance instead of a guess:
    n = ⌈2·(z_{α/2} + z_β)²·σ² / δ²⌉ with δ = mde_share·mean.

    The z constants are compile-time literals (1.959964 / 0.841621 —
    inverse-normal has no elementary closed form, so the conventional
    table values are pinned rather than approximated); σ² and the
    mean come from ONE two-phase aggregate over decimal(38,0)
    moments (the welch_z_tests discipline), and n_required is one
    identical float tree per engine, ceil'd. Groups with < 2 values
    or a zero mean emit NULL — a power calc against no signal is
    undefined, not zero.

    ``value_col`` must be integer-valued (cents). Output: one row per
    group — (group_col, n, mean, variance, n_required_per_arm).
    """
    dec = "decimal(38,0)"
    src = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("bigint").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    vd = F.col("_v").cast(dec)
    agg = src.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vd).alias("_s"),
        F.sum(vd * vd).alias("_ss"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    mean = d("_s") / d("n")
    var = (d("_ss") - d("_s") * d("_s") / d("n")) / (d("n") - 1)
    delta = F.lit(float(mde_share)) * mean
    zsum = F.lit(float(z_alpha)) + F.lit(float(z_beta))
    n_req = F.ceil(
        F.lit(2.0) * zsum * zsum * var / (delta * delta)
    ).cast("bigint")
    ok = (F.col("n") >= 2) & (mean != 0)
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(mean, 6).alias("mean"),
        F.when(F.col("n") >= 2, F.round(var, 6)).alias("variance"),
        F.when(ok, n_req).alias("n_required_per_arm"),
    )
