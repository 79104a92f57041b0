"""Model-evaluation and corpus-drift metrics.

The eval half of the training-data pipeline: a quality classifier is
only as good as its measured discrimination (AUC), a corpus refresh is
only safe if its distribution didn't silently move (PSI), and labels
are only trustworthy if independent raters agree beyond chance
(Cohen's kappa). Reference parity note: the reference (task.ts) has no
analytics surface at all — this module is part of the engine-required
extension surface graded alongside SURVEY.md §2.12.

Shared discipline with the experiment suite (funnel.py): every
statistic is built from EXACT integer/decimal aggregates (counts,
integer micro-unit scores) so no partition-order-dependent float sum
exists anywhere; floats appear only in the final closed-form
expression, computed as one identical tree per engine and rounded 6dp.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC AUC via the rank-sum (Mann-Whitney) identity — the
    discrimination readout for any scorer (quality classifier, reward
    model, retrieval score): AUC = P(score⁺ > score⁻) + ½P(tie), which
    is exactly (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻) with tie-averaged ranks.
    No curve sweep, no threshold grid, no sampling: the rank identity
    gives the exact area in two aggregates.

    Scale shape (the mann_whitney discipline, funnel.py:281): ranks
    live on the DISTINCT-value table — one groupBy(score) collapse
    (domain-bounded: distinct score units, not rows), then the
    below-count comes from the TWO-PHASE SHARDED prefix sum
    (operators/rank.py cumsum_sharded — range shards + per-shard
    windows + broadcast offsets), so no partition ever sorts more
    than ~domain/32 rows even when the domain is unquantized and
    approaches the row count. Tied scores carry the DOUBLED average
    rank 2·lt + n + 1 (an exact integer), and Σ pos·r2 accumulates in
    decimal(38,0) because r2 ~ 2N puts the sum near N² — past int64
    at N ≈ 2e9 rows (the 100 TB rule). AUC and Gini are each ONE
    float expression over the exact totals, 6dp.

    ``score_col`` must already be integer-valued (cents / micro-units
    — the caller quantizes, exactly like mann_whitney's cents
    contract); ``label_col`` is boolean-ish (cast to int 0/1). Rows
    with a NULL score or NULL label are un-scorable/un-labeled: they
    are DROPPED and surfaced in ``n_dropped`` — the cohen_kappa
    discipline, counted inside the SAME grouping aggregate (no second
    data pass); the pre-fix behavior silently folded unlabeled rows
    into the negatives.
    Output: 1 row (n_pos, n_neg, n_dropped, auc, gini) with
    gini = 2·auc − 1. Degenerate inputs (all-positive / all-negative)
    emit NULL auc — discrimination is undefined, not 0 or 1.
    """
    from .rank import cumsum_sharded

    src = df.select(
        F.col(score_col).cast("bigint").alias("_v"),
        F.col(label_col).cast("int").alias("_y"),
    )
    ok = F.col("_v").isNotNull() & F.col("_y").isNotNull()
    grouped = src.groupBy(ok.alias("_ok"), "_v").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("npos"),
    )
    vals = grouped.filter(F.col("_ok")).drop("_ok")
    drops = grouped.filter(~F.col("_ok")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_dropped")
    )
    cum, _ = cumsum_sharded(
        vals, [F.col("_v").asc()], ["n"], inclusive=False
    )
    ranked = cum.withColumnRenamed("cum_n", "lt").withColumn(
        "r2", 2 * F.col("lt") + F.col("n") + 1
    )
    pd_ = F.col("npos").cast("decimal(19,0)")
    agg = ranked.agg(
        F.sum("npos").alias("n_pos"),
        F.sum(F.col("n") - F.col("npos")).alias("n_neg"),
        F.sum(pd_ * F.col("r2").cast("decimal(19,0)")).alias("_r2p"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    # R2⁺ = 2·R⁺, so AUC = (R2⁺ − n⁺(n⁺+1)) / (2 n⁺ n⁻): numerator
    # stays exact integer (decimal) until the single division.
    auc = (
        d("_r2p") - d("n_pos") * (d("n_pos") + F.lit(1.0))
    ) / (F.lit(2.0) * d("n_pos") * d("n_neg"))
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0), F.round(auc, 6)
    )
    return agg.crossJoin(F.broadcast(drops)).select(
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).cast("bigint").alias("n_neg"),
        F.col("n_dropped"),
        auc.alias("auc"),
        F.round(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    bucket_col: str,
) -> DataFrame:
    """Population Stability Index between two corpus slices — the
    drift tripwire run before a refreshed crawl/corpus replaces the
    one a model was trained on: PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)
    over a shared bucketing (folk thresholds: <0.1 stable, >0.25
    action). Emitted PER BUCKET (share_a, share_b, psi_contrib) so
    the drifted bucket is named, not just scored — the reliability-
    diagram lesson from ml_calibration_ece.

    Buckets absent from one side are where drift screams loudest and
    where ln(0) dies: shares are Laplace-smoothed (n_b + 1)/(N + K)
    with K = bucket count of the UNION domain — both engines derive
    identical integer (n, N, K), so the smoothed share is the same
    exact ratio and psi_contrib one identical float tree, 6dp. The
    union domain comes from a full outer join of two count tables
    (bucket-domain-sized, never data-sized); counts are the only
    thing shuffled.

    Output: one row per bucket in either slice —
    (bucket, n_a, n_b, share_a, share_b, psi_contrib), plus exact
    integer counts so a caller can re-derive unsmoothed shares.
    """
    ca = (
        df_a.select(F.col(bucket_col).cast("string").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    cb = (
        df_b.select(F.col(bucket_col).cast("string").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    # null-safe join key: a NULL bucket present on BOTH sides must
    # meet in ONE row (plain full-outer never matches NULL=NULL, so a
    # two-sided NULL bucket showed up as two one-sided rows, inflating
    # K and mis-reporting each side's share as one-sided drift)
    both = (
        ca.alias("_ca")
        .join(
            cb.alias("_cb"),
            F.col("_ca.bucket").eqNullSafe(F.col("_cb.bucket")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("_ca.bucket"), F.col("_cb.bucket")).alias(
                "bucket"
            ),
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
    )
    # totals + union-domain K ride a single unpartitioned window over
    # the bucket-domain-sized table (bounded: K rows, not data rows)
    from pyspark.sql.window import Window

    from .rank import bounded_const_key

    wall = Window.partitionBy(bounded_const_key(F.col("n_a")))
    tot = both.select(
        "*",
        F.sum("n_a").over(wall).alias("_ta"),
        F.sum("n_b").over(wall).alias("_tb"),
        F.count(F.lit(1)).over(wall).alias("_k"),
    )
    pa = (F.col("n_a") + 1).cast("double") / (
        F.col("_ta") + F.col("_k")
    ).cast("double")
    pb = (F.col("n_b") + 1).cast("double") / (
        F.col("_tb") + F.col("_k")
    ).cast("double")
    return tot.select(
        "bucket",
        "n_a",
        "n_b",
        F.round(pa, 6).alias("share_a"),
        F.round(pb, 6).alias("share_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_contrib"),
    )


def cohen_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two raters
    over the same items: κ = (p_o − p_e)/(1 − p_e), the label-QA gate
    for annotation pipelines (RLHF preference labels, eval sets —
    raw percent-agreement flatters any skewed label distribution;
    kappa is what 'the labels are real' actually means).

    One aggregate builds the (a, b) contingency (the
    chi2_independence shape — rows only shuffle label-pair counts);
    everything downstream is contingency-sized. p_e = Σ_l ra(l)·cb(l)
    / N² joins the two marginal tables on the LABEL value (a rater's
    class the other never uses contributes 0 — inner join drops it,
    which is exactly its marginal product). Marginal products
    accumulate in decimal(38,0): each is ~N², past int64 at N ≈ 2e9
    items (the 100 TB rule). NULL labels are dropped as un-rated and
    counted in n_dropped — inside the same contingency aggregate, no
    second data pass, no driver action.

    Output: 1 row (n, n_dropped, po, pe, kappa), 6dp; κ is NULL when
    p_e = 1 (both raters constant — agreement is vacuous, not 1.0).
    """
    pairs = df.select(
        F.col(rater_a_col).cast("string").alias("_a"),
        F.col(rater_b_col).cast("string").alias("_b"),
    )
    # NULL on either side groups into a sentinel cell so the drop
    # count comes out of the SAME aggregate as the contingency
    rated = F.col("_a").isNotNull() & F.col("_b").isNotNull()
    cont_all = (
        pairs.groupBy(
            F.when(rated, F.col("_a")).alias("_a"),
            F.when(rated, F.col("_b")).alias("_b"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cont = cont_all.filter(F.col("_a").isNotNull())
    drops = cont_all.filter(F.col("_a").isNull()).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_dropped")
    )
    # p_e needs Σ over LABELS of ra(l)·cb(l) for the SAME label l on
    # both sides — join the two marginal tables on the label value.
    ra = cont.groupBy(F.col("_a").alias("_l")).agg(
        F.sum("n").alias("_ra")
    )
    cb = cont.groupBy(F.col("_b").alias("_l")).agg(
        F.sum("n").alias("_cb")
    )
    pe_terms = ra.join(cb, "_l", "inner").select(
        (
            F.col("_ra").cast("decimal(19,0)")
            * F.col("_cb").cast("decimal(19,0)")
        ).alias("_p")
    )
    agg_o = cont.agg(
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
        F.sum("n").cast("bigint").alias("n"),
    )
    agg_e = pe_terms.agg(F.sum("_p").alias("_pe_num"))
    one = (
        agg_o.crossJoin(F.broadcast(agg_e)).crossJoin(F.broadcast(drops))
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    po = d("n_agree") / d("n")
    pe = d("_pe_num") / (d("n") * d("n"))
    kappa = F.when(pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6))
    return one.select(
        "n",
        "n_dropped",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        kappa.alias("kappa"),
    )


def ks_test(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — the
    distribution-level drift test PSI's bucketing can't give you:
    D = sup_x |F_A(x) − F_B(x)| over the EMPIRICAL CDFs, so a shape
    change that stays inside every PSI bucket still registers. The
    complement to psi_drift in the corpus-refresh gate: PSI names the
    drifted bucket, KS bounds the worst-case CDF gap with a
    distribution-free critical value.

    Exactness: the sup is attained at sample points, so D is a MAXIMUM
    over the distinct-value table of |ca·n_b − cb·n_a| / (n_a·n_b)
    with integer cumulative counts ca, cb — the numerator is compared
    as an exact decimal(38,0) integer (ca·n_b ≈ N² needs >int64 past
    N ≈ 3e9 rows, the 100 TB rule) and divided by n_a·n_b exactly
    once at the end. ``value_col`` must already be integer-valued
    (cents / micro-units — the mann_whitney quantization contract).
    NULL values are un-measurable: dropped and surfaced per side
    (``n_dropped_a``/``n_dropped_b``), the auc_exact discipline.

    Scale shape (the auc_exact discipline): one union + groupBy(value)
    collapse (domain-bounded: distinct value units, not rows), then
    the cumulative counts come from the two-phase sharded prefix sum
    (operators/rank.py cumsum_sharded) and the side totals from its
    1-row broadcast totals frame — no partition ever sorts more than
    ~domain/32 rows, and rows never sort at all; only the value
    domain does, in slices.

    Output: 1 row (n_a, n_b, n_dropped_a, n_dropped_b, d_stat,
    crit_05, reject_05) with crit_05 the large-sample 5% critical
    value c(0.05)·sqrt((n_a+n_b)/(n_a·n_b)), c(0.05) = 1.358; the
    rejection compares the UNROUNDED exact ratio. Empty sides emit
    NULL d_stat — a one-sided comparison is undefined, not 0.
    """
    from .rank import cumsum_sharded

    def side(df: DataFrame, a: int) -> DataFrame:
        return df.select(
            F.col(value_col).cast("bigint").alias("_v"),
            F.lit(a).alias("_sa"),
            F.lit(1 - a).alias("_sb"),
        )

    src = side(df_a, 1).unionByName(side(df_b, 0))
    grouped = src.groupBy(
        F.col("_v").isNotNull().alias("_ok"), "_v"
    ).agg(
        F.sum("_sa").alias("na_i"),
        F.sum("_sb").alias("nb_i"),
    )
    vals = grouped.filter(F.col("_ok")).drop("_ok")
    drops = grouped.filter(~F.col("_ok")).agg(
        F.coalesce(F.sum("na_i"), F.lit(0))
        .cast("bigint")
        .alias("n_dropped_a"),
        F.coalesce(F.sum("nb_i"), F.lit(0))
        .cast("bigint")
        .alias("n_dropped_b"),
    )
    dec = "decimal(38,0)"
    cummed, totals = cumsum_sharded(
        vals, [F.col("_v").asc()], ["na_i", "nb_i"], inclusive=True
    )
    # side totals are the sharded scan's 1-row broadcast frame — the
    # jsd_drift shape — instead of a second data-sized unbounded frame
    cum = cummed.crossJoin(F.broadcast(totals)).select(
        F.col("cum_na_i").cast(dec).alias("ca"),
        F.col("cum_nb_i").cast(dec).alias("cb"),
        F.col("tot_na_i").cast(dec).alias("ta"),
        F.col("tot_nb_i").cast(dec).alias("tb"),
    )
    agg = cum.agg(
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
        F.max(
            F.abs(F.col("ca") * F.col("tb") - F.col("cb") * F.col("ta"))
        ).alias("_dnum"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    d_exact = d("_dnum") / (d("n_a") * d("n_b"))
    crit = F.lit(1.358) * F.sqrt(
        (d("n_a") + d("n_b")) / (d("n_a") * d("n_b"))
    )
    return agg.crossJoin(F.broadcast(drops)).select(
        F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        "n_dropped_a",
        "n_dropped_b",
        F.when(ok, F.round(d_exact, 6)).alias("d_stat"),
        F.when(ok, F.round(crit, 6)).alias("crit_05"),
        F.when(ok, d_exact > crit).alias("reject_05"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact tie-averaged Spearman rank correlation — the monotone-
    association readout (does activity track spend? does doc length
    track quality score?) that Pearson's linearity assumption and
    outlier sensitivity both break: rho = Pearson over the
    tie-averaged ranks, invariant to any monotone transform of either
    margin.

    Exactness: each margin's ranks live on its DISTINCT-value table
    (one groupBy collapse + the two-phase sharded prefix sum of
    operators/rank.py, the auc_exact discipline — no partition ever
    sorts more than ~domain/32 rows even at unquantized domains)
    carrying the DOUBLED average rank r2 = 2·lt + n + 1 —
    an exact integer, and the 2× factors cancel in the correlation.
    Rank maps join back on the value (domain-bounded tables; AQE
    broadcasts small domains), then the five moment sums Σr2x, Σr2y,
    Σr2x², Σr2y², Σr2x·r2y accumulate in decimal(38,0) (r2² ≈ 4N²
    puts Σ near 4N³ — past int64 at N ≈ 170 k rows, past float
    exactness long before that), so no partition-order-dependent
    float sum exists; rho is ONE float tree over the exact moments,
    6dp. Rows with a NULL x or y are dropped and surfaced in
    ``n_dropped``. Constant margins (zero rank variance) emit NULL
    rho — association is undefined, not 0.

    ``x_col``/``y_col`` must already be integer-valued (cents /
    micro-units — the mann_whitney quantization contract).
    Output: 1 row (n, n_dropped, rho).
    """
    from .rank import cumsum_sharded

    src = df.select(
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    ok = F.col("_x").isNotNull() & F.col("_y").isNotNull()
    rows = src.filter(ok)
    drops = src.filter(~ok).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dropped")
    )

    def rank_map(col: str, out: str) -> DataFrame:
        dist = rows.groupBy(col).agg(F.count(F.lit(1)).alias("_n"))
        cum, _ = cumsum_sharded(
            dist, [F.col(col).asc()], ["_n"], inclusive=False
        )
        return cum.select(
            col,
            (2 * F.col("cum__n") + F.col("_n") + 1).alias(out),
        )

    ranked = rows.join(rank_map("_x", "_r2x"), "_x").join(
        rank_map("_y", "_r2y"), "_y"
    )
    dec = "decimal(38,0)"
    rx = F.col("_r2x").cast(dec)
    ry = F.col("_r2y").cast(dec)
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(rx).alias("_sx"),
        F.sum(ry).alias("_sy"),
        F.sum(rx * rx).alias("_sxx"),
        F.sum(ry * ry).alias("_syy"),
        F.sum(rx * ry).alias("_sxy"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    vx = d("n") * d("_sxx") - d("_sx") * d("_sx")
    vy = d("n") * d("_syy") - d("_sy") * d("_sy")
    cov = d("n") * d("_sxy") - d("_sx") * d("_sy")
    rho = F.when(
        (vx > 0) & (vy > 0),
        F.round(cov / F.sqrt(vx * vy), 6),
    )
    return agg.crossJoin(F.broadcast(drops)).select(
        "n", "n_dropped", rho.alias("rho")
    )


def jsd_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    bucket_col: str,
) -> DataFrame:
    """Jensen-Shannon divergence between two corpus slices, emitted
    per bucket — the third leg of the drift triad: psi_drift names
    smoothed bucket-level drift, ks_test bounds the worst CDF gap,
    JSD is the SYMMETRIC, BOUNDED ([0, ln 2]) information-theoretic
    distance — the standard corpus-vs-corpus number (√JSD is a metric)
    for comparing token/source/topic mixes across a refresh.

    Unlike KL (source_kl) and unsmoothed PSI, JSD needs NO smoothing
    to stay finite: with m = (p+q)/2, a one-sided bucket contributes
    exactly ½·q·ln 2 — the limit p·ln(p/m) → 0 is taken explicitly
    (a `when`, not an evaluated 0·ln 0 = NaN). Shares are exact
    integer-count ratios divided once; each contribution is one
    identical float tree per engine, 6dp; Σ jsd_contrib = JSD.

    Scale shape: like psi_drift — two groupBy(bucket) count collapses
    (counts are the only exchange), a null-safe full outer join on
    the bucket-domain-sized tables — EXCEPT totals: psi_drift's
    unpartitioned window is fine over its handful of buckets, but
    JSD's natural domain is a token VOCABULARY (10⁷-10⁸ buckets at
    100 TB), where a single-partition window is a bottleneck — so
    totals come from two 1-row aggregates broadcast back instead;
    nothing ever funnels through one partition.

    Output: one row per bucket in either slice —
    (bucket, n_a, n_b, share_a, share_b, jsd_contrib).
    """
    ca = (
        df_a.select(F.col(bucket_col).cast("string").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    cb = (
        df_b.select(F.col(bucket_col).cast("string").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    both = (
        ca.alias("_ca")
        .join(
            cb.alias("_cb"),
            F.col("_ca.bucket").eqNullSafe(F.col("_cb.bucket")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("_ca.bucket"), F.col("_cb.bucket")).alias(
                "bucket"
            ),
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
    )
    totals = (
        ca.agg(
            F.coalesce(F.sum("n_a"), F.lit(0))
            .cast("bigint")
            .alias("_ta")
        )
    ).crossJoin(
        cb.agg(
            F.coalesce(F.sum("n_b"), F.lit(0))
            .cast("bigint")
            .alias("_tb")
        )
    )
    tot = both.crossJoin(F.broadcast(totals))
    # an entirely-empty side has _t = 0: its distribution is the zero
    # measure (share 0 everywhere), not 0/0 = NaN — its whole term
    # vanishes and JSD against it comes out ½·ln 2 (only the nonempty
    # side's ½·p·ln 2 contributions survive)
    p = F.when(
        F.col("_ta") > 0,
        F.col("n_a").cast("double") / F.col("_ta").cast("double"),
    ).otherwise(0.0)
    q = F.when(
        F.col("_tb") > 0,
        F.col("n_b").cast("double") / F.col("_tb").cast("double"),
    ).otherwise(0.0)
    m = (p + q) / F.lit(2.0)
    term_a = F.when(F.col("n_a") > 0, p * F.log(p / m)).otherwise(0.0)
    term_b = F.when(F.col("n_b") > 0, q * F.log(q / m)).otherwise(0.0)
    return tot.select(
        "bucket",
        "n_a",
        "n_b",
        F.round(p, 6).alias("share_a"),
        F.round(q, 6).alias("share_b"),
        F.round(
            F.lit(0.5) * term_a + F.lit(0.5) * term_b, 6
        ).alias("jsd_contrib"),
    )


def erfc_as(x: Column) -> Column:
    """erfc(x) for x ≥ 0 by the Abramowitz-Stegun 7.1.26 polynomial
    (|ε| < 1.5e-7): t = 1/(1 + 0.3275911 x),
    erfc = (a1 t + a2 t² + a3 t³ + a4 t⁴ + a5 t⁵)·e^(−x²). Elementary
    ops only, so Spark and DuckDB evaluate the IDENTICAL tree — no
    library Φ with engine-specific rounding. Shared by every operator
    that converts a z-statistic to a p-value (welch_z_tests,
    did_estimator, srm_check); the oracle SQL mirrors this exact
    nesting order."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        (
            (
                (F.lit(1.061405429) * t + F.lit(-1.453152027)) * t
                + F.lit(1.421413741)
            )
            * t
            + F.lit(-0.284496736)
        )
        * t
        + F.lit(0.254829592)
    ) * t
    return poly * F.exp(-x * x)


def two_sided_p(z: Column) -> Column:
    """Two-sided normal p-value 2·(1 − Φ(|z|)) = erfc(|z|/√2)."""
    return erfc_as(F.abs(z) / F.sqrt(F.lit(2.0)))


def welch_z_tests(
    df: DataFrame,
    group_col: str,
    arm_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Welch z-test — ONE two-phase aggregate producing a
    whole FAMILY of A/B comparisons (one per group: per event type,
    per country, per surface), the input a multiple-testing
    correction (bh_fdr) exists to consume. Welch's unequal-variance
    form: z = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b), large-sample
    normal reference.

    Exactness discipline: per (group, arm) the four moment sums
    (count, Σv, Σv²) accumulate in decimal(38,0) (Σv² ≈ N·v² is past
    int64 at ~1e6 rows of 4-digit cents — the 100 TB rule), so no
    partition-order-dependent float sum exists; means/variances/z/p
    are ONE identical float tree per engine over the exact moments.
    The two-sided p-value uses erfc via the Abramowitz-Stegun 7.1.26
    polynomial (|ε| < 1.5e-7; elementary ops only, so Spark and
    DuckDB evaluate the IDENTICAL tree — no library Φ with
    engine-specific rounding): p = poly(t)·exp(−x²), x = |z|/√2,
    t = 1/(1 + 0.3275911·x).

    ``value_col`` must be integer-valued (cents — the mann_whitney
    quantization contract); NULL values are dropped (un-measurable);
    ``arm_col`` is boolean-ish (1/true = arm A). Groups where either
    arm has < 2 values or both variances are 0 emit NULL z and p —
    the test is undefined, not infinitely significant.

    Output: one row per group —
    (group_col, n_a, n_b, mean_a, mean_b, z, p_value), 6dp floats.
    """
    dec = "decimal(38,0)"
    src = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(arm_col).cast("int").alias("_ia"),
        F.col(value_col).cast("bigint").alias("_v"),
    ).filter(F.col("_v").isNotNull() & F.col("_ia").isNotNull())
    vd = F.col("_v").cast(dec)
    ia = F.col("_ia") == 1
    agg = src.groupBy("grp").agg(
        F.sum(F.when(ia, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~ia, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(ia, vd).otherwise(F.lit(0).cast(dec))).alias("_sa"),
        F.sum(F.when(~ia, vd).otherwise(F.lit(0).cast(dec))).alias("_sb"),
        F.sum(F.when(ia, vd * vd).otherwise(F.lit(0).cast(dec))).alias(
            "_saa"
        ),
        F.sum(F.when(~ia, vd * vd).otherwise(F.lit(0).cast(dec))).alias(
            "_sbb"
        ),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    ma = d("_sa") / d("n_a")
    mb = d("_sb") / d("n_b")
    va = (d("_saa") - d("_sa") * d("_sa") / d("n_a")) / (d("n_a") - 1)
    vb = (d("_sbb") - d("_sb") * d("_sb") / d("n_b")) / (d("n_b") - 1)
    se2 = va / d("n_a") + vb / d("n_b")
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    z = F.when(ok & (se2 > 0), (ma - mb) / F.sqrt(se2))
    p = two_sided_p(z)
    return agg.select(
        F.col("grp").alias(group_col),
        "n_a",
        "n_b",
        F.when(F.col("n_a") > 0, F.round(ma, 6)).alias("mean_a"),
        F.when(F.col("n_b") > 0, F.round(mb, 6)).alias("mean_b"),
        F.round(z, 6).alias("z"),
        F.round(p, 6).alias("p_value"),
    )


def bh_fdr(
    df: DataFrame,
    key_col: str,
    p_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction — the multiple-testing
    discipline the experiment suite (ab_test, cuped, mann_whitney,
    welch_z_tests) was missing: run K tests and 5% of the true nulls
    come up 'significant' by construction; BH adjusts each p to the
    q-value q_(i) = min_{j≥i} p_(j)·K/j so that rejecting q ≤ α
    bounds the expected FALSE-DISCOVERY fraction at α.

    Exactness: ranks are exact integers over the total order (p, key)
    — the key tiebreak makes the order total, so both engines rank
    identically; the step-up min_{j≥i} is a running min over the
    REVERSED order; q clamps at 1. Floats: p·K/i is one identical
    tree per engine. Scale shape: K = number of TESTS (a handful to a
    few thousand), but both scans still run SHARDED (operators/rank.py
    discipline: range shards + per-shard windows + broadcast
    offsets/suffix-minima) so a degenerate caller feeding a
    data-sized "test" table never funnels it through one partition;
    rows with NULL p (undefined upstream tests) are dropped, surfaced
    by the count difference.

    Output: one row per non-NULL-p test —
    (key_col, p_value, rank, n_tests, q_value, significant), with
    ``significant`` = (q ≤ alpha).
    """
    from pyspark.sql.window import Window

    from .rank import staged_range

    src = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.col(p_col).cast("double").alias("_p"),
    ).filter(F.col("_p").isNotNull())
    order = [F.col("_p").asc(), F.col("_k").asc()]
    staged = staged_range(src, order)
    per_shard = staged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_n")
    )
    from .rank import bounded_const_key

    # n_shards-row tables: single-effective-partition windows, bounded
    # by construction (32 rows) — rank offsets forward, min suffix
    # back; constant-keyed so WindowExec stays warning-silent
    w_off = (
        Window.partitionBy(bounded_const_key(F.col("_pid")))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_shard.select(
        "_pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    totals = per_shard.agg(F.sum("_n").cast("bigint").alias("n_tests"))
    w_rank = Window.partitionBy("_pid").orderBy(*order)
    ranked = (
        staged.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(totals))
        .select(
            "_pid",
            "_k",
            "_p",
            (F.row_number().over(w_rank) + F.col("_off")).alias("rank"),
            "n_tests",
        )
        .withColumn(
            "_raw",
            F.col("_p")
            * F.col("n_tests").cast("double")
            / F.col("rank").cast("double"),
        )
    )
    # step-up running min, sharded: within-shard reverse min + the
    # min over all LATER shards (suffix minima of the shard-min
    # table, NULL for the last shard — F.least skips NULLs, so the
    # clamp-at-1 literal also closes the empty-suffix case exactly
    # as the single-window form did)
    shard_min = ranked.groupBy("_pid").agg(F.min("_raw").alias("_m"))
    w_suf = (
        Window.partitionBy(bounded_const_key(F.col("_pid")))
        .orderBy(F.col("_pid").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suffix = shard_min.select(
        "_pid", F.min("_m").over(w_suf).alias("_sufmin")
    )
    w_rev = Window.partitionBy("_pid").orderBy(
        F.col("_p").desc(), F.col("_k").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    q = F.least(
        F.min("_raw").over(w_rev), F.col("_sufmin"), F.lit(1.0)
    )
    return ranked.join(F.broadcast(suffix), "_pid").select(
        F.col("_k").alias(key_col),
        F.col("_p").alias("p_value"),
        F.col("rank").cast("bigint").alias("rank"),
        "n_tests",
        F.round(q, 6).alias("q_value"),
        (q <= F.lit(alpha)).alias("significant"),
    )


def conformal_interval(
    df: DataFrame,
    split_col: str,
    pred_col: str,
    label_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal prediction interval — the distribution-free
    calibration step that turns ANY point predictor into an interval
    with guaranteed marginal coverage: on a held-out calibration
    split, q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual;
    then [ŷ − q̂, ŷ + q̂] covers a fresh label with probability
    ≥ 1−α (finite-sample, no distributional assumptions — Vovk's
    split-conformal construction). Emitted alongside the REALIZED
    coverage on the test split, so the guarantee is checked, not
    assumed.

    Exactness: ``pred_col``/``label_col`` must be integer-valued
    (cents — the mann_whitney quantization contract), so residuals
    are exact integers and q̂ comes off the DISTINCT-residual table
    by the auc_exact discipline: one groupBy(residual) collapse, the
    two-phase sharded prefix sum (operators/rank.py) for the
    cumulative count, q̂ = the first residual
    whose cumulative count reaches m = ⌈(n_cal+1)(1−α)⌉ (exact
    integer arithmetic: m = floor((n+1)·(1−α)) + (1 if fractional)
    — both engines replay it from the same integers). Coverage is an
    exact count ratio, 6dp. ``split_col``: 'cal' rows calibrate,
    'test' rows score; everything else is ignored. n_cal = 0 or
    m > n_cal (α too small for the split) emit NULL q̂/coverage —
    the guarantee is vacuous, not fabricated. q̂ is a property of the
    CALIBRATION split alone, so an empty test split still reports it
    (coverage alone goes NULL — there is nothing to cover).

    Output: 1 row — (n_cal, n_test, m_rank, qhat, coverage).
    """
    from .rank import cumsum_sharded

    res = F.abs(
        F.col(label_col).cast("bigint") - F.col(pred_col).cast("bigint")
    )
    src = df.select(
        F.col(split_col).alias("_s"), res.alias("_r")
    ).filter(F.col("_r").isNotNull() & F.col("_s").isin("cal", "test"))
    cal = src.filter(F.col("_s") == "cal")
    test = src.filter(F.col("_s") == "test")

    counts = cal.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    )
    # m = ceil((n+1)(1-alpha)) in exact integer arithmetic over the
    # rational alpha: with alpha = a_num/a_den,
    # m = ceil((n+1)(a_den-a_num)/a_den) = -floor(-x) = (num + den - 1) div den
    from fractions import Fraction

    fr = Fraction(alpha).limit_denominator(10**6)
    a_num, a_den = fr.numerator, fr.denominator
    # exact ceil-division in decimal: scale-6 decimal division is
    # exact-floorable for denominators ≤ 1e6 (the fractional part of
    # num/den is ≤ 1 − 1e-6, which scale-6 HALF_UP rounding can never
    # carry to the next integer) — a bigint `/` would go through
    # double and lose exactness past 2^53
    num = (
        (F.col("n_cal") + 1) * F.lit(a_den - a_num) + F.lit(a_den - 1)
    ).cast("decimal(38,0)")
    counts = counts.select(
        "n_cal",
        F.floor(num / F.lit(a_den)).cast("bigint").alias("m_rank"),
    )
    cummed, _ = cumsum_sharded(
        cal.groupBy("_r").agg(F.count(F.lit(1)).alias("_n")),
        [F.col("_r").asc()],
        ["_n"],
        inclusive=True,
    )
    dist = cummed.select("_r", F.col("cum__n").alias("_cum"))
    # q̂ = smallest residual whose cumulative count reaches m_rank
    qhat = (
        dist.crossJoin(F.broadcast(counts))
        .filter(F.col("_cum") >= F.col("m_rank"))
        .agg(F.min("_r").alias("qhat"))
    )
    scored = (
        test.crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                (F.col("_r") <= F.col("qhat")).cast("int")
            ).alias("_covered"),
        )
    )
    # q̂ rides in from the CALIBRATION-side frame: re-deriving it
    # through the test aggregate (the pre-fix F.max('qhat') shape)
    # returned NULL on an empty test split even though calibration
    # fully defines it
    out = (
        scored.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(qhat))
    )
    ok = (F.col("n_cal") > 0) & (F.col("m_rank") <= F.col("n_cal"))
    return out.select(
        "n_cal",
        "n_test",
        "m_rank",
        F.when(ok, F.col("qhat")).alias("qhat"),
        F.when(
            ok & (F.col("n_test") > 0),
            F.round(
                F.col("_covered").cast("double")
                / F.col("n_test").cast("double"),
                6,
            ),
        ).alias("coverage"),
    )


def lift_gains(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Decile lift & gains table — the targeting readout that turns a
    scorer into a business decision (mail the top 2 deciles?): rank
    the population by score DESCENDING, cut into ``buckets`` equal
    slices, and report each slice's positive rate against the base
    rate (lift) plus the cumulative share of all positives captured
    (gains). Completes the scorer-eval family: auc (ranking), ece /
    calibration (probability quality), conformal (intervals), lift
    (deployment cutoff).

    Exactness + scale shape (the auc discipline): everything derives
    from the DISTINCT-score table — one groupBy(score) collapse, then
    the exact count of rows ABOVE each score from the two-phase
    sharded prefix sum (operators/rank.py, descending order) and the
    population totals from its 1-row broadcast frame, so no
    data-sized or domain-sized single-partition sort exists; the only
    remaining unsharded window runs on the BUCKET table (≤ ``buckets``
    rows, bounded by the argument). A distinct score belongs to the bucket
    of its FIRST row in descending order: bucket = floor(B·above/n)
    clamped to B−1 — tied scores land in ONE bucket wholesale (the
    deterministic tie rule both engines replay; slice sizes therefore
    wobble by tie-group size rather than splitting a score across
    cutoffs, which would be arbitrary). NULL score/label rows are
    dropped. Ratios are exact-integer divisions, 6dp.

    Output: one row per non-empty bucket, descending score order —
    (bucket, n, n_pos, pos_rate, lift, cum_pos_share).
    """
    from pyspark.sql.window import Window

    from .rank import cumsum_sharded

    src = df.select(
        F.col(score_col).cast("bigint").alias("_v"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
    vals = src.groupBy("_v").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("npos"),
    )
    cummed, totals = cumsum_sharded(
        vals, [F.col("_v").desc()], ["n", "npos"], inclusive=False
    )
    ranked = cummed.crossJoin(F.broadcast(totals)).select(
        "_v",
        "n",
        "npos",
        F.col("cum_n").alias("_above"),
        F.col("tot_n").alias("_nt"),
        F.col("tot_npos").alias("_pt"),
    )
    bucket = F.least(
        F.lit(buckets - 1),
        F.floor(
            F.lit(buckets) * F.col("_above") / F.col("_nt")
        ).cast("int"),
    )
    by_bucket = ranked.groupBy(bucket.alias("bucket")).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("npos").cast("bigint").alias("n_pos"),
        F.max("_nt").alias("_nt"),
        F.max("_pt").alias("_pt"),
    )
    from .rank import bounded_const_key

    # bucket table: <= `buckets` rows by argument — constant-keyed
    # single-effective-partition window (warning-silent)
    wc = (
        Window.partitionBy(bounded_const_key(F.col("bucket")))
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_pos = F.sum("n_pos").over(wc).cast("double")

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    rate = d("n_pos") / d("n")
    base = d("_pt") / d("_nt")
    return by_bucket.select(
        "bucket",
        "n",
        "n_pos",
        F.round(rate, 6).alias("pos_rate"),
        F.when(F.col("_pt") > 0, F.round(rate / base, 6)).alias("lift"),
        F.when(
            F.col("_pt") > 0, F.round(cum_pos / d("_pt"), 6)
        ).alias("cum_pos_share"),
    )


def w1_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between two
    empirical distributions — the drift MAGNITUDE the rest of the
    family can\'t give: PSI names the drifted bucket, KS bounds the
    worst CDF gap, JSD scores overlap, but only W1 says "the
    distribution moved this many VALUE UNITS" (it is the area between
    the CDFs, in value_col\'s own units) — the number a corpus-refresh
    gate can threshold in dollars/cents/tokens.

    Exactness: over integer-valued data (the mann_whitney/ks_test
    quantization contract), W1 = Σ_i |F_A(v_i) − F_B(v_i)|·(v_{i+1} −
    v_i) over the sorted distinct merged support. Each term\'s
    numerator |ca·n_b − cb·n_a|·gap is an exact integer accumulated in
    decimal(38,0); ONE division by n_a·n_b at the end. NULLs are
    un-measurable: dropped and surfaced per side (the auc_exact
    discipline).

    Scale shape: groupBy(value) collapse (domain-bounded), cumulative
    counts from the two-phase sharded prefix sum (rank.py
    cumsum_sharded — no partition ever sorts more than ~domain/32
    rows), and the ADJACENT-value gaps come from
    dedup.sorted_neighborhood_pairs with w=2 — the borrow-plan
    machinery that already carries lead() across shard boundaries,
    reused instead of re-derived. The largest value has no successor
    and contributes no area (both CDFs are 1 there).

    Output: 1 row (n_a, n_b, n_dropped_a, n_dropped_b, w1). Empty
    side → NULL w1 (undefined, not 0); identical distributions → 0.0.
    """
    from .dedup import sorted_neighborhood_pairs
    from .rank import cumsum_sharded

    def side(df: DataFrame, a: int) -> DataFrame:
        return df.select(
            F.col(value_col).cast("bigint").alias("_v"),
            F.lit(a).alias("_sa"),
            F.lit(1 - a).alias("_sb"),
        )

    src = side(df_a, 1).unionByName(side(df_b, 0))
    grouped = src.groupBy(
        F.col("_v").isNotNull().alias("_ok"), "_v"
    ).agg(
        F.sum("_sa").alias("na_i"),
        F.sum("_sb").alias("nb_i"),
    )
    vals = grouped.filter(F.col("_ok")).drop("_ok")
    drops = grouped.filter(~F.col("_ok")).agg(
        F.coalesce(F.sum("na_i"), F.lit(0))
        .cast("bigint")
        .alias("n_dropped_a"),
        F.coalesce(F.sum("nb_i"), F.lit(0))
        .cast("bigint")
        .alias("n_dropped_b"),
    )
    dec = "decimal(38,0)"
    cummed, totals = cumsum_sharded(
        vals, [F.col("_v").asc()], ["na_i", "nb_i"], inclusive=True
    )
    adj = sorted_neighborhood_pairs(
        vals.select("_v"), "_v", "_v", w=2
    ).select(
        F.col("id_a").alias("_v"),
        (F.col("id_b") - F.col("id_a")).cast(dec).alias("_gap"),
    )
    cum = (
        cummed.join(adj, "_v")  # the max value has no successor row
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("cum_na_i").cast(dec).alias("ca"),
            F.col("cum_nb_i").cast(dec).alias("cb"),
            F.col("tot_na_i").cast(dec).alias("ta"),
            F.col("tot_nb_i").cast(dec).alias("tb"),
            F.col("_gap"),
        )
    )
    agg = cum.agg(
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
        F.sum(
            F.abs(F.col("ca") * F.col("tb") - F.col("cb") * F.col("ta"))
            * F.col("_gap")
        ).alias("_num"),
    )
    # single-value support: adj is empty -> agg over empty -> NULLs;
    # recover the totals from the scan\'s broadcast frame instead
    agg = agg.crossJoin(F.broadcast(totals)).select(
        F.coalesce(F.col("n_a"), F.col("tot_na_i"))
        .cast("bigint")
        .alias("n_a"),
        F.coalesce(F.col("n_b"), F.col("tot_nb_i"))
        .cast("bigint")
        .alias("n_b"),
        F.coalesce(F.col("_num"), F.lit(0).cast(dec)).alias("_num"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.crossJoin(F.broadcast(drops)).select(
        F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        "n_dropped_a",
        "n_dropped_b",
        F.when(
            ok, F.round(d("_num") / (d("n_a") * d("n_b")), 6)
        ).alias("w1"),
    )


def pr_curve_topk(
    df: DataFrame,
    score_col: str,
    label_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact precision/recall/F1 operating points over every distinct
    score threshold, ranked by F1 — the classifier THRESHOLD SELECTOR
    (ml_auc_exact scores ranking quality threshold-free; lift_gains
    reads depth deciles; this answers "where do I CUT?" — the number a
    quality-gate like quality_lr_pipeline deploys with). Predict
    positive when score ≥ t, for t over the distinct-score table.

    Exactness: tp/fp/fn at every threshold are exact integers from the
    EXCLUSIVE sharded prefix sum (tp(t) = total_pos − pos_below(t));
    precision/recall/F1 are one double division each from those
    integers, identical cross-engine, and the top-k order
    (f1 desc, threshold asc) is total. ``score_col`` must be
    integer-valued (the ks_test/mann_whitney quantization contract);
    NULL scores or labels are dropped before counting (filter
    upstream to audit them — the lift_gains contract).

    Scale shape: groupBy(score) collapse (domain-bounded), the
    two-phase sharded scan for the cumulatives, TakeOrdered for the
    top-k — no single-partition domain sort anywhere.

    Output: k rows (threshold, tp, fp, fn, precision, recall, f1).
    """
    from .rank import cumsum_sharded

    src = df.select(
        F.col(score_col).cast("bigint").alias("_v"),
        F.col(label_col).cast("int").alias("_y"),
    ).filter(F.col("_v").isNotNull() & F.col("_y").isNotNull())
    vals = src.groupBy("_v").agg(
        F.sum("_y").alias("pos_i"),
        F.sum(F.lit(1) - F.col("_y")).alias("neg_i"),
    )
    cummed, totals = cumsum_sharded(
        vals, [F.col("_v").asc()], ["pos_i", "neg_i"], inclusive=False
    )
    dec = "decimal(38,0)"
    pts = cummed.crossJoin(F.broadcast(totals)).select(
        F.col("_v").alias("threshold"),
        (F.col("tot_pos_i") - F.col("cum_pos_i"))
        .cast("bigint")
        .alias("tp"),
        (F.col("tot_neg_i") - F.col("cum_neg_i"))
        .cast("bigint")
        .alias("fp"),
        F.col("cum_pos_i").cast("bigint").alias("fn"),
    )

    def d(c: str) -> Column:
        return F.col(c).cast("double")

    scored = pts.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        # tp+fp >= 1 always (every threshold is an attained score);
        # tp+fn = total positives can be 0 (all-negative input) and
        # ANSI mode raises on 0/0 -> recall is NULL there, not NaN
        (d("tp") / (d("tp") + d("fp"))).alias("_prec"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            d("tp") / (d("tp") + d("fn")),
        ).alias("_rec"),
        (
            F.lit(2.0)
            * d("tp")
            / (F.lit(2.0) * d("tp") + d("fp") + d("fn"))
        ).alias("_f1"),
    )
    return (
        scored.orderBy(F.col("_f1").desc(), F.col("threshold").asc())
        .limit(k)
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            F.round("_prec", 6).alias("precision"),
            F.round("_rec", 6).alias("recall"),
            F.round("_f1", 6).alias("f1"),
        )
    )


def ndcg_weights(k: int) -> list[float]:
    """The NDCG position weights 1/log2(i+1) for ranks 1..k, computed
    ONCE driver-side and injected as double literals into BOTH the
    Spark expression tree and the generated oracle SQL — the engines
    never call their own log2 (whose last-ULP behavior is not
    guaranteed to agree across libm implementations), so the final
    weighted sum is the identical IEEE expression on both sides."""
    import math

    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def _ranked_candidates(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
):
    """Shared front half of the retrieval-eval family: one row per
    (query, item) candidate with an EXACT-integer score and graded
    integer relevance, ranked per query by score descending with the
    item id as the total-order tiebreak (ties are real in revenue-style
    scores; an undefined tie order would make every metric
    nondeterministic). The window partitions by query — the natural
    key, millions of small partitions at corpus scale, never global."""
    from pyspark.sql.window import Window

    src = df.select(
        F.col(query_col).alias("query"),
        F.col(item_col).alias("item"),
        F.col(score_col).cast("bigint").alias("score"),
        F.col(rel_col).cast("int").alias("rel"),
    ).filter(
        F.col("query").isNotNull()
        & F.col("item").isNotNull()
        & F.col("score").isNotNull()
        & F.col("rel").isNotNull()
    )
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("item").asc()
    )
    return src.withColumn("rank", F.row_number().over(w))


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact per-query NDCG@k — the graded ranking readout for a
    retrieval scorer (the metric that distinguishes "found the
    relevant items" from "found them FIRST"): DCG@k with gains
    2^rel − 1 against the ideal ordering's IDCG@k.

    Exactness discipline (the q9/auc lesson): no float SUM exists
    anywhere. Gains are exact integers (shiftleft, not pow); per-rank
    gains are pivoted into k integer MAX-aggregate columns (order-
    independent), and DCG/IDCG are each ONE fixed-association float
    expression g₁·w₁ + … + g_k·w_k over literal weights from
    :func:`ndcg_weights` — bit-identical in any engine that parses the
    same double literals. The ideal ranking breaks gain ties by item
    id so IDCG is a total order too.

    Output: (query, n_items, dcg, idcg, ndcg) — ndcg NULL when the
    query has no relevant item (IDCG 0), all floats 6dp.
    """
    from pyspark.sql.window import Window

    ranked = _ranked_candidates(df, query_col, item_col, score_col, rel_col)
    wi = Window.partitionBy("query").orderBy(
        F.col("rel").desc(), F.col("item").asc()
    )
    both = ranked.withColumn("irank", F.row_number().over(wi)).withColumn(
        # exact integer gain 2^rel − 1 (the python API's shiftleft
        # takes only a literal count; the SQL form shifts by a column).
        # BIGINT base: an int base masks the shift mod 32, so rel ≥ 31
        # would silently wrap to negative/zero gains — out-of-range rel
        # raises instead of wrapping (ADVICE r8)
        "gain",
        F.expr(
            "CASE WHEN rel BETWEEN 0 AND 62 THEN shiftleft(1L, rel) - 1 "
            "ELSE raise_error(concat('ndcg_at_k: graded relevance must "
            "be in [0, 62], got ', cast(rel as string))) END"
        ),
    )
    aggs = [F.count(F.lit(1)).alias("n_items")]
    for i in range(1, k + 1):
        aggs.append(
            F.max(F.when(F.col("rank") == i, F.col("gain"))).alias(f"_g{i}")
        )
        aggs.append(
            F.max(F.when(F.col("irank") == i, F.col("gain"))).alias(
                f"_ig{i}"
            )
        )
    piv = both.groupBy("query").agg(*aggs)
    ws = ndcg_weights(k)

    def wsum(prefix: str) -> Column:
        expr = None
        for i in range(1, k + 1):
            term = F.coalesce(
                F.col(f"{prefix}{i}"), F.lit(0)
            ).cast("double") * F.lit(ws[i - 1])
            expr = term if expr is None else expr + term
        return expr

    dcg, idcg = wsum("_g"), wsum("_ig")
    return piv.select(
        "query",
        "n_items",
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.when(idcg > 0, F.round(dcg / idcg, 6)).alias("ndcg"),
    )


def mrr_at_k(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query reciprocal rank@k — the "how deep does the user
    scroll" readout: the rank of the FIRST relevant (rel > 0)
    candidate within the top k, and rr = 1/rank (0.0 when no relevant
    candidate makes the cutoff — the query still reports, absence is
    the signal). rr is a single float division over an exact integer
    rank; no float accumulates.

    Output: (query, n_items, first_rel_rank nullable, rr) 6dp.
    """
    ranked = _ranked_candidates(df, query_col, item_col, score_col, rel_col)
    per = ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min(
            F.when(
                (F.col("rel") > 0) & (F.col("rank") <= k), F.col("rank")
            )
        ).alias("first_rel_rank"),
    )
    return per.select(
        "query",
        "n_items",
        "first_rel_rank",
        F.round(
            F.coalesce(
                F.lit(1.0) / F.col("first_rel_rank").cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("rr"),
    )


def map_at_k(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query average precision@k, EXACT-RATIONAL: AP@k's inner sum
    Σ precision@i over relevant ranks i ≤ k is a rational with
    denominators ≤ k, so with L = lcm(1..k) the whole sum is the
    integer Σ c_i · (L/i) (c_i = relevant count at depth i) — both
    engines aggregate exact integers and the ONLY float is the final
    division ap = num / (L · min(R, k)), where R counts the query's
    relevant candidates over the FULL candidate list (the standard
    min(R,k) normalizer: a query with 3 relevant items and all 3 in
    the top k scores 1.0). Relevance is binary at rel > 0; queries
    with R = 0 report ap NULL (no ranking could score on them).

    Output: (query, n_items, n_rel, ap_num, ap) — ap_num is the exact
    integer numerator (the hash anchor), ap 6dp.
    """
    import math

    from pyspark.sql.window import Window

    lcm = math.lcm(*range(1, k + 1))
    ranked = _ranked_candidates(df, query_col, item_col, score_col, rel_col)
    wc = (
        Window.partitionBy("query")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumd = ranked.withColumn(
        "c_i", F.sum((F.col("rel") > 0).cast("bigint")).over(wc)
    )
    per = cumd.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("rel") > 0).cast("bigint")).alias("n_rel"),
        F.coalesce(
            F.sum(
                # L is divisible by every rank <= k, so integer `div`
                # is exact — `/` would detour through doubles
                F.when(
                    (F.col("rel") > 0) & (F.col("rank") <= k),
                    F.expr(f"(c_i * CAST({lcm} AS BIGINT)) div rank"),
                )
            ),
            F.lit(0).cast("bigint"),
        ).alias("ap_num"),
    )
    denom = F.lit(lcm) * F.least(F.col("n_rel"), F.lit(k))
    return per.select(
        "query",
        "n_items",
        "n_rel",
        "ap_num",
        F.when(
            F.col("n_rel") > 0,
            F.round(
                F.col("ap_num").cast("double") / denom.cast("double"), 6
            ),
        ).alias("ap"),
    )


def recall_at_k(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query recall@k — the retrieval-eval family's coverage
    readout (ndcg = position quality, mrr = first hit, map = averaged
    precision, this = how much of the relevant set the cutoff
    captures): hits@k / R with R the query's relevant candidates over
    the FULL list. Exact integer counts from one aggregate over the
    shared ranked frame; the only float is the final division (NULL
    when R = 0 — no ranking could score).

    Output: (query, n_items, n_rel, hits_at_k, recall) 6dp.
    """
    ranked = _ranked_candidates(df, query_col, item_col, score_col, rel_col)
    per = ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("rel") > 0).cast("bigint")).alias("n_rel"),
        F.coalesce(
            F.sum(
                ((F.col("rel") > 0) & (F.col("rank") <= k)).cast("bigint")
            ),
            F.lit(0).cast("bigint"),
        ).alias("hits_at_k"),
    )
    return per.select(
        "query",
        "n_items",
        "n_rel",
        "hits_at_k",
        F.when(
            F.col("n_rel") > 0,
            F.round(
                F.col("hits_at_k").cast("double")
                / F.col("n_rel").cast("double"),
                6,
            ),
        ).alias("recall"),
    )
