"""Data-integrity auditing for large tables (north-star extension,
SURVEY.md §2.12): order-independent table fingerprints and snapshot
diffing — how a 100 TB pipeline answers "are these two copies identical?"
and "what changed between runs?" WITHOUT moving the data.

Both build on a deterministic per-row hash (md5 bits, the engine's
dialect-portable randomness — operators/sampling.py uses the same trick),
reduced with COMMUTATIVE aggregates (sum/count) so the result is
independent of partitioning, ordering, and engine. Two clusters each
compute their side's fingerprint locally and compare a handful of rows —
reconciliation traffic is O(groups), not O(data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash(*cols: Column) -> Column:
    """52-bit deterministic row hash over '|'-joined column values.

    NULL fields encode as the sentinel string 'NULL' so they still
    perturb the hash (a real "NULL" string collides — callers with that
    hazard pre-escape; none of the driver tables have it). 52 bits keep
    every value and modest sums exactly inside BIGINT on any engine.
    """
    joined = F.concat_ws(
        "|", *[F.coalesce(c.cast("string"), F.lit("NULL")) for c in cols]
    )
    return F.conv(F.substring(F.md5(joined), 1, 13), 16, 10).cast("bigint")


def table_fingerprint(
    df: DataFrame, group_col: str, *hash_cols: str
) -> DataFrame:
    """Per-group fingerprint: (n_rows, hash_sum, hash_min, hash_max).

    sum is the commutative reducer (order/partitioning-invariant); min
    and max catch the degenerate collisions a plain sum could mask. At
    sf100k rows the sum of 52-bit values stays far inside int64; at
    true 100 TB scale, group counts up to ~2^11 per group keep it exact
    too — beyond that, wrap-around is still deterministic and
    comparable, just no longer a sum (both sides wrap identically).
    """
    h = row_hash(*[F.col(c) for c in hash_cols])
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.sum(h).alias("hash_sum"),
        F.min(h).alias("hash_min"),
        F.max(h).alias("hash_max"),
    )


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    key_col: str,
    *value_cols: str,
) -> DataFrame:
    """Row-level diff of two snapshots of the same table: classify every
    key as added / removed / changed / unchanged.

    ONE full-outer equi-join on the key, comparing a per-side row hash —
    value payloads never cross the shuffle, only (key, hash). This is the
    CDC-reconciliation shape: at scale both sides pre-bucket on the key
    and the join is shuffle-free.
    """
    bh = before.select(
        F.col(key_col).alias("_k"),
        row_hash(*[F.col(c) for c in value_cols]).alias("_h_before"),
    )
    ah = after.select(
        F.col(key_col).alias("_k"),
        row_hash(*[F.col(c) for c in value_cols]).alias("_h_after"),
    )
    status = (
        F.when(F.col("_h_before").isNull(), F.lit("added"))
        .when(F.col("_h_after").isNull(), F.lit("removed"))
        .when(F.col("_h_before") != F.col("_h_after"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        bh.join(ah, "_k", "full_outer")
        .select(F.col("_k").alias(key_col), status.alias("change_type"))
    )


def check_constraints(
    df: DataFrame,
    not_null: list[str] = (),
    unique: list[str] = (),
    checks: dict[str, Column] | None = None,
) -> DataFrame:
    """Deequ-style declarative data-quality suite, evaluated in ONE pass.

    ``not_null`` columns, ``unique`` columns (violations = rows beyond
    the first per duplicated value), and arbitrary named boolean
    ``checks`` (violation when the predicate is FALSE or NULL) all fold
    into a single aggregate: conditional sums plus count-distincts —
    one scan, one (partial/final) hash aggregate, no per-check jobs.
    Returns (check, violations) rows, one per constraint.

    Referential-integrity checks need a second table and are a separate
    anti-join count (:func:`fk_violations`) — union the results.
    """
    aggs: list[Column] = []
    names: list[str] = []
    # F.sum over ZERO rows is NULL — coalesce to 0 so a quality gate run
    # on an empty batch reports 0 violations instead of failing open
    # (ADVICE r2: a consumer testing `violations > 0` never sees NULL).
    for c in not_null:
        names.append(f"not_null:{c}")
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).cast("bigint")
        )
    for c in unique:
        names.append(f"unique:{c}")
        aggs.append(
            (
                F.count(F.col(c)) - F.countDistinct(F.col(c))
            ).cast("bigint")
        )
    for name, pred in (checks or {}).items():
        names.append(f"check:{name}")
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
                ),
                F.lit(0),
            ).cast("bigint")
        )
    if not aggs:
        raise ValueError(
            "check_constraints needs at least one constraint "
            "(not_null, unique, or checks)"
        )
    row = df.agg(*[a.alias(f"_c{i}") for i, a in enumerate(aggs)])
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("check"), F.col(f"_c{i}").alias("violations")
            )
            for i, n in enumerate(names)
        ]
    )
    ex = row.select(F.explode(pairs).alias("_e"))
    return ex.select("_e.check", "_e.violations")


def fk_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential-integrity violation count: child keys with no parent
    (NULL child keys are not violations — SQL FK semantics). One
    anti-join; with a dimension-sized parent this broadcasts."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("violations"))
    )
    return orphans.select(
        F.lit(f"fk:{child_key}->{parent_key}").alias("check"), "violations"
    )


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profiler: null count, distinct count, min and max
    (stringified for a uniform schema) for every requested column —
    ALL columns' stats in a single aggregate (no per-column scans), then
    a constant-sized explode to (column, n_nulls, n_distinct, min_s,
    max_s) rows. The profile every ingestion run should emit."""
    aggs: list[Column] = []
    for c in cols:
        aggs += [
            # coalesce: empty table profiles to 0 nulls, not NULL
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias(f"_n_{c}"),
            F.countDistinct(F.col(c)).cast("bigint").alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_n_{c}").alias("n_nulls"),
                F.col(f"_d_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_s"),
                F.col(f"_max_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(pairs).alias("_e")).select(
        "_e.column", "_e.n_nulls", "_e.n_distinct", "_e.min_s", "_e.max_s"
    )


def histogram(
    df: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Equi-width histogram of a numeric column — the distribution half
    of :func:`profile_table` (a profiler that only reports min/max hides
    skew; the histogram is what a 100 TB layout decision actually
    reads).

    One pass for (min, max) — a 1-row aggregate broadcast back via
    crossJoin, never a collect — then one pass binning with pure
    arithmetic: bin = least(n-1, floor((x - min) / width)). Degenerate
    constant columns land everything in bin 0. Output one row per
    OCCUPIED bin: (bin, lo, hi, n) — empty bins are absent (at 100 TB a
    dense bin spine would come from a sequence() join, same as the WAU
    calendar).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1: {n_bins}")
    x = F.col(col).cast("double")
    bounds = df.agg(
        F.min(x).alias("_lo"), F.max(x).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    bin_ = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((x - F.col("_lo")) / width).cast("int"),
        )
    )
    return (
        df.select(x.alias(col))
        .filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(bin_.alias("bin"), "_lo", "_hi")
        .groupBy("bin", "_lo", "_hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.col("_lo") + F.col("bin") * (F.col("_hi") - F.col("_lo")) / n_bins, 6).alias("lo"),
            F.round(F.col("_lo") + (F.col("bin") + 1) * (F.col("_hi") - F.col("_lo")) / n_bins, 6).alias("hi"),
            "n",
        )
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group — the
    MERGEABLE approximate-distinct primitive a 100 TB rollup needs:
    per-partition/day sketches union into coarser rollups WITHOUT
    re-scanning the data, unlike an exact count_distinct whose partials
    aren't mergeable.

    The sketch is the k smallest 52-bit md5 hashes of the DISTINCT
    values (an ascending array). Deterministic md5 keeps it
    oracle-checkable exactly — the estimator is closed-form arithmetic
    on the k-th minimum, so the whole thing is EXACT-reproducible even
    though the estimate itself is approximate (Bar-Yossef et al. 2002;
    the estimator (k−1)/m_k with m_k the k-th minimum normalized to
    [0,1]).

    Output: group_cols + (sketch array<bigint>, n_seen, est_distinct).
    Groups with < k distinct values carry their full hash set and
    est = n_seen (exact in that regime).

    Shape: distinct (group, hash) pairs → rank window per group →
    array_agg of the ≤ k survivors. Both the distinct and the window
    hash on the group key; per-group state is bounded by the sort
    spill, and the published sketch is k × 8 bytes. (A production
    Aggregator would keep the k-heap inside partial aggregation; the
    window form is the same shuffle key and spills instead — identical
    result.) Merge with :func:`kmv_merge`; union-of-sketches ==
    sketch-of-union exactly, pinned in tests.
    """
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    pairs = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = pairs.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.array_sort(F.collect_list("_h")).alias("sketch"),
            F.count(F.lit(1)).alias("n_seen"),
        )
        .select(
            *group_cols,
            "sketch",
            "n_seen",
            _kmv_estimate(F.col("sketch"), F.col("n_seen"), k).alias(
                "est_distinct"
            ),
        )
    )


_KMV_SPACE = float(1 << 52)


def _kmv_estimate(sketch: Column, n_seen: Column, k: int) -> Column:
    kth = F.element_at(sketch, k).cast("double") / F.lit(_KMV_SPACE)
    return F.when(n_seen < k, n_seen.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / kth, 6)
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = 64,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge KMV sketches (e.g. per-day → per-month): union the hash
    arrays, dedupe, keep the k smallest. Because every side hashed with
    the same function, this equals the sketch of the unioned raw data
    EXACTLY — the mergeability property that makes the sketch a
    rollup-safe partial (same contract as operators/rollup.py).

    Input may carry several rows per output group (finer partitions);
    output schema matches :func:`kmv_sketch`.
    """
    from pyspark.sql.window import Window

    exploded = sketches.select(
        *group_cols, F.explode(sketch_col).alias("_h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = exploded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.array_sort(F.collect_list("_h")).alias("sketch"),
            F.count(F.lit(1)).alias("n_seen"),
        )
        .select(
            *group_cols,
            "sketch",
            "n_seen",
            _kmv_estimate(F.col("sketch"), F.col("n_seen"), k).alias(
                "est_distinct"
            ),
        )
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on two KMV sketches (Beyer et
    al. 2007): from nothing but the two k-min-hash arrays, estimate the
    distinct count of the union, the intersection, and the Jaccard
    similarity — the piece that turns the per-partition distinct
    sketch into full set algebra at rollup time (audience overlap,
    cross-corpus contamination, retained-user ratios) with k×8 bytes
    per side and NO second scan of the data.

    The math: L = the k smallest hashes of sketch(A) ∪ sketch(B) is
    exactly the KMV sketch of A ∪ B (mergeability), so
    est_union = (k−1)/m_k as usual; within L, the fraction ρ of hashes
    present in BOTH sketches is an unbiased Jaccard estimate, and
    est_inter = ρ · est_union. When |L| < k both sketches were
    exhaustive and everything is EXACT (n < k regime, same contract as
    :func:`kmv_sketch`). Deterministic md5 makes every output value
    oracle-exact even though the estimators approximate.

    ``a`` and ``b`` carry kmv_sketch output keyed by ``group_cols``;
    the join is an equi-join on those keys (sketch rows, never data
    rows — at 100 TB this is a join of two tiny rollup tables).
    Output: group_cols + (k_union, n_common, est_union, est_inter,
    jaccard_est).
    """
    ua = a.select(
        *group_cols,
        F.col("sketch").alias("_ska"),
    )
    ub = b.select(
        *group_cols,
        F.col("sketch").alias("_skb"),
    )
    j = ua.join(ub, group_cols)
    L = F.slice(F.array_sort(F.array_union("_ska", "_skb")), 1, k)
    kl = F.size(L)
    common = F.size(
        F.array_intersect(L, F.array_intersect("_ska", "_skb"))
    )
    kth = F.element_at(L, k).cast("double") / F.lit(_KMV_SPACE)
    est_u = F.when(kl < k, kl.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / kth, 6)
    )
    return j.select(
        *group_cols,
        kl.alias("k_union"),
        common.alias("n_common"),
        est_u.alias("est_union"),
        F.round(common * est_u / kl, 6).alias("est_inter"),
        F.round(common.cast("double") / kl, 6).alias("jaccard_est"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group anomaly detection via Median Absolute Deviation:
    flag rows where |x − median| > threshold · 1.4826 · MAD (1.4826
    scales MAD to the σ of a normal distribution — the standard robust
    z-score). Unlike mean/stddev gates, a handful of extreme outliers
    cannot inflate the threshold that is supposed to catch them.

    Plan shape: two exact-percentile aggregates (median, then median of
    absolute deviations) each one agg exchange over the group keys, the
    per-group constants broadcast back via equi-join, then a map-only
    filter. Exact percentile holds a value→count buffer per group —
    right when per-group cardinality is bounded (see events_quantiles);
    swap approx_percentile for the unbounded case, same shape.

    Output: the outlier rows plus ``robust_z`` (signed). Groups with
    MAD = 0 (over half the values identical) flag any deviation ≠ 0.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile(_adev, 0.5)").alias("_mad")
    )
    scaled = dev.join(F.broadcast(mad), group_col).withColumn(
        "_sigma", F.lit(1.4826) * F.col("_mad")
    )
    robust_z = F.when(
        F.col("_sigma") > 0,
        (F.col(value_col) - F.col("_med")) / F.col("_sigma"),
    ).otherwise(
        F.when(F.col(value_col) != F.col("_med"), F.lit(float("inf")))
        .otherwise(F.lit(0.0))
    )
    return (
        scaled.withColumn("robust_z", robust_z)
        .filter(F.abs(F.col("robust_z")) > threshold)
        .drop("_med", "_adev", "_mad", "_sigma")
    )


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 128,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Bottom-k uniform-row-sample quantile sketch per group — the
    MERGEABLE quantile primitive that completes the sketch family
    (Misra-Gries = heavy hitters, CMS = frequency, KMV = distinct,
    Bloom = membership, this = quantiles). Per-day sketches merge into
    per-month quantile estimates WITHOUT re-scanning the data, which an
    exact percentile cannot do (its partials aren't mergeable).

    The sketch is the k rows with the smallest 52-bit md5 hashes of the
    row id — a uniform sample of the group's rows, so the sample's
    empirical quantile estimates the population quantile with rank
    error bounded by Dvoretzky–Kiefer–Wolfowitz:
    P(sup_q |rank error| > eps) <= 2 exp(-2 k eps^2), i.e. ~0.10 rank
    error at k=256 with 99% confidence (pinned in tests). Bottom-k by
    hash is EXACTLY mergeable: bottom-k of a union of per-subset
    bottom-k's equals bottom-k of the union (same property KMV relies
    on), and the merge is idempotent — re-merging a replayed batch is a
    set-union no-op (the streaming sink's crash-safety).

    Deterministic md5 keeps every sketch row and the order-statistic
    estimate oracle-checkable EXACTLY even though the estimate itself
    approximates. Estimate for quantile q: the ceil(q*m)-th smallest
    sampled value (m = sample size; groups with < k rows carry every
    row, making the estimate the EXACT type-1 quantile in that regime).
    Rows are identified by ``id_col``: re-observing the same (id, value)
    row collapses to one sample entry (replay/at-least-once safety);
    distinct rows are distinct entries.

    Output: group_cols + sketch array<struct<h:bigint,v:double>> sorted
    by (h, v) + n_kept + one ``est_pXX`` double per requested quantile.
    Shape: one hash-partitioned window per group (same shuffle key as
    the groupBy that follows); published state is k × 16 bytes per
    group. Merge with :func:`quantile_sketch_merge`.
    """
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    pairs = df.select(
        *group_cols,
        h.alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    kept = pairs.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    grouped = kept.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_h").alias("h"), F.col("_v").alias("v")))
        ).alias("sketch"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return _with_quantile_estimates(grouped, group_cols, quantiles)


def _with_quantile_estimates(
    grouped: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...],
) -> DataFrame:
    vals_sorted = F.array_sort(
        F.transform(F.col("sketch"), lambda x: x["v"])
    )
    ests = [
        F.element_at(
            vals_sorted,
            F.greatest(
                F.lit(1), F.ceil(F.lit(float(q)) * F.col("n_kept"))
            ).cast("int"),
        ).alias(f"est_p{int(round(q * 100))}")
        for q in quantiles
    ]
    return grouped.select(*group_cols, "sketch", "n_kept", *ests)


def quantile_sketch_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = 128,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Merge quantile sketches (e.g. per-day -> per-month): union the
    (hash, value) samples, dedupe, keep the k hash-smallest. Because
    every side hashed row ids with the same function over DISJOINT row
    sets, this equals the sketch of the unioned raw data EXACTLY
    (pinned in tests) — and re-merging the same sketch twice is a
    no-op, which is what makes the streaming sink replay-safe with no
    epoch manifest. Output schema matches :func:`quantile_sketch`.
    """
    from pyspark.sql.window import Window

    exploded = sketches.select(
        *group_cols, F.explode("sketch").alias("_p")
    ).select(
        *group_cols,
        F.col("_p.h").alias("_h"),
        F.col("_p.v").alias("_v"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    kept = exploded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    grouped = kept.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_h").alias("h"), F.col("_v").alias("v")))
        ).alias("sketch"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return _with_quantile_estimates(grouped, group_cols, quantiles)


def histogram_equidepth(
    df: DataFrame,
    col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equi-DEPTH histogram (~equal rows per bin) — the complement of
    :func:`histogram`'s equi-width bins and the structure a cost-based
    optimizer actually stores: bin BOUNDS adapt to the distribution, so
    skew shows as narrow bins instead of one overstuffed bar.

    Exact and scalable via the same two-phase distributed rank as
    sampling.training_order_sharded (range-partition + sort on
    (value, id), per-shard counts to the driver — bounded state —
    prefix offsets broadcast back, per-shard window): NO global
    single-partition window. The 0-based global position p maps to a
    bin with SQL ``ntile(k)`` semantics — the first N mod k buckets
    carry the extra row (front-loaded; a naive floor(p·k/N) spreads
    the remainder evenly and diverges from every engine's ntile) — so
    the DuckDB oracle is a plain ntile aggregate.

    Output: (bin 1-based, n_rows, lo, hi); adjacent bins may share a
    boundary value when ties straddle the cut (inherent to exact
    equi-depth, pinned in tests).
    """
    from pyspark.sql.window import Window

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1: {n_bins}")
    x = F.col(col).cast("double")
    # localCheckpoint pins ONE materialized range partitioning: the
    # per-shard counts and the final binning are two ACTIONS, and
    # repartitionByRange re-samples its bounds per execution — without
    # the checkpoint the offsets computed for one partitioning get
    # applied to a different one (observed: bin counts off by ~1%).
    staged = (
        df.select(x.alias("_x"), F.col(id_col).alias("_id"))
        .repartitionByRange(32, F.col("_x"), F.col("_id"))
        .sortWithinPartitions("_x", "_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in staged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc
    offset_col = F.lit(0)
    for pid, off in sorted(offsets.items()):
        offset_col = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(
            offset_col
        )
    w = Window.partitionBy("_pid").orderBy("_x", "_id")
    pos = F.row_number().over(w) - 1 + offset_col
    # SQL ntile semantics exactly: the FIRST (N mod k) buckets carry
    # the extra row (front-loaded), not an even spread — a plain
    # floor(p*k/N) alternates the big buckets and diverges from every
    # engine's ntile (observed vs DuckDB).
    q, r = total // n_bins, total % n_bins
    cut = r * (q + 1)
    bin_ = (
        F.when(
            F.lit(q) == 0, pos  # fewer rows than bins: one row per bin
        )
        .when(pos < cut, F.floor(pos / F.lit(q + 1)))
        .otherwise(F.lit(r) + F.floor((pos - F.lit(cut)) / F.lit(q)))
        .cast("int")
        + 1
    )
    return (
        staged.withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("lo"),
            F.max("_x").alias("hi"),
        )
    )


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """Benford first-significant-digit test — the classic fraud /
    data-fabrication screen: natural multi-scale magnitudes follow
    P(d) = log10(1 + 1/d); fabricated or truncated data doesn't.

    The digit is extracted from EXACT integer cents (round(x·100) →
    substr of the integer's string form) — never from log10-of-double
    or from float rendering, both of which flip boundary values
    per-engine. Expected counts and the χ² contribution keep libm in
    play (log10), but only through identical expression trees whose
    1-ulp differences vanish at the 6dp rounding.

    One aggregate (9 output rows); the observed-total rides a window
    over those 9 rows, not a second scan. Output: (digit, n_obs,
    expected, chi2_contrib), ALWAYS all digits 1-9 — a fully-absent
    digit (the most anomalous case this screen exists to catch) joins
    in with n_obs=0 so its full expected-count mass n·log10(1+1/d)
    lands in the χ² as (0−exp)²/exp instead of silently vanishing.
    Zero/negative values skipped.
    """
    from pyspark.sql.window import Window

    cents = F.round(F.col(value_col) * 100).cast("bigint")
    d = F.substring(cents.cast("string"), 1, 1).cast("int")
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    per = digits.join(
        df.filter(cents > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs")),
        "digit",
        "left",
    ).select("digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs"))
    from .rank import bounded_const_key

    # 9-row digit table; warning-silent const key
    w = Window.partitionBy(bounded_const_key(F.col("digit")))
    n = F.sum("n_obs").over(w)
    exp = n * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return per.select(
        "digit",
        "n_obs",
        F.round(exp, 6).alias("expected"),
        F.round((F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6)
        .alias("chi2_contrib"),
    ).orderBy("digit")


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_shards: int = 32,
    cents: bool = False,
) -> DataFrame:
    """Gini concentration coefficient over exact integer cents:
    G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n with x ascending (the Lorenz
    closed form) — the single-number complement of revenue_pareto's
    decile table.

    Exactness: x is integer cents, the rank i comes from the two-phase
    sharded scan (training_order_sharded's shape — no one-partition
    global window over the unit table, which unlike a calendar axis
    grows with the data), so Σ(i·x_i), Σx and n are all EXACT BIGINTs;
    the only float step is the final closed form, one identical
    expression in both engines — bit-exact, raw double out.

    ``cents=True`` declares value_col ALREADY an exact integer (e.g. a
    per-unit sum of cents computed upstream — rounding a float total
    would re-introduce the order-dependent sum this design avoids).

    Output: 1 row (n_units, total_cents, gini).
    """
    from pyspark.sql.window import Window

    x = (
        F.col(value_col).cast("bigint")
        if cents
        else F.round(F.col(value_col) * 100).cast("bigint")
    )
    staged = (
        df.select(F.col(id_col).alias("_id"), x.alias("_x"))
        .repartitionByRange(n_shards, F.col("_x"), F.col("_id"))
        .sortWithinPartitions("_x", "_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # pin ONE sampled range partitioning
    )
    counts = {
        r["_pid"]: r["n"]
        for r in staged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_col = F.lit(0)
    for pid, off in sorted(offsets.items()):
        offset_col = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(
            offset_col
        )
    w = Window.partitionBy("_pid").orderBy(
        F.col("_x").asc(), F.col("_id").asc()
    )
    ranked = staged.select(
        "_x",
        (F.row_number().over(w) + offset_col).cast("bigint").alias("_i"),
    )
    # Σ(i·x_i) accumulates in DECIMAL(38,0): with ranks ~n and n terms
    # the sum grows like n²·x̄ and leaves int64 near n≈1e8 — the oracle
    # engine's sum(BIGINT) is 128-bit by default, so the decimal side
    # keeps Spark exact at the same scales instead of ANSI-throwing.
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_x").alias("total_cents"),
        F.sum(
            F.col("_i").cast("decimal(19,0)")
            * F.col("_x").cast("decimal(19,0)")
        ).alias("_a"),
    )
    # n·S as DOUBLEs: the int64 product overflows (ANSI throw) around
    # n≈1e9 units of ~1e15 total cents — exactly the 100 TB regime.
    # One double product rounds once, identically in both engines.
    g = (
        F.lit(2.0) * F.col("_a")
        / (
            F.col("n_units").cast("double")
            * F.col("total_cents").cast("double")
        )
        - (F.col("n_units") + F.lit(1.0)) / F.col("n_units")
    )
    return agg.select("n_units", "total_cents", g.alias("gini"))


def mutual_information(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Mutual information between two categorical columns —
    MI = Σ p(x,y)·ln(p(x,y)·N / (n_x·n_y)) in nats — the
    feature-vs-label association screen (is `source` informative
    about `lang`? is a feature worth keeping?) and the redundancy
    test between features.

    Exactness: every probability is a ratio of EXACT counts from one
    (x, y) aggregate (marginals derive from window sums over the
    contingency cells, not second scans); the log argument is
    arranged as one integer-ratio expression ((n_xy·N)/(n_x·n_y)) so
    both engines evaluate the identical tree, and the final
    cell-sum rounds at 6dp (the only order-dependent float step —
    dozens of cells, error ~1e-15). NULL categories count as their
    own level (SQL GROUP BY semantics).

    Output: 1 row (n, n_cells, mi_nats, plus the normalized variant
    mi_norm = MI/min(H(x), H(y)) for comparability).
    """
    from pyspark.sql.window import Window

    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).alias("nxy"))
    from .rank import bounded_const_key

    wx = Window.partitionBy("_x")
    wy = Window.partitionBy("_y")
    # cell-table total (bounded by |x|·|y| cells); warning-silent key
    wall = Window.partitionBy(bounded_const_key(F.col("_x")))
    e = (
        cells.withColumn("nx", F.sum("nxy").over(wx))
        .withColumn("ny", F.sum("nxy").over(wy))
        .withColumn("n", F.sum("nxy").over(wall))
    )
    nd = F.col("n").cast("double")
    p = F.col("nxy") / nd
    mi_term = p * F.log(
        (F.col("nxy").cast("double") * nd)
        / (F.col("nx").cast("double") * F.col("ny").cast("double"))
    )
    hx_term = (F.col("nxy") / nd) * F.log(F.col("nx").cast("double") / nd)
    hy_term = (F.col("nxy") / nd) * F.log(F.col("ny").cast("double") / nd)
    agg = e.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(mi_term).alias("_mi"),
        (-F.sum(hx_term)).alias("_hx"),
        (-F.sum(hy_term)).alias("_hy"),
    )
    return agg.select(
        "n",
        "n_cells",
        F.round(F.col("_mi"), 6).alias("mi_nats"),
        F.round(
            F.col("_mi") / F.least(F.col("_hx"), F.col("_hy")), 6
        ).alias("mi_norm"),
    )


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the contingency-table screen (is event mix independent of
    daypart? is label mix independent of source?) that complements the
    Benford screen and the two-arm tests.

    One aggregate builds the observed table; row totals, column totals
    and N ride WINDOWS over that small table (categories x categories
    rows — never a second scan of the data). Counts are exact BIGINTs;
    expected = row_total·col_total/N and the (o−e)²/e contribution are
    the only floats, computed as one identical expression tree per
    engine, 6dp. The caller sums chi2_contrib and compares against the
    chi-square quantile at (r−1)(c−1) dof (pinned in tests). ALL
    observed cells emit; absent combinations contribute nothing here
    because their expected counts require the marginals the table
    defines — the standard contingency convention (unlike Benford's
    fixed 1-9 support, the category product set is data-defined).
    """
    from pyspark.sql.window import Window

    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    from .rank import bounded_const_key

    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    # (r, c) cell-table total; warning-silent const key
    wall = Window.partitionBy(bounded_const_key(F.col("r")))
    t = (
        obs.withColumn("row_total", F.sum("n_obs").over(wr))
        .withColumn("col_total", F.sum("n_obs").over(wc))
        .withColumn("n_total", F.sum("n_obs").over(wall))
    )
    e = (
        F.col("row_total").cast("double")
        * F.col("col_total").cast("double")
        / F.col("n_total").cast("double")
    )
    return t.select(
        "r",
        "c",
        "n_obs",
        "row_total",
        "col_total",
        F.round(e, 6).alias("expected"),
        F.round(
            (F.col("n_obs") - e) * (F.col("n_obs") - e) / e, 6
        ).alias("chi2_contrib"),
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 10,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit — the re-identification gate a
    dataset passes BEFORE it is released or folded into training data:
    every combination of quasi-identifiers (the columns an adversary
    can link from outside — segment, region, zip, age band) must be
    shared by ≥ k records (k-anonymity), and within each such
    equivalence class the SENSITIVE attribute must take ≥ l distinct
    values (l-diversity — a class of 50 people who all share one
    diagnosis is k-anonymous and still leaks everything).

    One groupBy over the quasi-identifier columns — the equivalence
    classes ARE the groups, so the audit is a single two-phase
    aggregate (count + count-distinct per class; the distinct rides
    the same exchange). Output is one row PER CLASS with both
    violation flags, not a pass/fail scalar: the release decision
    needs to know WHICH slices to generalize or suppress. NULL QI
    values form their own class (NULL is linkable too — a missing
    zip code is an identifier when only one record lacks it).

    Output: (qi_cols..., n, n_sensitive, k_violation, l_violation).
    """
    return (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(F.col(sensitive_col))
            .cast("bigint")
            .alias("n_sensitive"),
        )
        .select(
            *qi_cols,
            "n",
            "n_sensitive",
            (F.col("n") < k).alias("k_violation"),
            (F.col("n_sensitive") < l_div).alias("l_violation"),
        )
    )


def randomized_response_counts(
    df: DataFrame,
    group_col: str,
    truth_col: str,
    id_col: str,
    seed: str = "rr1",
    flip_bp: int = 2500,
) -> DataFrame:
    """Local-DP frequency estimation via randomized response — the
    privacy mechanism that IS oracle-exact, where Laplace/Gaussian
    noise can never be (their inverse CDFs need ln/erf, whose
    last-ULP behavior differs across libm implementations): each row
    reports its true boolean with probability 1 − flip_bp/10⁴ and the
    flipped value otherwise, the coin being a seeded md5 of the row id
    — deterministic, reproducible, and replayable by any engine with
    md5. That per-row plausible deniability is ε-local-DP with
    ε = ln((10⁴−flip_bp)/flip_bp) (ε ≈ 1.1 at the 25% default).

    The collector never sees the truth column in the aggregate — only
    the reported bits — and debiases per group with the EXACT-RATIONAL
    estimator: E[obs] = p·T + (1−p)(n−T) solves to
    T̂ = (10⁴·obs − flip_bp·n) / (10⁴ − 2·flip_bp), an integer
    numerator and denominator with a single float division at the end
    (the house q9 discipline — no float accumulates).

    One narrow projection + one groupBy; the only shuffle carries
    (group, n, obs). Output: (group_col, n, n_reported_true,
    est_true, est_rate) — est_true can legitimately fall outside
    [0, n] on small groups (the unbiasedness/clamping trade-off,
    reported un-clamped so the caller sees the noise floor).
    """
    if not 0 < flip_bp < 5000:
        raise ValueError("flip_bp must be in (0, 5000): p must exceed 1/2")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    flipped = (u % 10000) < flip_bp
    reported = F.when(
        flipped, ~F.col(truth_col).cast("boolean")
    ).otherwise(F.col(truth_col).cast("boolean"))
    # NULL discipline (ADVICE r8): a NULL truth row would count in n
    # but contribute nothing to the reported sum (silent downward bias
    # in est_true), and a NULL id row gets a NULL coin so its TRUE
    # value passes through unflipped — voiding that row's plausible
    # deniability. Both are excluded up front, mirroring
    # _ranked_candidates' null discipline.
    per = (
        df.filter(F.col(id_col).isNotNull() & F.col(truth_col).isNotNull())
        .select(F.col(group_col).alias("grp"), reported.alias("_r"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("_r").cast("int")).cast("bigint").alias(
                "n_reported_true"
            ),
        )
    )
    denom = 10000 - 2 * flip_bp
    num = F.lit(10000) * F.col("n_reported_true") - F.lit(flip_bp) * F.col("n")
    return per.select(
        F.col("grp").alias(group_col),
        "n",
        "n_reported_true",
        F.round(num.cast("double") / F.lit(float(denom)), 6).alias(
            "est_true"
        ),
        F.round(
            num.cast("double") / (F.lit(float(denom)) * F.col("n").cast("double")),
            6,
        ).alias("est_rate"),
    )
