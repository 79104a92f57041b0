"""Dataset-assembly operators for training-data pipelines (SURVEY.md §2.12).

The reference engine has no sampling stage; these are the extension
operators a 100 TB corpus pipeline needs between "deduped documents" and
"training shards": deterministic sampling (reproducible across reruns and
engines — no RNG state), class rebalancing, deterministic global shuffle,
and token-budget sequence packing.

Scale design:

* hash sampling — a narrow filter on a per-row hash: no shuffle, no RNG,
  pushdown-friendly (the filter sits directly over the scan). The same
  rows are selected on any cluster size and by the DuckDB oracle, because
  the selector is md5 (dialect-portable), not xxhash/rand.
* stratified / balanced sampling — stratified is the same narrow filter
  with a per-stratum rate; balanced is one shuffle on the label (window
  row_number), the minimum any exact per-class cap needs. Skewed labels
  are AQE's problem, not a collect's.
* training order — ONE global range-partitioned sort on a seeded hash key.
  This is the idiomatic Spark "deterministic shuffle": executors sample
  key ranges, each writes one sorted shard, no driver bottleneck.
* sequence packing — contiguous first-fill packing per shard key: a
  running-sum window (one shuffle on the shard key) assigns each doc a
  bin = floor(exclusive_cumsum / budget). Bins can overshoot the budget
  by at most one document — the standard streaming approximation; exact
  bin-packing is NP-hard and needs global state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_pct(col: Column, salt: str = "") -> Column:
    """Deterministic per-row percentile in [0, 100) from md5 bits.

    First 52 bits of ``md5(salt || value)`` modulo 100 — uniform enough
    for sampling, reproducible in any engine with md5 (DuckDB oracle:
    ``('0x' || substr(md5(...), 1, 13))::BIGINT % 100``).
    """
    basis = F.concat(F.lit(salt), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(basis), 1, 13), 16, 10).cast("bigint")
        % 100
    )


def deterministic_sample(
    df: DataFrame, id_col: str, pct: int, salt: str = "s1"
) -> DataFrame:
    """Keep ~pct% of rows, chosen by id hash — stable across reruns,
    partitionings, and engines (unlike ``df.sample``, whose RNG is
    partition-layout-dependent)."""
    return df.filter(hash_pct(F.col(id_col), salt) < pct)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
    salt: str = "s1",
) -> DataFrame:
    """Per-stratum deterministic sampling (mixture weighting): each value
    of ``strata_col`` keeps its own percentage. The rate table is a CASE
    expression (broadcast-free); sampling itself stays a narrow filter."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_pct(F.col(id_col), salt) < rate)


def balanced_sample(
    df: DataFrame, id_col: str, label_col: str, per_label: int
) -> DataFrame:
    """Exact per-class cap: keep the ``per_label`` lowest-id rows of every
    label (deterministic — no RNG, ties impossible on a key column).
    One shuffle on the label; the window never sees more than one
    partition's rows per task after AQE skew-splitting."""
    w = Window.partitionBy(label_col).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_label)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "w1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    (A-ES) keys: each row gets key = ln(u)/w with u ∈ (0,1) a
    deterministic md5-derived uniform, and the top-n rows by key are the
    sample — inclusion probability proportional to weight, no
    replacement, one pass.

    Scale shape: the key is a narrow per-row expression; the top-n plans
    as TakeOrderedAndProject (per-partition heaps, then a single n-row
    merge on the driver side of the exchange) — no global sort, no
    window, no shuffle of the losing rows. Deterministic hash randomness
    (like ``hash_pct``) keeps the sample stable across reruns,
    partitionings, and engines; swap the salt to draw a fresh sample.

    Weights must be > 0 (ln(u) < 0, so larger w ⇒ key closer to 0 ⇒
    ranked higher).
    """
    basis = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(basis), 1, 13), 16, 10).cast("bigint")
    # u in (0,1): 52 hash bits shifted into the open interval.
    u = (h + F.lit(1.0)) / F.lit(float(2**52) + 2.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("_es_key", key)
        .orderBy(F.col("_es_key").desc(), F.col(id_col))
        .limit(n)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "w1",
) -> DataFrame:
    """Per-group weighted reservoir: the k Efraimidis–Spirakis-keyed
    winners of EVERY group — the shape that builds a training mixture
    ("k docs per source, preferring high quality-score") in one pass.
    Same key as :func:`weighted_sample` (ln(u)/w, u a deterministic
    md5 uniform, weights > 0), but ranked per group with a window
    instead of a global top-n: one hash exchange on the group key, and
    losers never leave their task after the rank filter.

    Distributionally this IS a weighted reservoir of size k per group
    (Efraimidis & Spirakis 2006): for k=1 the inclusion probability is
    exactly w_i/Σw (pinned statistically in tests); deterministic hash
    randomness keeps the drawn sample identical across reruns,
    partitionings, and engines — swap the salt for a fresh draw.
    """
    basis = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(basis), 1, 13), 16, 10).cast("bigint")
    u = (h + F.lit(1.0)) / F.lit(float(2**52) + 2.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("_es_key"), F.col(id_col)
    )
    return (
        df.withColumn("_es_key", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_es_key", "_rn")
    )


def training_order(
    df: DataFrame, id_col: str, seed: str = "epoch0"
) -> DataFrame:
    """Deterministic global shuffle: order rows by a seeded md5 key and
    emit ``position`` (0-based). Changing ``seed`` reshuffles; the same
    seed always yields the identical order — reproducible epochs.

    Implementation is ONE global sort (range-partitioned at scale).
    row_number over a no-partition window is the exact rank; Spark plans
    it as a single-partition window AFTER the sort, which is fine for the
    final lightweight (key, id) projection. At shard-writing scale use
    :func:`training_order_sharded` — bit-identical positions via a
    two-phase distributed rank with no global window."""
    from .rank import bounded_const_key

    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    # deliberate global sort (sharded twin: training_order_sharded);
    # warning-silent const key
    w = (
        Window.partitionBy(bounded_const_key(F.col(id_col)))
        .orderBy(key.asc(), F.col(id_col).asc())
    )
    return df.select(
        F.col(id_col),
        (F.row_number().over(w) - 1).alias("position"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Contiguous token-budget packing: docs are taken in ``id_col`` order
    (per shard if ``shard_col`` given) and assigned
    ``bin = floor(exclusive_running_token_sum / budget)``.

    Streaming approximation of first-fit: each bin is a contiguous id
    range and may overshoot the budget by at most its last document —
    the shape every large-scale packing pipeline uses, because it needs
    only a running-sum window (one shuffle), not global bin state."""
    parts = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    cols = parts + [
        id_col,
        token_col,
        F.floor(cum_excl / budget).alias("bin"),
    ]
    return df.select(*cols)


def interleave_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic weighted interleave across sources — the "data
    mixture" ordering of a training run: any prefix of the output
    contains sources in proportion to their weights (a weight-3 source
    appears 3x as often as a weight-1 source).

    Classic fractional-position scheme: row k (1-based) of a source gets
    key k/weight; the global order sorts by key. Two shuffles total
    (per-source position, then the global range-partitioned sort) and no
    RNG — the same mixture on any cluster and in the oracle.
    """
    w_pos = Window.partitionBy(source_col).orderBy(id_col)
    weight = F.lit(float(default_weight))
    for value, wt in sorted(weights.items()):
        weight = F.when(F.col(source_col) == value, F.lit(float(wt))).otherwise(
            weight
        )
    key = F.row_number().over(w_pos).cast("double") / weight
    from .rank import bounded_const_key

    # deliberate global interleave sort; warning-silent const key
    w_glob = (
        Window.partitionBy(bounded_const_key(F.col(id_col)))
        .orderBy(key.asc(), F.col(source_col).asc(), F.col(id_col).asc())
    )
    return df.select(
        F.col(id_col),
        F.col(source_col),
        (F.row_number().over(w_glob) - 1).alias("position"),
    )


def training_order_sharded(
    df: DataFrame, id_col: str, seed: str = "epoch0", n_shards: int = 32
) -> DataFrame:
    """Scale path for :func:`training_order`: identical positions without
    the single-partition global window.

    Two-phase distributed rank (the DataFrame form of zipWithIndex):
    range-partition + sort on the seeded key, count rows per shard (tiny
    aggregate — ``n_shards`` rows of driver state), broadcast the prefix
    offsets back, and rank within each shard under a PER-SHARD window.
    Every stage is bounded: no executor ever sees more than one shard's
    rows, no window is global. Positions are bit-identical to
    ``training_order`` because range partitions are contiguous slices of
    the same total order.
    """
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    # localCheckpoint pins ONE materialized range partitioning: the
    # shard counts and the final rank are two ACTIONS, and
    # repartitionByRange re-samples its bounds per execution — without
    # the pin, offsets computed for one partitioning can be applied to
    # a different one (the hazard observed and fixed in
    # audit.histogram_equidepth, same two-phase-rank shape).
    staged = (
        df.select(F.col(id_col), key.alias("_k"))
        .repartitionByRange(n_shards, F.col("_k"), F.col(id_col))
        .sortWithinPartitions("_k", id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # n_shards rows to the driver — bounded, independent of data size
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
    w = Window.partitionBy("_pid").orderBy(F.col("_k").asc(), F.col(id_col).asc())
    return staged.select(
        F.col(id_col),
        (F.row_number().over(w) - 1 + offset_col).alias("position"),
    )


def hash_ppm(col: Column, salt: str = "") -> Column:
    """Deterministic per-row bucket in [0, 1e6) — :func:`hash_pct` at
    parts-per-million resolution for fine-grained rates."""
    basis = F.concat(F.lit(salt), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(basis), 1, 13), 16, 10).cast("bigint")
        % 1_000_000
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    target_rows: int,
    salt: str = "t1",
) -> DataFrame:
    """Temperature-weighted corpus mixture (T=2 ⇒ α=1/2 up/down-weighting
    à la multilingual pretraining): source ``s`` receives weight
    ``sqrt(n_s) / Σ sqrt(n_s)`` — large sources are down-weighted, small
    ones up-weighted relative to proportional sampling — and is then
    hash-sampled at rate ``min(1, target_rows·w_s / n_s)``.

    Deterministic end to end: per-source counts → sqrt weights (sqrt is
    IEEE-exact, and the rate is rounded to 6 dp so the ppm threshold is
    an engine-portable integer) → md5-bucket filter. No driver state:
    counts stay distributed (tiny per-source aggregate broadcast back);
    sampling is a narrow filter, so at 100 TB this is one metadata-sized
    agg plus a map-only pass.
    """
    if target_rows < 1:
        raise ValueError(f"target_rows must be >= 1: {target_rows}")
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    tot = counts.agg(F.sum(F.sqrt("_n")).alias("_sumw"))
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows))
                * F.sqrt("_n")
                / F.col("_sumw")
                / F.col("_n"),
            ),
            6,
        ).alias("_rate"),
    )
    # round() before the bigint cast: Spark's double→bigint TRUNCATES
    # while DuckDB's ROUNDS, and 0.123456*1e6 can land at 123455.99…;
    # explicit round keeps the ppm threshold engine-portable
    threshold = F.round(F.col("_rate") * 1_000_000, 0).cast("bigint")
    return df.join(F.broadcast(rates), source_col).filter(
        hash_ppm(F.col(id_col), salt) < threshold
    ).drop("_rate")


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    salt: str = "split1",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Train/val/test assignment that near-duplicates can NEVER
    straddle: hash the dedup CLUSTER, not the document. A plain
    :func:`hash_pct` split (see ``train_split``) puts two near-identical
    docs on opposite sides of the train/test wall ~2·p·(1−p) of the
    time — silent eval contamination that no per-doc split can avoid.
    Here every doc is first labelled with its duplicate-cluster id
    (connected components over the candidate pairs; singletons are their
    own cluster), then the CLUSTER id is hashed — all members land in
    the same split, and membership is stable as the corpus grows.

    Scale: components shuffle only (id, label) pairs (see
    :func:`~etl_capnz_spark.operators.dedup.connected_components`); the
    doc join is one shuffle on ``id_col`` — or map-only where docs are
    already bucketed by id. Output adds ``split_group`` (the cluster id
    the hash is computed from — keep it: eval tooling can verify the
    no-straddle invariant downstream) and ``split``.
    """
    from etl_capnz_spark.operators.dedup import connected_components

    comp = connected_components(dup_pairs, src, dst).withColumnRenamed(
        "id", id_col
    )
    labelled = docs.join(comp, id_col, "left").withColumn(
        "split_group", F.coalesce(F.col("component"), F.col(id_col))
    )
    pct = hash_pct(F.col("split_group"), salt)
    split = (
        F.when(pct < train_pct, F.lit("train"))
        .when(pct < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return labelled.withColumn("split", split).drop("component")


def quantile_normalize(
    df: DataFrame,
    id_col: str,
    value_col: str,
    source_col: str,
    n_shards: int = 32,
) -> DataFrame:
    """Per-source quantile normalization onto the GLOBAL distribution:
    each row's value is replaced by the global value sitting at the
    same quantile position — the training-mix leveller that makes
    quality scores comparable across heterogeneous sources (a source
    whose scorer runs hot no longer floods a score-thresholded mix).

    Discrete, exactly-specified mapping (no interpolation, so the
    result is a VALUE FROM THE DATA and integer-exact when the input
    is integer): pr = percent_rank within source over (value, id);
    global index = round(pr · (N−1)) + 1; normalized value = the
    global value at that (value, id)-ordered rank. percent_rank and
    the single float product are the only floating steps and both
    engines evaluate the identical expression, so even the round()
    half-cases agree.

    Shape: the global rank comes from the two-phase sharded scan
    (range shards + per-shard counts to the driver + offset broadcast;
    localCheckpoint pins the sampled partitioning) — NO one-partition
    window; the per-source percent_rank is an ordinary per-source
    window; the final equi-join keys on the integer global rank.

    Output: (id, source, value, norm_value).
    """
    from pyspark.sql.window import Window

    staged = (
        df.select(
            F.col(value_col).alias("_v"), F.col(id_col).alias("_id")
        )
        .repartitionByRange(n_shards, F.col("_v"), F.col("_id"))
        .sortWithinPartitions("_v", "_id")
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
    w = Window.partitionBy("_pid").orderBy("_v", "_id")
    g = staged.select(
        (F.row_number().over(w) + offset_col).cast("bigint").alias("_rk"),
        F.col("_v").alias("norm_value"),
    )
    sw = Window.partitionBy(source_col).orderBy(value_col, id_col)
    idx = (
        F.round(F.percent_rank().over(sw) * F.lit(total - 1)).cast("bigint")
        + 1
    )
    ranked = df.select(
        id_col, source_col, value_col, idx.alias("_idx")
    )
    return ranked.join(g, ranked["_idx"] == g["_rk"]).select(
        id_col, source_col, value_col, "norm_value"
    )


def rolling_origin_folds(
    df: DataFrame,
    ts_col: str,
    k: int = 3,
    horizon_slices: int = 1,
) -> DataFrame:
    """Rolling-origin (expanding-window) cross-validation folds — the
    only CV scheme that respects time: fold i trains on everything up
    to cutoff_i and tests on the window right after it, so no fold ever
    sees the future (random K-fold on temporal data leaks by
    construction; :func:`leakage_safe_split` guards duplicate leakage,
    this guards TEMPORAL leakage — the two walls a forecasting/ranking
    eval needs).

    Cutoffs split the observed [min_ts, max_ts] span into k+1 equal
    slices: cutoff_i = t0 + (span·i) div (k+1); test_i = (cutoff_i,
    cutoff_i + (span·horizon_slices) div (k+1)]. Every wall is EXACT
    integer-microsecond arithmetic — products, modulo, and a division
    that is exact by construction ((a − a mod b)/b is an integer ≤ 2⁵³,
    so the double holds it exactly) — because a float quotient at a
    wall flips membership of boundary rows per-engine.

    Shape: the span is a 1-row aggregate broadcast into a k-way
    fan-out projection (each row lands in ≤ k folds, each at most once
    per role) — one scan, no shuffle. Returns the assignment table
    (input columns + fold + split); rows outside both windows of a
    fold carry no row for that fold.
    """
    mm = df.agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("_t0"),
        F.max(F.unix_micros(F.col(ts_col))).alias("_t1"),
    )

    def exact_div(a: Column, b: int) -> Column:
        return ((a - a % F.lit(b)) / F.lit(b)).cast("bigint")

    folds = []
    us = F.unix_micros(F.col(ts_col))
    span = F.col("_t1") - F.col("_t0")
    for i in range(1, k + 1):
        cutoff = F.col("_t0") + exact_div(span * F.lit(i), k + 1)
        test_end = cutoff + exact_div(
            span * F.lit(horizon_slices), k + 1
        )
        folds.append(
            F.when(us <= cutoff, F.struct(F.lit(i).alias("fold"),
                                          F.lit("train").alias("split")))
            .when(us <= test_end, F.struct(F.lit(i).alias("fold"),
                                           F.lit("test").alias("split")))
        )
    return (
        df.crossJoin(F.broadcast(mm))
        .select(
            "*",
            F.explode(
                F.filter(F.array(*folds), lambda s: s.isNotNull())
            ).alias("_f"),
        )
        .select("*", "_f.fold", "_f.split")
        .drop("_f", "_t0", "_t1")
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    seed: str = "neg0",
    oversample: int = 2,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: k
    pseudo-random non-self partners per anchor, reproducible across
    reruns, partitionings, and engines — md5 is the RNG (the
    training_order / sampling discipline; a real rand() cannot be
    oracle-checked and resamples every retry).

    Mechanics: every row gets a dense position from the two-phase
    sharded rank (:func:`training_order_sharded` — no one-partition
    window); each anchor draws ``k·oversample`` slots
    hash(seed:anchor:j) mod N and equi-joins them back to positions;
    self-hits drop, duplicate draws keep their smallest j, and the
    first k survivors by (j, neg_id) win. Oversampling covers
    self/duplicate losses; an anchor can end under k only if the draw
    space collapses (tiny corpora — documented, not padded, so the
    draw arithmetic stays exactly replayable).

    Shape: bounded k·oversample fan-out, one equi-join on the slot,
    one (anchor, neg) aggregate, one per-anchor window — ids only ever
    shuffle. Output: (anchor, neg_id, j).
    """
    pos = training_order_sharded(df, id_col, seed=seed)
    n = pos.agg((F.max("position") + 1).alias("_n"))
    draws = (
        df.select(F.col(id_col).alias("anchor"))
        .crossJoin(F.broadcast(n))
        .select(
            "anchor",
            "_n",
            F.explode(
                F.sequence(F.lit(1), F.lit(k * oversample))
            ).alias("j"),
        )
        .select(
            "anchor",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit(seed),
                                F.col("anchor").cast("string"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("_n")
            ).alias("slot"),
        )
    )
    cand = (
        draws.join(
            pos.select(
                F.col(id_col).alias("neg_id"),
                F.col("position").alias("slot"),
            ),
            "slot",
        )
        .filter(F.col("neg_id") != F.col("anchor"))
        .groupBy("anchor", "neg_id")
        .agg(F.min("j").alias("j"))
    )
    w = Window.partitionBy("anchor").orderBy("j", "neg_id")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("anchor", "neg_id", "j")
    )
