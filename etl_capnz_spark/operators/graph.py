"""Iterative graph algorithms on DataFrames (north-star extension,
SURVEY.md §2.12): PageRank — the classic link-graph authority signal a
large-scale corpus pipeline uses to weight crawl sources (Common-Crawl-
style domain ranking feeding quality-weighted sampling).

Companion to the label-propagation connected components in
``operators/dedup.py``: components converge on min-label equality;
PageRank runs a FIXED number of power iterations so the result is
deterministic and oracle-checkable (the DuckDB twin unrolls the same
iterations as CTEs — identical arithmetic, exact match).

Distributed shape per iteration: one equi-join (ranks ⋈ edges on src) +
one hash aggregate (sum contributions per dst) — both shuffle on node
keys only, partial-aggregated map-side. Plan depth grows linearly with
iterations; at real scale ``localCheckpoint`` every few iterations
truncates lineage exactly as ``connected_components`` does (dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import engine_checkpoint


def bfs_distances(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Minimum hop distance from a seed set, up to ``max_hops`` — BFS as
    iterative frontier expansion. Each hop is one equi-join (frontier ⋈
    edges on src) + a LEFT ANTI join against the visited set, so a node
    expands exactly ONCE (the visited-pruning that keeps dense graphs
    from re-expanding every round — the scale-correct BFS shape; an
    unpruned expansion is exponential in hop count on cyclic graphs).

    ``seeds`` has one column ``node``. Returns (node, dist) for every
    node within ``max_hops``. The DuckDB oracle states the UNION ALL
    recursive-CTE form with min(dist) — identical results, because
    visited pruning never changes the MINIMUM distance.
    """
    visited = seeds.select("node").withColumn("dist", F.lit(0))
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = nxt.localCheckpoint()
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return visited


def out_degrees(edges: DataFrame) -> DataFrame:
    """Out-degree per source node. ``edges`` has columns (src, dst)."""
    return edges.groupBy("src").agg(F.count("*").alias("out_deg"))


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list (src, dst).

    rank⁰(v) = 1.0; rankᵏ⁺¹(v) = (1-d) + d·Σ_{u→v} rankᵏ(u)/out_deg(u).

    Every node that appears as a src or dst is a vertex; vertices with no
    inbound edges settle at (1-d). Dangling nodes (no outbound edges)
    simply contribute nothing — their mass is dropped, matching the
    "simplified PageRank" the oracle mirrors (no global dangling-mass
    redistribution, which would add an all-reduce per iteration).

    Returns (node, rank) — rank unrounded; callers round for comparison.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # deg and edges both descend from the same plan — rename deg's key so
    # the per-iteration three-way join is unambiguous (classic self-join
    # hazard; aliasing makes the lineage explicit).
    deg = out_degrees(edges).withColumnRenamed("src", "_deg_src")
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            ranks.join(deg, ranks.node == F.col("_deg_src"))
            .join(edges, ranks.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def sssp(
    edges: DataFrame, seeds: DataFrame, rounds: int = 4
) -> DataFrame:
    """Bounded-round single-source(-set) shortest paths — Bellman-Ford
    relaxation over an edge list (src, dst, w): after k rounds, dist(v)
    is the exact shortest distance using ≤ k edges (and the true
    shortest distance once k ≥ the graph's hop diameter from the seeds).

    Per round: ONE equi-join (dist ⋈ edges on src) + one min-aggregate —
    both shuffle node keys only, map-side partial-aggregated; lineage is
    localCheckpoint-truncated per round like connected_components.
    INTEGER weights keep every distance exact and dialect-portable, so
    the DuckDB oracle unrolls the identical rounds as CTEs and matches
    hash-exactly (the PageRank discipline). ``seeds`` has one column
    ``node``; returns (node, dist) for nodes reachable in ≤ rounds hops.
    """
    dist = seeds.select("node").withColumn(
        "dist", F.lit(0).cast("bigint")
    )
    for _ in range(rounds):
        relaxed = dist.join(edges, dist.node == edges.src).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        dist = dist.localCheckpoint()
    return dist


def kcore(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """k-core: the maximal subgraph in which every node keeps degree
    >= k — iterative peeling (drop under-degree nodes, recompute, until
    stable), the standard density filter for cleaning crawl/link graphs
    before ranking (spam farms peel away; the core survives).

    ``edges`` must be a SYMMETRIC, distinct, loop-free edge list
    (src, dst) — both directions present, as the sssp callers build.
    Per round: one map-side-combinable degree aggregate + two semi
    joins against the survivor set — node keys only ever shuffle, and
    ``localCheckpoint`` truncates lineage per round (the
    connected_components discipline) so plan depth stays constant.
    Convergence needs two bounded driver reads per round (node count
    and survivor count — 1-row aggregates, never data). Peeling is
    monotone (the survivor set only shrinks), so the fixpoint is the
    unique k-core regardless of arrival order — which is why a
    fixed-depth unrolled-CTE oracle can match it exactly once the
    unroll reaches the observed fixpoint depth.

    Returns (node, deg) — degrees WITHIN the core. Raises if the peel
    has not stabilised after ``max_rounds`` (cannot happen before
    node-count rounds; the cap is a loop guard, not a semantic knob).
    """
    cur = edges.localCheckpoint()
    for _ in range(max_rounds):
        deg = (
            cur.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .localCheckpoint()
        )
        n = deg.count()
        keep = deg.filter(F.col("deg") >= k).select("src")
        kept = keep.count()
        if kept == n or kept == 0:
            return deg.filter(F.col("deg") >= k).select(
                F.col("src").alias("node"), "deg"
            )
        cur = (
            cur.join(keep, "src", "semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "semi")
            .localCheckpoint()
        )
    raise RuntimeError(f"k-core peel did not converge in {max_rounds} rounds")


def label_propagation(edges: DataFrame, rounds: int) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan's
    LPA, the deterministic variant): every node starts labelled with
    itself; each round, EVERY node simultaneously adopts the most
    frequent label among its neighbours, ties broken by smallest
    label — so the whole algorithm is integer/string counting with a
    total-order tie-break and NO floats, which is what lets a
    fixed-depth unrolled-CTE oracle match it exactly (the PageRank /
    sssp / kcore discipline; the asynchronous textbook variant is
    run-order-dependent and uncheckable).

    ``edges`` must be symmetric/distinct/loop-free (the kcore
    contract). Per round: one join carrying (node, label), one
    (node, label) count aggregate, one per-node top-1 window — all
    exchanges carry keys+labels, never payloads; ``localCheckpoint``
    truncates lineage per round so plan depth stays constant at any
    round count. Synchronous LPA on bipartite-ish graphs can
    oscillate, which is why ``rounds`` is a REQUIRED explicit cap, not
    a convergence loop: the caller picks the horizon, and the oracle
    unrolls the same number.

    Returns (node, label).
    """
    from pyspark.sql.window import Window

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        votes = (
            edges.join(
                labels.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        top = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
        # symmetric edges => every node votes, but keep the isolated-
        # node fallback explicit so the contract survives other inputs
        labels = (
            labels.select("node")
            .join(top, "node", "left")
            .withColumn("label", F.coalesce("label", F.col("node")))
            .localCheckpoint()
        )
    return labels


def hits(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """HITS hubs-and-authorities, UNNORMALIZED power iteration from
    a(v) = 1: each round computes h(u) = Σ_{u→v} a(v) then
    a(v) = Σ_{u→v} h(u). Dropping the usual per-round normalisation
    keeps every score an exact INTEGER (sums of products of degrees) —
    the ranking is identical (normalisation is a positive scalar) and
    the oracle becomes a plain join/aggregate SQL program instead of a
    float-division hazard: the same trade pagerank cannot make (its
    damping term forces floats) — together they cover both link-
    analysis shapes. Scores grow like (σ_max)^(2·rounds), so small
    round counts are the contract (2 rounds ≈ co-citation strength);
    bigint overflow at extreme rounds is the caller's trade-off.

    Per round: two joins + two aggregates, each exchanging (node,
    int) pairs only. Returns (node, hub, auth) for every node.
    """
    if rounds < 1:
        # hub is only defined by the loop body; rounds=0 would leave it
        # None and crash the final join with a bare AttributeError.
        raise ValueError(f"hits() needs rounds >= 1, got {rounds}")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    auth = nodes.withColumn("a", F.lit(1).cast("bigint"))
    hub = None
    for _ in range(rounds):
        hub = (
            edges.join(
                auth.select(F.col("node").alias("dst"), "a"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        hub = (
            nodes.join(hub, "node", "left")
            .withColumn("h", F.coalesce("h", F.lit(0).cast("bigint")))
            .localCheckpoint()
        )
        auth = (
            edges.join(
                hub.select(F.col("node").alias("src"), "h"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        auth = (
            nodes.join(auth, "node", "left")
            .withColumn("a", F.coalesce("a", F.lit(0).cast("bigint")))
            .localCheckpoint()
        )
    return nodes.join(hub, "node").join(auth, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("auth")
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 3,
    seed: str = "walk0",
    decode=None,
) -> DataFrame:
    """Deterministic uniform random walks — the corpus-generation step
    of node2vec/DeepWalk-style graph embeddings: one walk of
    ``walk_len`` steps from EVERY node, the next hop drawn uniformly
    from the current node's neighbours with md5 as the RNG (the
    negative-sampling discipline: real rand() is neither replayable
    nor oracle-checkable).

    Mechanics: the adjacency list is ranked once per source (idx
    0..deg−1, ordered by dst for a stable total order); step s of the
    walk from ``start`` picks idx = hash52(seed:start:s) mod deg(cur).
    The step is TWO bounded equi-joins: walker state joins the
    one-row-per-node degree table first (fan-out exactly 1) to
    compute idx as a column, then equi-joins the ranked adjacency on
    BOTH (node, idx) — at most one adjacency row matches, so each
    walker emits exactly one row per step. (The earlier single-key
    join on node alone materialized deg(node) rows per walker before
    a post-join idx filter kept one — a scale-killer on power-law
    hubs: 10⁶-degree hub × co-located walkers; measured in
    tools/skew_probe.py.) Exchanges carry (start, cur) node pairs;
    ``walk_len`` is a small constant, so the plan is walk_len bounded
    join rounds — and the oracle unrolls the same rounds with the
    same hash arithmetic. A node with no out-edges ends its walk
    early (inner join) — on the symmetric graphs the callers build,
    walks always complete.

    Output: (start, step, node) — step 0 is the start itself.

    ``decode`` (opt r9, guide §2.3 "shuffle keys and metadata instead
    of payloads" / narrower types): when the caller's node ids are
    densely codeable, it can pass numeric ``src``/``dst`` plus a
    ``decode(col) -> string`` expression producing the ORIGINAL string
    id. Every per-step join/exchange then carries bigint keys instead
    of strings (the profiled join stages spent ~10 s CPU hashing and
    sort-merging "p:<id>" strings per step, 15-18 MB per exchange),
    while semantics are unchanged: the adjacency rank orders by
    ``decode(dst)`` (the same string order), the per-step RNG hashes
    ``decode(start)`` (the same md5 input — precomputed ONCE per
    walker at init instead of re-derived each step), and the output
    decodes back to strings. ``decode=None`` keeps string ids as-is.
    """
    import os as _os

    from pyspark.sql.window import Window

    from ..session import flat_local_checkpoint

    if decode is None:
        decode = lambda c: c  # noqa: E731 — ids already strings

    # Pre-partitioned adjacency (opt r10, guide §2.4): every step joins
    # the SAME deg_tbl/adj_idx, but each step executes as its own query
    # (the inter-step checkpoints + AQE's eager stage materialization),
    # so no exchange reuse ever forms and the adjacency re-shuffled
    # TWICE PER STEP. With AQE off for this operator,
    # flat_local_checkpoint preserves hashpartitioning/ordering, so
    # materializing deg_tbl and adj_idx hash(node)-partitioned and
    # (node, idx)-sorted ONCE makes every per-step join consume them in
    # place — per step, only the walker state itself shuffles (the walk
    # moves; that exchange is inherent). hash(node) co-partitions the
    # (node, idx) equi-join too: a subset of the join keys clusters it.
    # An r9 persist() variant had the same effect (6.1 -> 4.5 s) but
    # was REJECTED because the SQL cache outlives the query and leaks
    # precomputation across bench passes; these checkpoints are pinned
    # to the per-invocation DataFrames. SPARK_GRAFT_WALK_IMPL=aqe
    # restores the r9 behavior for A/B.
    prepart = _os.environ.get("SPARK_GRAFT_WALK_IMPL", "prepart") != "aqe"
    if not prepart:
        return _walk_loop(edges, walk_len, seed, decode, prepart=False)
    # Subset co-partitioning: the per-step (node, idx) equi-join is
    # clustered by hash(node) alone (idx rides along), but
    # requireAllClusterKeysForCoPartition (default true) makes
    # EnsureRequirements re-exchange BOTH sides to (node, idx) anyway.
    # Relaxing it for the walk's scope lets every step consume the
    # hash(node)-checkpointed adjacency AND its own deg-join output in
    # place — one exchange per step (the moving walker state, which is
    # inherent). Skew safety is unchanged: partitioning by node is
    # exactly what the (node)-keyed deg join imposes already. The step
    # queries execute inside this scope (AQE materializes the lazy
    # checkpoints' stages at creation); the returned plan only unions
    # checkpointed RDDs.
    spark = edges.sparkSession
    key_conf = "spark.sql.requireAllClusterKeysForCoPartition"
    was = spark.conf.get(key_conf, "true")
    spark.conf.set(key_conf, "false")
    try:
        return _walk_loop(edges, walk_len, seed, decode, prepart=True)
    finally:
        spark.conf.set(key_conf, was)


def _walk_loop(
    edges: DataFrame,
    walk_len: int,
    seed: str,
    decode,
    prepart: bool,
) -> DataFrame:
    from pyspark.sql.window import Window

    from ..session import flat_local_checkpoint

    spark = edges.sparkSession
    adj = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy(decode(F.col("dst")))
    ranked = adj.withColumn(
        "idx", (F.row_number().over(w) - 1).cast("bigint")
    )
    deg = ranked.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranked = engine_checkpoint(ranked.join(deg, "src"), eager=False)
    # one row per node, derived from the CHECKPOINTED ranked frame so
    # the per-step degree join never recomputes the ranking window
    deg_tbl = ranked.filter(F.col("idx") == 0).select(
        F.col("src").alias("node"), "deg"
    )
    adj_idx = ranked.select(F.col("src").alias("node"), "dst", "idx")
    if prepart:
        # AQE goes off ONLY while these two checkpoints are CREATED:
        # the checkpoint extracts outputPartitioning/ordering from the
        # static physical plan at creation (an AdaptiveSparkPlanExec
        # reports Unknown), and the lazy RDD is compiled here too — the
        # per-step queries themselves keep AQE (a full AQE-off loop was
        # A/B-measured 9% slower: static 32-way exchanges of the tiny
        # sf0.1 walker state cost more than the saved adjacency
        # shuffles). The steps' joins then consume hash(node)/(node,
        # idx)-sorted adjacency in place at the pinned partition count.
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            deg_tbl = flat_local_checkpoint(
                deg_tbl.repartition(n_part, "node").sortWithinPartitions(
                    "node"
                ),
                eager=False,
            )
            adj_idx = flat_local_checkpoint(
                adj_idx.repartition(n_part, "node").sortWithinPartitions(
                    "node", "idx"
                ),
                eager=False,
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    # The step hashes depend only on (seed, start, step): compute ALL of
    # them once at walker init (one md5 per (walker, step) instead of
    # re-deriving the string form inside every join stage) and carry the
    # not-yet-used ones as bigint columns — in coded mode the loop below
    # then touches no strings at all.
    hcols = [
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        decode(F.col("start")).cast("string"),
                        F.lit(str(s)),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias(f"_h{s}")
        for s in range(1, walk_len + 1)
    ]
    from ..session import flat_local_checkpoint

    # init state is read twice (the step-0 output branch AND step 1's
    # join input): checkpoint it so the distinct + per-walker md5 batch
    # runs once (lazy — materialized by the first consumer).
    state = flat_local_checkpoint(
        adj.select(F.col("src").alias("start"))
        .distinct()
        .select("start", F.col("start").alias("node"), *hcols),
        eager=False,
    )
    out = state.select("start", "node").withColumn("step", F.lit(0))
    for s in range(1, walk_len + 1):
        carry = [f"_h{t}" for t in range(s + 1, walk_len + 1)]
        state = (
            state.join(deg_tbl, "node")
            .withColumn("idx", F.col(f"_h{s}") % F.col("deg"))
            .join(adj_idx, ["node", "idx"])
            .select("start", F.col("dst").alias("node"), *carry)
        )
        # lazy checkpoint: the output unions EVERY step, and without
        # the pin step s re-executes joins 1..s (quadratic work in
        # walk_len — measured 10.8 s -> with pin, each join runs once).
        # Flat form so step s+1's plan never inherits compounded stats
        # (session.flat_local_checkpoint).
        from ..session import flat_local_checkpoint

        state = flat_local_checkpoint(state, eager=False)
        out = out.unionByName(
            state.select("start", "node").withColumn("step", F.lit(s))
        )
    return out.select(
        decode(F.col("start")).alias("start"),
        "step",
        decode(F.col("node")).alias("node"),
    )


def adamic_adar_bipartite(
    edges: DataFrame,
    left_col: str,
    right_col: str,
    k: int = 20,
    max_degree: int | None = None,
) -> DataFrame:
    """Bipartite Adamic-Adar similarity — rank left-node pairs by
    their shared right-neighbors, each neighbor weighted 1/ln(deg):
    a supplier shared by two parts says more when it supplies few
    parts (the classic link-prediction/similarity score, bipartite
    form — co-supplier part similarity, co-author similarity,
    user-item co-engagement).

    Exactness discipline: each neighbor's contribution quantizes ONCE
    to integer nano-units (round(1e9/ln(deg)) — deterministic per
    node, identical in both engines), so the per-pair score is an
    EXACT integer sum — no partition-order-dependent float sum
    exists. Neighbors with degree 1 cannot be shared; degree ≤ 1 is
    filtered before the wedge join.

    Scale shape: one degree aggregate, then the wedge build is a
    single equi-join of the edge list with itself on the right node —
    fan-out C(deg, 2) per right node, the quadratic hot-hub hazard
    every wedge enumeration has (triangle counting included). The
    ``max_degree`` cap EXCLUDES ultra-hub neighbors from scoring
    (the dedup_lsh_capped discipline): a 10⁶-degree hub at 100 TB
    would emit 5·10¹¹ wedges while contributing 1/ln(10⁶) ≈ 0.07
    per pair — negligible signal, unbounded cost. With the cap, the
    oracle replays the SAME filter, so capped runs stay oracle-exact.
    Top-k is a TakeOrdered on (score desc, u, v) — a total order, so
    ties break identically everywhere.

    Output: k rows — (u, v, n_common, score_nano, score).
    """
    left = edges.select(
        F.col(left_col).alias("u"), F.col(right_col).alias("w")
    ).distinct()
    deg = left.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= max_degree)
    contrib = deg.filter(F.col("deg") > 1).select(
        "w",
        F.round(F.lit(1e9) / F.log("deg")).cast("bigint").alias("_c"),
    )
    right = left.select(F.col("u").alias("v"), "w")
    wedges = (
        left.join(contrib, "w")
        .join(right, "w")
        .filter(F.col("u") < F.col("v"))
    )
    scores = wedges.groupBy("u", "v").agg(
        F.sum("_c").alias("score_nano"),
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
    )
    return (
        scores.orderBy(F.col("score_nano").desc(), "u", "v")
        .limit(k)
        .select(
            "u",
            "v",
            "n_common",
            "score_nano",
            F.round(
                F.col("score_nano").cast("double") / F.lit(1e9), 6
            ).alias("score"),
        )
    )


def clustering_coefficients(
    edges: DataFrame, u_col: str = "u", v_col: str = "v"
) -> DataFrame:
    """Exact triangle counts + local clustering coefficient per node,
    via DEGREE-ORDERED edge orientation — the standard way to count
    triangles on a skewed graph without a hub blow-up (Chiba–Nishizeki
    / Schank–Wagner node-iterator with ordering; the same wedge-
    enumeration hazard :func:`adamic_adar_bipartite` caps, solved here
    structurally instead):

    * undirected edges canonicalize (least, greatest), dedup, drop
      self-loops/NULLs;
    * every edge orients from the endpoint EARLIER in the
      (degree, node) total order to the later one — a DAG in which a
      node's out-degree is at most O(√m) regardless of its true
      degree, because a hub's edges point INTO it from its
      lower-degree neighbors;
    * wedges enumerate only from out-neighbor pairs (apex = the
      order-minimum corner, so each triangle has exactly ONE apex),
      and close with one equi-join back to the oriented edge list —
      Σ out_deg² ≤ O(m^1.5) total wedges, vs Σ deg² (unbounded under
      skew) for the naive enumeration;
    * corners explode ×3 and hash-aggregate per node.

    Every step is an equi-join or hash agg on node keys — no
    CartesianProduct (pinned in tests). The coefficient is ONE float
    division + round(6) per node (2·T / (deg·(deg−1))), identical in
    the oracle; all counts are exact integers.

    Output: (node, degree, triangles, clustering) — clustering 0.0
    for degree < 2 (no wedge exists; 0/0 is defined away, not NULL).
    """
    e = (
        edges.select(
            F.least(F.col(u_col), F.col(v_col)).alias("a"),
            F.greatest(F.col(u_col), F.col(v_col)).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ed = e.join(
        deg.select(F.col("n").alias("a"), F.col("degree").alias("_da")),
        "a",
    ).join(
        deg.select(F.col("n").alias("b"), F.col("degree").alias("_db")),
        "b",
    )
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    tris = (
        oriented.alias("x")
        .join(oriented.alias("y"), F.col("x.src") == F.col("y.src"))
        .filter(F.col("x.dst") != F.col("y.dst"))
        .join(
            oriented.alias("z"),
            (F.col("z.src") == F.col("x.dst"))
            & (F.col("z.dst") == F.col("y.dst")),
        )
        .select(
            F.col("x.src").alias("c1"),
            F.col("x.dst").alias("c2"),
            F.col("y.dst").alias("c3"),
        )
    )
    corners = (
        tris.select(
            F.explode(F.array("c1", "c2", "c3")).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(corners, "n", "left").select(
        F.col("n").alias("node"),
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0))
        .cast("bigint")
        .alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                (
                    F.lit(2.0)
                    * F.coalesce(F.col("triangles"), F.lit(0))
                )
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )
