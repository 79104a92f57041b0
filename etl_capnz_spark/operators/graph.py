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
