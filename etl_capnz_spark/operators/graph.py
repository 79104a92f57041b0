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
