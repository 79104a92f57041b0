"""PageRank (operators/graph.py): exact agreement with a driver-side
reference implementation on a small graph, plus the mass-conservation
property that holds when no node is dangling."""

import pytest
from pyspark.sql import functions as F

from etl_capnz_spark.operators.graph import pagerank

EDGES = [
    ("a", "b"),
    ("b", "a"),
    ("a", "c"),
    ("c", "a"),
    ("b", "c"),
    ("d", "a"),  # d has out-degree but no in-edges -> settles at 0.15
]


def _reference(edges, iterations, damping):
    nodes = sorted({n for e in edges for n in e})
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0.0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / out_deg[s]
        rank = {n: (1 - damping) + damping * contrib[n] for n in nodes}
    return rank


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_matches_reference(spark, iterations):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=iterations, damping=0.85).collect()
    }
    want = _reference(EDGES, iterations, 0.85)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12), n


def test_pagerank_conserves_mass_without_dangling(spark):
    """Symmetric edge set = no dangling nodes: each iteration maps total
    mass S -> N*(1-d) + d*S, whose fixed point is N — starting at N, the
    total stays N forever."""
    sym = EDGES + [(d, s) for s, d in EDGES]
    edges = spark.createDataFrame(sorted(set(sym)), "src string, dst string")
    ranks = pagerank(edges, iterations=4, damping=0.85)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    n = ranks.count()
    assert total == pytest.approx(n, rel=1e-9)
