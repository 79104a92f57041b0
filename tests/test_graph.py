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


def test_sssp_exact_on_crafted_graph(spark):
    """Bellman-Ford relaxation: known shortest paths on a weighted
    diamond (direct edge beats the 2-hop path or not, per weights),
    bounded-hop semantics (node beyond `rounds` hops absent)."""
    from etl_capnz_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [
            ("a", "b", 1), ("a", "c", 5), ("b", "c", 1),   # a->c via b = 2 < 5
            ("c", "d", 1),
            ("d", "e", 1), ("e", "f", 1), ("f", "g", 1),   # chain past bound
        ],
        "src string, dst string, w bigint",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in sssp(edges, seeds, rounds=3).collect()}
    # <=3 edges: b(1), c(2 via b — beats the direct 5), d(3 edges via b),
    # and e ONLY via the direct a->c edge (a,c,d,e = 3 edges, cost 7) —
    # the bounded-round value may exceed the true shortest (4, needs 4
    # edges); one more round must tighten it
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 7}
    got4 = {r["node"]: r["dist"] for r in sssp(edges, seeds, rounds=4).collect()}
    assert got4["e"] == 4 and got4["f"] == 8
    assert "g" not in got4  # needs 5 edges


def _sym(spark, und):
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src string, dst string")


def test_kcore_triangle_with_pendant_chain(spark):
    """Triangle + chain hanging off it: the chain peels away round by
    round (a multi-round cascade), the triangle is the 2-core."""
    from etl_capnz_spark.operators.graph import kcore

    und = [("a", "b"), ("b", "c"), ("c", "a"),
           ("c", "d"), ("d", "e"), ("e", "f")]
    got = {
        r["node"]: r["deg"] for r in kcore(_sym(spark, und), 2).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_core(spark):
    from etl_capnz_spark.operators.graph import kcore

    und = [("a", "b"), ("b", "c")]  # path: 2-core is empty
    assert kcore(_sym(spark, und), 2).count() == 0


def test_kcore_matches_pure_python_peel_and_partition_invariant(spark):
    import random

    from etl_capnz_spark.operators.graph import kcore

    rng = random.Random(9)
    und = {tuple(sorted((f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")))
           for _ in range(120)}
    und = [(a, b) for a, b in und if a != b]

    def peel(k):
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        while True:
            bad = [n for n, v in adj.items() if len(v) < k]
            if not bad:
                return {n: len(v) for n, v in adj.items()}
            for n in bad:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]

    df = _sym(spark, und)
    for k in (2, 3, 4):
        got = {r["node"]: r["deg"] for r in kcore(df, k).collect()}
        assert got == peel(k), f"k={k}"
    got7 = {r["node"]: r["deg"]
            for r in kcore(df.repartition(7), 3).collect()}
    assert got7 == peel(3)


def test_label_propagation_pure_python_parity_and_partition_invariance(spark):
    """Synchronous LPA vs a from-scratch pure-Python simulation of the
    same rule (most frequent neighbour label, ties -> smallest), over a
    barbell graph (two triangles bridged by one edge) where the labels
    must collapse within each triangle; plus partition invariance."""
    from etl_capnz_spark.operators.graph import label_propagation

    und = [("a", "b"), ("b", "c"), ("c", "a"),
           ("x", "y"), ("y", "z"), ("z", "x"),
           ("c", "x")]

    def simulate(rounds):
        adj = {}
        for p, q in und:
            adj.setdefault(p, set()).add(q)
            adj.setdefault(q, set()).add(p)
        lab = {n: n for n in adj}
        for _ in range(rounds):
            new = {}
            for n in adj:
                votes = {}
                for m in adj[n]:
                    votes[lab[m]] = votes.get(lab[m], 0) + 1
                best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                new[n] = best[0][0] if best else n
            lab = new
        return lab

    df = _sym(spark, und)
    for rounds in (1, 2, 3):
        got = {r["node"]: r["label"]
               for r in label_propagation(df, rounds).collect()}
        assert got == simulate(rounds), f"rounds={rounds}"
    got7 = {r["node"]: r["label"]
            for r in label_propagation(df.repartition(7), 2).collect()}
    assert got7 == simulate(2)


def test_hits_pure_python_parity_star_graph(spark):
    """Unnormalized HITS vs a pure-Python power iteration on a directed
    star-plus-chain: integer scores must match exactly at every round
    count (sums of products of degrees — no float anywhere)."""
    from etl_capnz_spark.operators.graph import hits

    dir_edges = [("hubA", "p1"), ("hubA", "p2"), ("hubA", "p3"),
                 ("hubB", "p2"), ("hubB", "p3"), ("p3", "hubA")]

    def simulate(rounds):
        nodes = {n for e in dir_edges for n in e}
        a = {n: 1 for n in nodes}
        h = {}
        for _ in range(rounds):
            h = {n: 0 for n in nodes}
            for s, d in dir_edges:
                h[s] += a[d]
            a = {n: 0 for n in nodes}
            for s, d in dir_edges:
                a[d] += h[s]
        return h, a

    df = spark.createDataFrame(dir_edges, "src string, dst string")
    for rounds in (1, 2, 3):
        got = {r["node"]: (r["hub"], r["auth"])
               for r in hits(df, rounds).collect()}
        hh, aa = simulate(rounds)
        assert got == {n: (hh[n], aa[n]) for n in hh}, f"rounds={rounds}"

    # rounds < 1 is a contract error, not an AttributeError deep in
    # the final join (hub is only defined by the loop body)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rounds"):
        hits(df, 0)


def test_random_walks_valid_edges_and_pure_python_parity(spark):
    """Every consecutive (step s → s+1) hop must be a real edge; every
    node starts exactly one complete walk (symmetric graph, no dead
    ends); and the whole walk set equals a pure-Python simulation of
    the same hash arithmetic — md5 is the RNG, so parity is exact."""
    import hashlib

    from etl_capnz_spark.operators.graph import random_walks

    und = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    df = _sym(spark, und)
    L = 3
    out = random_walks(df, walk_len=L, seed="w").collect()
    adj = {}
    for p, q in und:
        adj.setdefault(p, set()).add(q)
        adj.setdefault(q, set()).add(p)
    walks = {}
    for r in out:
        walks.setdefault(r["start"], {})[r["step"]] = r["node"]
    assert set(walks) == set(adj)
    for start, steps in walks.items():
        assert sorted(steps) == list(range(L + 1))
        assert steps[0] == start
        for s in range(L):
            assert steps[s + 1] in adj[steps[s]], (start, s)

    def h52(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    for start in adj:
        cur = start
        for s in range(1, L + 1):
            nbrs = sorted(adj[cur])
            cur = nbrs[h52(f"w:{start}:{s}") % len(nbrs)]
            assert walks[start][s] == cur, (start, s)

    again = sorted(map(tuple, random_walks(
        df.repartition(7), walk_len=L, seed="w"
    ).collect()))
    assert again == sorted(map(tuple, out))


def test_adamic_adar_bipartite_hand_case_and_cap(spark):
    """AA on a planted bipartite graph matches the closed form (pair
    sharing two rare neighbors beats a pair sharing one common one);
    degree-1 neighbors contribute nothing; the max_degree cap
    excludes hub neighbors; ties rank by (u, v); partition-invariant."""
    import math

    from etl_capnz_spark.operators.graph import adamic_adar_bipartite

    # u1,u2 share w1(deg2) and w2(deg2); u3,u4 share hub wh(deg4:
    # u1..u4); u5 has private w5(deg1)
    edges = [
        (1, "w1"), (2, "w1"),
        (1, "w2"), (2, "w2"),
        (1, "wh"), (2, "wh"), (3, "wh"), (4, "wh"),
        (5, "w5"),
    ]
    df = spark.createDataFrame(edges, "s long, p string")

    def nano(deg):
        return round(1e9 / math.log(deg))

    got = {
        (r["u"], r["v"]): r
        for r in adamic_adar_bipartite(df, "s", "p", k=10).collect()
    }
    # (1,2): two deg-2 neighbors + the deg-4 hub
    assert got[(1, 2)]["score_nano"] == 2 * nano(2) + nano(4)
    assert got[(1, 2)]["n_common"] == 3
    # (3,4): hub only
    assert got[(3, 4)]["score_nano"] == nano(4)
    # u5's degree-1 neighbor creates no pair
    assert not any(5 in pair for pair in got)

    # cap 3 removes the hub wholesale: (3,4) disappears, (1,2) drops
    # the hub term
    capped = {
        (r["u"], r["v"]): r
        for r in adamic_adar_bipartite(
            df, "s", "p", k=10, max_degree=3
        ).collect()
    }
    assert capped[(1, 2)]["score_nano"] == 2 * nano(2)
    assert (3, 4) not in capped

    rep = {
        (r["u"], r["v"]): r
        for r in adamic_adar_bipartite(
            df.repartition(7), "s", "p", k=10
        ).collect()
    }
    assert rep == got


# ------------------------------------------------------------- triangles
def test_clustering_coefficients_known_graph(spark):
    """K4 (every node coeff 1.0) + a pendant on node 1 (its degree
    rises to 4, coeff drops to 2·3/(4·3) = 0.5) + a disjoint path
    (zero triangles, coeff 0.0 incl. the degree-2 middle): the
    closed-form cases, plus duplicate/reversed/self-loop inputs
    collapsing in canonicalization."""
    from etl_capnz_spark.operators.graph import clustering_coefficients

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (5, 1), (6, 7), (7, 8),
        (2, 1), (3, 1), (4, 4),  # reversed dups + self-loop: no-ops
    ]
    df = spark.createDataFrame(edges, "u int, v int")
    got = {r["node"]: r for r in clustering_coefficients(df).collect()}
    assert got[1]["degree"] == 4 and got[1]["triangles"] == 3
    assert got[1]["clustering"] == 0.5
    for n in (2, 3, 4):
        assert got[n]["triangles"] == 3 and got[n]["clustering"] == 1.0
    for n in (5, 6, 7, 8):
        assert got[n]["triangles"] == 0 and got[n]["clustering"] == 0.0
    # total corner count = 3 x 4 triangles of K4' (1-pendant adds none)
    assert sum(r["triangles"] for r in got.values()) == 12


def test_clustering_coefficients_vs_bruteforce(spark):
    """Deterministic pseudo-random 60-node graph vs a pure-Python
    brute force over all node triples — exact triangle counts per
    node, and partition invariance."""
    import itertools

    from etl_capnz_spark.operators.graph import clustering_coefficients

    nodes = list(range(60))
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if (a * 31 + b * 17 + a * b) % 7 == 0
    ]
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want_tri = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                want_tri[n] += 1
    df = spark.createDataFrame(edges, "u int, v int")
    got = {
        r["node"]: (r["degree"], r["triangles"])
        for r in clustering_coefficients(df).collect()
    }
    want = {
        n: (len(adj[n]), want_tri[n]) for n in nodes if adj[n]
    }
    assert got == want
    rep = {
        r["node"]: (r["degree"], r["triangles"])
        for r in clustering_coefficients(df.repartition(7)).collect()
    }
    assert rep == got


def test_clustering_coefficients_plan_no_cartesian(spark):
    """The wedge build and closure are equi-joins on node keys — an
    all-pairs shape (CartesianProduct) in the plan would mean the
    orientation discipline silently broke."""
    from etl_capnz_spark.operators.graph import clustering_coefficients

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "u int, v int")
    plan = clustering_coefficients(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
