"""Jaro-Winkler record linkage (operators/linkage.py).

The load-bearing pin is the kernel-vs-DuckDB bit-identity fuzz: the
oracle entry (`fuzzy_jw`) compares raw doubles, so the Python kernel
must reproduce DuckDB's jaro_winkler_similarity EXACTLY — including
the three semantics the textbook definition leaves open (floored
transpositions, empty→0.0, 0.7 boost gate), each of which was observed
diverging before the probe (1404/20006 mismatches with float t/2).
"""
import random

import pytest


def test_jw_textbook_cases():
    from etl_capnz_spark.operators.linkage import jaro_winkler_py

    assert abs(jaro_winkler_py("martha", "marhta") - 0.9611111111111111) < 1e-15
    assert abs(jaro_winkler_py("DWAYNE", "DUANE") - 0.84) < 1e-15
    assert jaro_winkler_py("", "") == 0.0  # DuckDB semantics, not 1.0
    assert jaro_winkler_py("a", "") == 0.0
    assert jaro_winkler_py("abc", "abc") == 1.0
    # below the 0.7 boost gate the prefix bonus must NOT apply:
    # 'ab'/'ba' has jaro 0 matches in window -> 0.0 stays 0.0
    assert jaro_winkler_py("ab", "ba") == 0.0


def test_jw_kernel_bit_identical_to_duckdb_fuzz():
    """20k random pairs over three alphabets (incl. 70-char strings
    past the 64-bit word boundary of bit-parallel implementations):
    every double equal EXACTLY (==, no tolerance)."""
    import duckdb

    from etl_capnz_spark.operators.linkage import jaro_winkler_py

    con = duckdb.connect()
    rng = random.Random(7)
    cases = [("martha", "marhta"), ("DIXON", "DICKSONX"), ("", "")]
    for alpha, maxlen, n in [
        ("abcd", 12, 700), ("abcdefghijklmnop", 24, 700), ("ab", 70, 300)
    ]:
        for _ in range(n):
            cases.append((
                "".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen))),
                "".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen))),
            ))
    for s1, s2 in cases:
        d = con.execute(
            "select jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert jaro_winkler_py(s1, s2) == d, (s1, s2)


def test_jw_batch_np_bit_identical_to_pure_python_fuzz():
    """The numpy batch kernel (the Arrow seam behind jw_pairs since r5)
    must equal the pure-Python spec EXACTLY (==, no tolerance) on the
    same fuzz families — transitively bit-identical to DuckDB via the
    test above. Includes the unicode plane (utf-32 decode path), empty
    strings, and the all-empty batch."""
    from etl_capnz_spark.operators.linkage import (
        jaro_winkler_py,
        jw_batch_np,
    )

    rng = random.Random(11)
    cases = [("martha", "marhta"), ("DIXON", "DICKSONX"), ("", ""),
             ("a", ""), ("ab", "ba"), ("abc", "abc"),
             ("māori tūī", "maori tui"), ("日本語テスト", "日本語てスト")]
    for alpha, maxlen, n in [
        ("abcd", 12, 700), ("abcdefghijklmnop", 24, 700), ("ab", 70, 300)
    ]:
        for _ in range(n):
            cases.append((
                "".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen))),
                "".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen))),
            ))
    got = jw_batch_np([c[0] for c in cases], [c[1] for c in cases])
    for k, (s1, s2) in enumerate(cases):
        assert got[k] == jaro_winkler_py(s1, s2), (s1, s2)
    assert list(jw_batch_np([], [])) == []
    assert list(jw_batch_np(["", ""], ["", "x"])) == [0.0, 0.0]


def test_length_band_is_lossless():
    """The 5θ−4 length-ratio blocking bound must be PROVABLY lossless:
    no pair outside the band may reach the threshold. Brute-force over
    random pairs at θ=0.9: every jw ≥ 0.9 pair satisfies
    min_len/max_len ≥ 0.5."""
    from etl_capnz_spark.operators.linkage import (
        _min_len_ratio,
        jaro_winkler_py,
    )

    assert _min_len_ratio(0.9) == 0.5
    rng = random.Random(3)
    for _ in range(4000):
        s1 = "".join(rng.choice("ab") for _ in range(rng.randint(1, 16)))
        s2 = "".join(rng.choice("ab") for _ in range(rng.randint(1, 16)))
        if jaro_winkler_py(s1, s2) >= 0.9:
            lo, hi = sorted((len(s1), len(s2)))
            assert lo >= hi * 0.5, (s1, s2)


def test_jw_pairs_planted_and_no_cartesian(spark):
    """Planted near-identical names within one block must surface with
    the right sims; a name in a different block must NOT pair even if
    similar (the declared blocking contract); and the plan must contain
    no CartesianProduct / BroadcastNestedLoopJoin."""
    from etl_capnz_spark.operators.linkage import jaro_winkler_py, jw_pairs

    rows = [
        (1, "jonathan smith"),
        (2, "jonathan smyth"),   # same block 'jo', high sim
        (3, "jonathon smith"),   # same block, high sim
        (4, "donathan smith"),   # block 'do' — out of contract
        (5, "zz totally other"),
        (6, "jo"),               # same block, very low sim
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = jw_pairs(df, "id", "name", threshold=0.9)
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in out.collect()}
    assert (1, 2) in got and (1, 3) in got
    assert all(4 not in pair for pair in got)
    assert all(6 not in pair for pair in got)
    assert got[(1, 2)] == jaro_winkler_py("jonathan smith", "jonathan smyth")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_golden_records_survivorship_hand_case(spark):
    """Field-level majority vote with deterministic ties: cluster 1 has
    names [ann, ann, anne] -> ann; sources [a, b, b] -> b; cluster 2
    ties 1-1 between NULL and 'x' -> 'x' must win (NULLS LAST pinned —
    Spark's default asc ordering would pick NULL first). The golden
    record may mix fields from different members (name from one row,
    source from another)."""
    from etl_capnz_spark.operators.linkage import golden_records

    rows = [
        (1, 1, "ann", "a"),
        (2, 1, "ann", "b"),
        (3, 1, "anne", "b"),
        (4, 2, None, "z"),
        (5, 2, "x", "z"),
    ]
    df = spark.createDataFrame(
        rows, "id long, cluster long, name string, source string"
    )
    got = {r["cluster"]: r
           for r in golden_records(df, "cluster", ["name", "source"]).collect()}
    assert got[1]["n_members"] == 3
    assert got[1]["name"] == "ann" and got[1]["source"] == "b"
    assert got[2]["name"] == "x" and got[2]["source"] == "z"


def test_phonetic_code_textbook_cases(spark):
    """Classic Soundex pins, including every rule naive ports miss:
    H/W transparency (Ashcraft→A261 not A226, Pfister→P236 through
    the PF collapse, Tymczak's vowel-broken run), padding (Lee→L000),
    non-letters stripped, empty → NULL."""
    from pyspark.sql import functions as F2

    from etl_capnz_spark.operators.linkage import phonetic_code

    cases = [
        ("Robert", "R163"), ("Rupert", "R163"),
        ("Ashcraft", "A261"), ("Ashcroft", "A261"),
        ("Tymczak", "T522"), ("Pfister", "P236"),
        ("Honeyman", "H555"), ("Catherine", "C365"),
        ("Katharine", "K365"), ("Jackson", "J250"),
        ("Washington", "W252"), ("Lee", "L000"),
        ("Gutierrez", "G362"), ("O'Brien-2nd", "O165"),
        ("", None), ("123", None), ("Wu", "W000"), ("Hwang", "H520"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "name string")
    got = [
        r[0] for r in df.select(phonetic_code(F2.col("name"))).collect()
    ]
    assert got == [c[1] for c in cases]


def test_phonetic_pairs_blocks_soundalikes_prefix_blocking_misses(spark):
    """Catherine/Katharine share NO spelling prefix (different first
    letters -> different phonetic codes too: C365 vs K365 — honest
    blocking). But Jon/John-style same-initial sound-alikes must pair
    under phonetic blocking even when the 2-char prefix differs
    (Jon/John diverge at char 2), and the plan stays
    CartesianProduct-free."""
    from etl_capnz_spark.operators.linkage import (
        jaro_winkler_py,
        phonetic_pairs,
    )

    rows = [
        (1, "Jonathan Smith"),
        (2, "Johnathan Smith"),   # J535 both; 2-char prefixes Jo/Jo
        (3, "Jnathan Smith"),     # dropped vowel, still J535
        (4, "Maxwell Turner"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = phonetic_pairs(df, "id", "name", threshold=0.85)
    got = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert (1, 2) in got and got[(1, 2)]["code"] == "J535"
    assert got[(1, 2)]["sim"] == jaro_winkler_py(
        "Jonathan Smith", "Johnathan Smith"
    )
    assert all(4 not in k for k in got)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_max_block_caps_hot_blocks_refine_then_drop(spark):
    """Hot-block cap (jw_pairs/phonetic_pairs max_block): a hot prefix
    block refines by exact length — same-length variants stay
    candidates, sub-blocks still over the cap drop entirely — while
    cold blocks keep the exact uncapped pair set."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.linkage import jw_pairs, phonetic_pairs

    # hot block "zq": 60 same-length names (refined sub-block still hot
    # at cap 16 -> dropped) + 24 names over 8 distinct lengths (each
    # refined sub-block of 3 survives); cold block "ka": 3 names.
    rows = [(i, "zqaaaax%02d" % i) for i in range(60)]
    rows += [
        (100 + 8 * l + j, "zqb" + "m" * l + "x%d" % j)
        for l in range(8)
        for j in range(3)
    ]
    rows += [(900, "karen"), (901, "karin"), (902, "karyn")]
    df = spark.createDataFrame(rows, "id long, name string")

    capped = jw_pairs(
        df, "id", "name", threshold=0.85, max_block=16
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in capped}
    # the 60-name same-length sub-block dropped: no pair touches ids 0-59
    assert not any(a < 60 or b < 60 for a, b in ids)
    # survivors from the refined sub-blocks pair within their length
    assert (100, 101) in ids
    # cold block exact: equals the uncapped run restricted to it
    cold = {
        (a, b) for a, b in ids if a >= 900
    }
    uncapped_cold = {
        (r["id_a"], r["id_b"])
        for r in jw_pairs(df, "id", "name", threshold=0.85).collect()
        if r["id_a"] >= 900
    }
    assert cold == uncapped_cold and len(cold) == 3

    # phonetic flavor: same-soundex hot block drops when same-length
    hot = [(i, "smith%02d" % i) for i in range(40)]  # same code+len
    hot += [(500, "karen"), (501, "karyn")]
    pdf = spark.createDataFrame(hot, "id long, name string")
    got = phonetic_pairs(
        pdf, "id", "name", threshold=0.8, max_block=8
    ).collect()
    gids = {(r["id_a"], r["id_b"]) for r in got}
    assert gids == {(500, 501)}


def test_golden_records_mixed_types_per_type_melt(spark):
    """Survivorship with MIXED attribute types melts one stack per
    TYPE group (never casting across types — a common cast would
    reorder tie-breaks: '10' < '9' as strings): majority per attribute,
    count desc, value asc, NULLS LAST, verified against a pure-Python
    vote on a NULL-heavy corpus."""
    import collections
    import random

    from etl_capnz_spark.operators.linkage import golden_records

    rng = random.Random(5)
    rows = [
        (
            i % 7,
            rng.choice(["A", "B", "C", None]),
            rng.choice([1, 2, 3, 10, 9]),
            rng.choice(["s1", "s2", None]),
        )
        for i in range(300)
    ]
    lab = spark.createDataFrame(
        rows, "cluster long, title string, score long, source string"
    )
    got = sorted(
        tuple(r)
        for r in golden_records(
            lab, "cluster", ["title", "score", "source"]
        ).collect()
    )
    ref = []
    for c in sorted(set(r[0] for r in rows)):
        mem = [r for r in rows if r[0] == c]
        rec = [c, len(mem)]
        for idx in (1, 2, 3):
            cnt = collections.Counter(r[idx] for r in mem)
            best = sorted(
                cnt.items(),
                key=lambda kv: (
                    -kv[1],
                    kv[0] is None,
                    kv[0] if kv[0] is not None else 0,
                ),
            )[0][0]
            rec.append(best)
        ref.append(tuple(rec))
    assert got == sorted(ref)

    # the 10-vs-9 integer ordering that a string cast would invert:
    # ties on count broken by NATIVE-type ascending value
    tie = spark.createDataFrame(
        [(1, 10), (1, 9)], "cluster long, score long"
    )
    r = golden_records(tie, "cluster", ["score"]).collect()[0]
    assert r["score"] == 9


# --------------------------------------------------- sorted neighborhood
def test_sorted_neighborhood_matches_bruteforce(spark):
    """SNM candidates are EXACTLY the pairs within `window` positions
    of the (key, id) sort order; survivors exactly those with JW ≥ θ
    (pure-Python reference) — and the pairing is partition-invariant."""
    from etl_capnz_spark.operators.linkage import (
        jaro_winkler_py,
        sorted_neighborhood_pairs,
    )

    names = [
        "catherine", "katharine", "jonathan", "jonathon", "jon",
        "maria", "mariah", "marie", "zachary", "zack",
        "alexander", "alexandra", "liz", "lisa", "lizzy",
    ]
    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "id int, name string")
    w, theta = 3, 0.85
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = set()
    for i in range(len(order)):
        for j in range(i + 1, min(i + 1 + w, len(order))):
            a, b = order[i], order[j]
            if jaro_winkler_py(a[1], b[1]) >= theta:
                want.add((a[0], b[0]))
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, "id", "name", window=w, threshold=theta
        ).collect()
    }
    assert got == want and want  # non-vacuous
    rep = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df.repartition(7), "id", "name", window=w, threshold=theta
        ).collect()
    }
    assert rep == got


def test_sorted_neighborhood_candidate_bound_and_plan(spark):
    """The defining SNM property: candidate volume ≤ n·window even
    when EVERY key is identical (the hot-block case that forces
    _cap_blocks in the other blockers) — and no CartesianProduct."""
    from etl_capnz_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    n, w = 200, 4
    df = spark.createDataFrame(
        [(i, "same") for i in range(n)], "id int, name string"
    )
    out = sorted_neighborhood_pairs(
        df, "id", "name", window=w, threshold=0.0
    )
    rows = out.collect()
    assert len(rows) == n * w - w * (w + 1) // 2  # exact band count
    assert all(
        0 < r["rank_b"] - r["rank_a"] <= w for r in rows
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_snm_twins_agree_on_neighborhoods(spark):
    """The differential pin behind the docstring claim: the two SNM
    implementations — dedup.sorted_neighborhood_pairs (borrow-plan
    sharding, candidate-only) and linkage.sorted_neighborhood_pairs
    (rank-bucket band join; θ=0 keeps every candidate) — produce the
    IDENTICAL pair set on the same numeric key and window."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.dedup import (
        sorted_neighborhood_pairs as snm_dedup,
    )
    from etl_capnz_spark.operators.linkage import (
        sorted_neighborhood_pairs as snm_linkage,
    )

    rows = [
        (i, f"doc{i:03d}", (i * 37) % 101 + (i % 3))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id int, s string, k int")
    w = 4
    want = {
        (r["id_a"], r["id_b"])
        for r in snm_dedup(df, "id", "k", w=w + 1).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in snm_linkage(
            df, "id", "s", window=w, threshold=0.0, key=F.col("k")
        ).collect()
    }
    assert got == want and len(want) > 300
