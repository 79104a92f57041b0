"""Recall guarantees for the dedup operators on planted duplicates.

The harness plants two kinds of duplicates (__spark_entry__._docs_with_dups):
exact copies (id + 200000) and near-dups with two extra tail tokens
(id + 100000). Exact copies MUST be caught by every method; near-dups must
be caught by the exact-Jaccard pass and (deterministically, via identical
min-signatures on ≥1 band) by MinHash-LSH.
"""

import __spark_entry__ as entrymod
import pytest

#: slow tier (pytest.ini): recall sweep over planted duplicates (~2 min)
pytestmark = pytest.mark.slow


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_catches_exact_copies(spark, sf_dir):
    cands = _pairs(entrymod._q_dedup_minhash(spark, sf_dir))
    docs = entrymod._docs_with_dups(spark, sf_dir)
    planted_exact = {
        (r["doc_id"] - 200000, r["doc_id"])
        for r in docs.filter("doc_id >= 200000").collect()
    }
    assert planted_exact, "harness must plant exact copies"
    missed = planted_exact - cands
    assert not missed, f"exact copies escaped LSH: {sorted(missed)[:5]}"


def test_jaccard_catches_near_dups(spark, sf_dir):
    pairs = _pairs(entrymod._q_dedup_jaccard(spark, sf_dir))
    docs = entrymod._docs_with_dups(spark, sf_dir)
    planted_near = {
        (r["doc_id"] - 100000, r["doc_id"])
        for r in docs.filter("doc_id >= 100000 AND doc_id < 200000").collect()
    }
    assert planted_near
    missed = planted_near - pairs
    assert not missed, f"near-dups below 0.5 Jaccard: {sorted(missed)[:5]}"


def test_exact_dedup_removes_planted_copies(spark, sf_dir):
    kept = {r["doc_id"] for r in entrymod._q_dedup_exact(spark, sf_dir).collect()}
    # every exact copy (id+200000) loses to its original (min id wins)
    assert not any(k >= 200000 for k in kept)
    # near-dups differ textually → they all survive exact dedup
    n_near = entrymod._docs_with_dups(spark, sf_dir).filter(
        "doc_id >= 100000 AND doc_id < 200000"
    ).count()
    assert sum(1 for k in kept if 100000 <= k < 200000) == n_near


def test_embedding_neardup_catches_planted_vectors(spark, sf_dir):
    pairs = _pairs(entrymod._q_dedup_embedding(spark, sf_dir))
    planted = {
        (r["vec_id"] - 10000, r["vec_id"])
        for r in entrymod._aug_embeddings(spark, sf_dir)
        .filter("vec_id >= 10000")
        .collect()
    }
    assert planted
    assert planted <= pairs


def test_connected_components_known_graph(spark):
    """Chain 1-2-3 and pair 10-11 collapse to min-label components; the
    isolated edge endpoints keep themselves as labels."""
    from etl_capnz_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 20), (20, 3)],
        ["id_a", "id_b"],
    )
    got = {
        (r["id"], r["component"])
        for r in connected_components(edges).collect()
    }
    # 7-20-3 bridges into the 1-2-3 chain -> one component labelled 1
    assert got == {
        (1, 1), (2, 1), (3, 1), (7, 1), (20, 1),
        (10, 10), (11, 10),
    }


def test_representatives_drop_all_planted_dups(spark, sf_dir):
    kept = {
        r["doc_id"]
        for r in entrymod._q_dedup_representatives(spark, sf_dir).collect()
    }
    # every exact copy (id+200000) is LSH-caught and loses to its original
    # (the original is always in the same component with a smaller id)
    assert not any(k >= 200000 for k in kept)
    # exactly the component minima survive, plus every unpaired doc
    comp = {
        (r["id"], r["component"])
        for r in entrymod._q_dedup_components(spark, sf_dir).collect()
    }
    losers = {i for i, c in comp if i != c}
    all_ids = {
        r["doc_id"]
        for r in entrymod._docs_with_dups(spark, sf_dir).collect()
    }
    assert kept == all_ids - losers


def test_decontamination_catches_planted_benchmark_copies(spark, sf_dir):
    """Every exact copy (id+200000) of a benchmark doc appears in the
    contamination report — verbatim leakage must never be missed."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.sampling import hash_pct

    docs = entrymod._docs_with_dups(spark, sf_dir)
    bench_ids = {
        r["doc_id"]
        for r in docs.filter(
            (hash_pct(F.col("doc_id"), "bench") < 10)
            & (F.col("doc_id") < 100000)
        ).collect()
    }
    flagged = {
        r["doc_id"] for r in entrymod._q_decontaminate(spark, sf_dir).collect()
    }
    planted_copies = {
        bid + 200000
        for bid in bench_ids
        if bid % 20 == 5  # ids the harness duplicates verbatim
    }
    assert planted_copies, "benchmark must contain some duplicated ids"
    missed = planted_copies - flagged
    assert not missed, f"verbatim benchmark copies escaped: {sorted(missed)[:5]}"


# --- hot-bucket cap (lsh_candidates max_bucket, VERDICT r3 item 1) --------


def test_capped_lsh_still_catches_exact_copies(spark, sf_dir):
    """With max_bucket=4, planted exact copies (identical signatures)
    must still pair with their original — either directly (cold refined
    bucket) or via the star representative, which for an identical-text
    family IS the min-id original."""
    from etl_capnz_spark.operators.dedup import (
        connected_components,
        lsh_candidates,
        minhash_signatures,
    )

    docs = entrymod._docs_with_dups(spark, sf_dir)
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8)
    cands = lsh_candidates(sigs, "doc_id", num_hashes=8, bands=4, max_bucket=4)
    comp = {
        (r["id"], r["component"])
        for r in connected_components(cands).collect()
    }
    label = dict(comp)
    planted_exact = {
        (r["doc_id"] - 200000, r["doc_id"])
        for r in docs.filter("doc_id >= 200000").collect()
    }
    assert planted_exact
    # originals and copies land in the same connected component
    missed = {
        (a, b)
        for a, b in planted_exact
        if label.get(a, a) != label.get(b, b)
    }
    assert not missed, f"exact copies escaped capped LSH: {sorted(missed)[:5]}"


def test_capped_lsh_bounds_template_cluster_emission(spark):
    """The adversarial case: 400 byte-identical docs. Uncapped banding
    emits the full clique (~79.8k pairs); the cap must emit exactly the
    399 star pairs while keeping the cluster fully connected."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
    )

    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog").alias("text"),
    )
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8)
    capped = lsh_candidates(
        sigs, "doc_id", num_hashes=8, bands=4, max_bucket=8
    ).collect()
    # star shape: every pair is (min_id=0, other)
    assert len(capped) == 399
    assert {(r["id_a"], r["id_b"]) for r in capped} == {
        (0, i) for i in range(1, 400)
    }


def test_capped_cross_lsh_pairs_new_docs_with_one_representative(spark):
    """Base corpus holds a 50-copy template cluster; 5 identical new docs
    must each pair with exactly the min base id, not all 50."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.dedup import (
        lsh_cross_candidates,
        minhash_signatures,
    )

    tmpl = "identical template body used across the whole mirror set"
    base = spark.range(50).select(
        (F.col("id") + 100).alias("doc_id"), F.lit(tmpl).alias("text")
    )
    new = spark.range(5).select(
        (F.col("id") + 9000).alias("doc_id"), F.lit(tmpl).alias("text")
    )
    sb = minhash_signatures(base, "text", "doc_id", num_hashes=8)
    sn = minhash_signatures(new, "text", "doc_id", num_hashes=8)
    got = {
        (r["new_id"], r["base_id"])
        for r in lsh_cross_candidates(
            sn, sb, "doc_id", num_hashes=8, bands=4, max_bucket=8
        ).collect()
    }
    assert got == {(9000 + i, 100) for i in range(5)}


def test_capped_lsh_default_is_exact_uncapped_pair_set(spark, sf_dir):
    """max_bucket=None (the contract default for dedup_minhash) must be
    byte-identical to the historical pair set; a generous cap that no
    bucket exceeds must also change nothing."""
    from etl_capnz_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
    )

    docs = entrymod._docs_with_dups(spark, sf_dir)
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8)
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates(sigs, "doc_id", 8, 4).collect()
    }
    huge_cap = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates(
            sigs, "doc_id", 8, 4, max_bucket=10_000_000
        ).collect()
    }
    assert huge_cap == uncapped


def test_edit1_pairs_planted_and_brute_force_parity(spark):
    """Deletion-neighborhood blocking + exact verify must equal the
    brute-force levenshtein<=1 join EXACTLY: substitution, insert,
    delete, and equal pairs found; the classic transposition
    counterexample (ab/ba share deletion variant 'b' but sit at
    distance 2) is blocked by the verify; randomized seeded strings
    confirm parity where blocking alone would over- or under-fire."""
    import itertools
    import random

    from etl_capnz_spark.operators.dedup import edit1_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    planted = {
        1: "spark", 2: "spank",   # substitution
        3: "sparks",              # insertion vs 1
        4: "spar",                # deletion vs 1
        5: "ab", 6: "ba",         # transposition: dist 2, must NOT pair
        7: "spark",               # exact dup of 1
    }
    rng = random.Random(7)
    strs = dict(planted)
    for i in range(8, 48):
        strs[i] = "".join(rng.choice("abcs") for _ in range(rng.randint(1, 5)))
    df = spark.createDataFrame(
        list(strs.items()), "id long, s string"
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit1_pairs(df, "id", "s").collect()
    }
    want = {
        (i, j, lev(strs[i], strs[j]))
        for i, j in itertools.combinations(sorted(strs), 2)
        if lev(strs[i], strs[j]) <= 1
    }
    assert got == want
    assert (1, 7, 0) in got and (1, 2, 1) in got
    assert (1, 3, 1) in got and (1, 4, 1) in got
    assert not any(a == 5 and b == 6 for a, b, _ in got)


def test_edit1_pairs_no_cartesian(spark, sf_dir):
    """The blocking join must be an equi-join on the deletion variant —
    an all-pairs shape here is exactly what the operator exists to
    avoid (the oracle's O(n^2) form must never appear in the plan)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["fuzzy_edit1"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sorted_neighborhood_matches_global_order_pairs(spark):
    """SNM pairs == brute pairs from the globally-sorted sequence
    (rank distance < w), including duplicate keys; the tiny-data case
    (10 rows over 32 range shards) forces multi-shard borrowing."""
    import random

    from etl_capnz_spark.operators.dedup import sorted_neighborhood_pairs

    rng = random.Random(31)

    def brute(rows, w):
        order = sorted((k, i) for i, k in rows)
        return {
            (order[a][1], order[b][1])
            for a in range(len(order))
            for b in range(a + 1, min(a + w, len(order)))
        }

    for n, w in ((10, 4), (200, 4), (200, 2)):
        rows = [(i, rng.randrange(0, 40)) for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, key long")
        got = {
            (r["id_a"], r["id_b"])
            for r in sorted_neighborhood_pairs(
                df, "doc_id", "key", w=w
            ).collect()
        }
        assert got == brute(rows, w), f"n={n} w={w}"
        got7 = {
            (r["id_a"], r["id_b"])
            for r in sorted_neighborhood_pairs(
                df.repartition(7), "doc_id", "key", w=w
            ).collect()
        }
        assert got7 == got


def test_capped_containment_star_and_cold_exactness(spark):
    """containment_pairs max_bucket: a 100-member hot bucket (the
    every-doc-carries-the-quote template hazard) emits exactly the 99
    star pairs against the min-id representative — real containment
    still computed per pair — while cold buckets keep the exact
    uncapped pair set."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.dedup import containment_pairs

    hot = spark.range(100).select(
        (F.col("id") + 1000).alias("doc_id"),
        F.lit("hot").alias("bkt"),
        F.lit("alpha beta gamma delta epsilon zeta").alias("text"),
    )
    cold = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.lit("cold").alias("bkt"),
        F.concat(
            F.lit("alpha beta gamma delta suffix"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    df = hot.unionByName(cold)

    capped = containment_pairs(
        df, "text", "doc_id", "bkt", min_containment=0.5, max_bucket=8
    ).collect()
    hot_pairs = {(r["id_a"], r["id_b"]) for r in capped if r["id_a"] >= 1000}
    assert hot_pairs == {(1000, i) for i in range(1001, 1100)}
    # identical texts: containment 1.0 both directions, computed for real
    assert all(
        r["cont_a_in_b"] == 1.0 and r["cont_b_in_a"] == 1.0
        for r in capped
        if r["id_a"] >= 1000
    )
    # cold bucket: capped output == exact uncapped output
    uncapped = containment_pairs(
        cold, "text", "doc_id", "bkt", min_containment=0.5
    ).collect()
    cold_capped = sorted(
        tuple(r) for r in capped if r["id_a"] < 1000
    )
    assert cold_capped == sorted(tuple(r) for r in uncapped)
    assert len(cold_capped) == 10  # C(5,2): shared 4-shingle prefix


def test_substring_span_dedup_planted_paragraph(spark):
    """Lee-et-al exact-substring semantics, position by position: a
    duplicated paragraph embedded mid-document is cut from the LATER
    document only; the first occurrence, short docs, and novel text
    survive byte-identically; a full copy empties."""
    from etl_capnz_spark.operators.dedup import substring_span_dedup

    para = " ".join(f"p{i}" for i in range(12))  # 12-token paragraph
    rows = [
        (1, f"intro one two {para} outro alpha beta"),
        (2, f"other head {para} tail gamma"),      # paragraph is a dup
        (3, "short doc under k tokens"),
        (4, f"intro one two {para} outro alpha beta"),  # full copy of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in substring_span_dedup(df, k=12).collect()
    }
    assert out[1]["clean_text"] == rows[0][1] and out[1]["n_removed"] == 0
    # doc 2: exactly the 12 duplicated paragraph tokens removed
    assert out[2]["clean_text"] == "other head tail gamma"
    assert out[2]["n_removed"] == 12
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 18

    # self-repeat within one doc: first occurrence kept, the rest cut
    rep = spark.createDataFrame(
        [(7, " ".join(["w%d" % (i % 12) for i in range(36)]))],
        "doc_id long, text string",
    )
    r = substring_span_dedup(rep, k=12).collect()[0]
    assert r["clean_text"] == " ".join("w%d" % i for i in range(12))
    assert r["n_removed"] == 24


def test_substring_span_dedup_idempotent_and_partition_invariant(spark):
    """Re-running on the cleaned corpus removes nothing (the planted
    corpus has no stitch-induced duplicates), and the result is
    partition-count invariant."""
    from pyspark.sql import functions as F

    from etl_capnz_spark.operators.dedup import substring_span_dedup

    para = " ".join(f"q{i}" for i in range(15))
    df = spark.createDataFrame(
        [
            (1, f"aa bb {para} cc dd"),
            (2, f"ee ff {para} gg hh"),
            (3, f"{para} ii jj kk ll"),
        ],
        "doc_id long, text string",
    )
    once = substring_span_dedup(df, k=15)
    first = {r["doc_id"]: r for r in once.collect()}
    assert first[1]["n_removed"] == 0
    assert first[2]["n_removed"] == 15 and first[3]["n_removed"] == 15

    again = substring_span_dedup(
        once.select("doc_id", F.col("clean_text").alias("text")), k=15
    ).collect()
    assert all(r["n_removed"] == 0 for r in again)
    assert {r["doc_id"]: r["clean_text"] for r in again} == {
        k: v["clean_text"] for k, v in first.items()
    }

    shuffled = {
        r["doc_id"]: r["clean_text"]
        for r in substring_span_dedup(df.repartition(13), k=15).collect()
    }
    assert shuffled == {k: v["clean_text"] for k, v in first.items()}


def test_dedup_eval_prf_planted_values(spark, sf_dir):
    """The panel's P/R/F1 entry recovers the planted structure: exact
    copies are always caught (they share every band), so recall is
    bounded below by the exact-copy share; precision/recall/f1 are
    consistent with the returned counts."""
    import __spark_entry__ as entrymod

    r = entrymod.queries()["dedup_eval_prf"](spark, sf_dir).collect()[0]
    assert r["n_true"] > 0 and r["n_cand"] > 0
    assert 0 < r["tp"] <= min(r["n_true"], r["n_cand"])
    assert r["precision"] == round(r["tp"] / r["n_cand"], 6)
    assert r["recall"] == round(r["tp"] / r["n_true"], 6)
    p, q = r["tp"] / r["n_cand"], r["tp"] / r["n_true"]
    assert r["f1"] == round(2 * p * q / (p + q), 6)
    # exact copies (half of %10 docs... the %20==5 family) band-match
    # with probability 1 — recall can't fall below their share
    # n_true = |%10==0| + |%20==5| and every %20==5 pair is caught
    assert r["recall"] >= 0.3
