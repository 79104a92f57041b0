"""Recall guarantees for the dedup operators on planted duplicates.

The harness plants two kinds of duplicates (__spark_entry__._docs_with_dups):
exact copies (id + 200000) and near-dups with two extra tail tokens
(id + 100000). Exact copies MUST be caught by every method; near-dups must
be caught by the exact-Jaccard pass and (deterministically, via identical
min-signatures on ≥1 band) by MinHash-LSH.
"""

import __spark_entry__ as entrymod


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
