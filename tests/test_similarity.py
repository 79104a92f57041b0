"""ANN quality: IVF pruning vs exact brute force (recall@5), and k-means
cell sanity. Everything is deterministic (seeded/derived), so recall is a
fixed number — the assertions pin a floor under the measured value."""

import __spark_entry__ as entrymod


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_brute(spark, sf_dir):
    brute = _topk_sets(entrymod._q_knn_brute(spark, sf_dir))
    ivf = _topk_sets(entrymod._q_knn_ivf(spark, sf_dir))
    assert set(brute) == set(ivf)
    hits = sum(len(brute[q] & ivf[q]) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    recall = hits / total
    # label-based cells on random embeddings are a weak quantizer; the
    # probe structure must still recover a meaningful fraction of true
    # neighbours and always return full result sets
    assert all(len(v) == 5 for v in ivf.values())
    assert recall >= 0.2, f"recall@5 collapsed: {recall:.2f}"


def test_kmeans_cells_cover_corpus(spark, sf_dir):
    rows = entrymod._q_knn_kmeans_cells(spark, sf_dir).collect()
    assert sum(r["n_vectors"] for r in rows) == 500
    # maximin seeding spreads the seeds: every cell populated, none
    # swallowing the corpus (lowest-k-ids init clumped neighbours)
    assert len(rows) == 8
    assert max(r["n_vectors"] for r in rows) <= 250


def test_srp_recall_vs_brute(spark, sf_dir):
    brute = _topk_sets(entrymod._q_knn_brute(spark, sf_dir))
    srp = _topk_sets(entrymod._q_knn_srp(spark, sf_dir))
    hits = sum(len(brute[q] & srp.get(q, set())) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    recall = hits / total
    # 32-bit / 8-band SRP on weak-neighbour random embeddings: measured
    # 0.72 at sf0.001 — pin a floor well under it
    assert recall >= 0.6, f"SRP recall@5 collapsed: {recall:.2f}"


def test_srp_signature_stable_and_16bit(spark, sf_dir):
    rows = entrymod._q_emb_srp_signature(spark, sf_dir).collect()
    assert all(0 <= r["srp_sig"] < (1 << 16) for r in rows)
    again = {r["vec_id"]: r["srp_sig"]
             for r in entrymod._q_emb_srp_signature(spark, sf_dir).collect()}
    assert all(again[r["vec_id"]] == r["srp_sig"] for r in rows)


def test_ivf_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """Persisted IVF index: probes must read ONLY the probed cell
    directories (PartitionFilters), and every query gets k results."""
    from etl_capnz_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_index,
        kmeans_fit,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, cents, path)

    qs = emb.filter("vec_id % 100 = 0")
    # long pytest tmp paths otherwise truncate the scan's metadata string
    # before the PartitionFilters entry
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try:
        out = ivf_probe_index(spark, path, qs, k=5, n_probe=2)
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    scan_line = next(
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "/vectors" in ln
    )
    assert "cell" in scan_line.split("PartitionFilters")[1][:80]
    assert " IN " in scan_line.split("PartitionFilters")[1][:80]
    per_query = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    n_queries = qs.count()
    assert len(per_query) == n_queries
    assert all(len(v) == 5 for v in per_query.values())
