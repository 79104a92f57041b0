"""ANN recall/latency frontier (VERDICT r3 item 6): sweep SRP-LSH
(n_bits × bands), IVF (n_probe) and IVF-PQ configs against the exact
brute-force top-5 ground truth on Nx blow-ups of the embeddings corpus,
and record recall@5 vs wall seconds — so the 100 TB ANN story cites a
measured recall-vs-cost frontier, not just per-config recall pins.

Corpus blow-up matches tools/ann_scale_probe.py (N perturbed copies —
the LSH-adversarial near-dup case). Queries stay fixed (the base
corpus's %50 rows). Output: one JSON line per (factor, config) and
ann_recall_curve.json at the repo root (consumed by CAPACITY.md).

    python tools/ann_recall_probe.py [factors ...]   # default 4 16
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.similarity import (  # noqa: E402
    assign_cells,
    cosine_topk_brute,
    ivf_topk,
    ivfpq_topk,
    kmeans_fit,
    srp_topk,
)
from etl_capnz_spark.session import get_session, read_table  # noqa: E402

K = 5


def blow_up(emb, n: int):
    parts = []
    for i in range(n):
        if i == 0:
            parts.append(emb.select("vec_id", "embedding", "label"))
            continue
        bump = F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, j: x
            + F.when(j == i % 64, F.lit(0.001 * i)).otherwise(F.lit(0.0)),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                bump.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pair_set(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def recall(approx: set, truth: set) -> float:
    return round(len(approx & truth) / len(truth), 4) if truth else 1.0


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [4, 16]
    spark = get_session("ann-recall-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = read_table(spark, sf_dir, "embeddings").repartition(32).cache()
    base.count()
    queries = base.filter(F.col("vec_id") % 50 == 0).select(
        "vec_id", "embedding"
    )

    results = []
    for n in factors:
        corpus = blow_up(base, n).repartition(32).cache()
        n_corpus = corpus.count()

        t0 = time.time()
        truth = pair_set(
            cosine_topk_brute(corpus, queries, "vec_id", "embedding", k=K)
        )
        brute_sec = round(time.time() - t0, 2)
        results.append(
            {
                "factor": n,
                "corpus": n_corpus,
                "method": "brute",
                "config": "exact",
                "recall_at_5": 1.0,
                "sec": brute_sec,
            }
        )
        print(json.dumps(results[-1]), flush=True)

        configs = [
            (
                "srp",
                f"bits={nb},bands={b}",
                lambda nb=nb, b=b: srp_topk(
                    corpus, queries, "vec_id", "embedding",
                    k=K, n_bits=nb, bands=b, dim=64,
                ),
            )
            # n_bits ≤ 48: the signature packs into ONE long, and
            # 1 << 63 would overflow it
            for nb, b in [(16, 8), (16, 4), (32, 8), (32, 4), (48, 8)]
        ]
        # IVF over GEOMETRIC cells (k-means, not the dataset's class
        # label): training+assignment is the offline index build, so it
        # stays outside the timed query — like the bucketed-at-rest
        # layout the 100 TB path assumes
        cents = kmeans_fit(corpus, "vec_id", "embedding", k=16, iters=2)
        ivf_corpus = (
            corpus.join(
                assign_cells(corpus, cents, "vec_id", "embedding"), "vec_id"
            )
            .repartition(32)
            .cache()
        )
        ivf_corpus.count()
        configs += [
            (
                "ivf",
                f"cells=16,n_probe={p}",
                lambda p=p: ivf_topk(
                    ivf_corpus, queries, "vec_id", "embedding", "cell",
                    k=K, n_probe=p,
                ),
            )
            for p in (1, 2, 4)
        ] + [
            (
                "ivfpq",
                f"cells={c},probe={p},shortlist={s}",
                lambda c=c, p=p, s=s: ivfpq_topk(
                    corpus, queries, "vec_id", "embedding",
                    k=K, shortlist=s, ivf_cells=c, n_probe=p, dim=64,
                ),
            )
            for c, p, s in [(8, 1, 50), (8, 2, 50), (8, 2, 200)]
        ]
        for method, cfg, fn in configs:
            fn().write.format("noop").mode("overwrite").save()  # warmup
            t0 = time.time()
            approx = pair_set(fn())
            sec = round(time.time() - t0, 2)
            results.append(
                {
                    "factor": n,
                    "corpus": n_corpus,
                    "method": method,
                    "config": cfg,
                    "recall_at_5": recall(approx, truth),
                    "sec": sec,
                    "speedup_vs_brute": round(brute_sec / sec, 2)
                    if sec
                    else None,
                }
            )
            print(json.dumps(results[-1]), flush=True)
        ivf_corpus.unpersist()
        corpus.unpersist()

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ann_recall_curve.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
