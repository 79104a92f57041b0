"""ANN scaling probe: synthetic Nx blow-ups of the embeddings corpus
through the SRP-LSH top-k path — evidence the candidate generation stays
near-linear in corpus size (band equi-join, never all-pairs).

Each factor unions N perturbed copies of the embeddings table (distinct
ids; copy i adds a tiny deterministic offset to component i%dim, so copies
are near- but not exact duplicates — the LSH-adversarial case, every
vector having N near-copies that collide in most bands). Queries stay
fixed (the base corpus's %50 rows), so per-query work isolates corpus
growth. Times are steady state (one untimed warmup per factor).

Usage::

    python tools/ann_scale_probe.py [factors ...]   # default 1 2 4
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.similarity import srp_topk  # noqa: E402
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def blow_up(emb, n: int):
    parts = []
    for i in range(n):
        if i == 0:
            parts.append(emb.select("vec_id", "embedding"))
            continue
        bump = F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, j: x + F.when(j == i % 64, F.lit(0.001 * i)).otherwise(
                F.lit(0.0)
            ),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                bump.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    spark = get_session("ann-scale-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = read_table(spark, sf_dir, "embeddings").repartition(32).cache()
    n_base = base.count()
    queries = base.filter(F.col("vec_id") % 50 == 0)

    for n in factors:
        corpus = blow_up(base, n)
        n_corpus = n_base * n

        def run():
            out = srp_topk(
                corpus, queries, "vec_id", "embedding", k=5, dim=64
            )
            return out.count()

        run()  # warmup (JIT + page cache)
        t0 = time.time()
        n_out = run()
        secs = time.time() - t0
        print(
            f"RESULT factor={n} corpus={n_corpus} out_rows={n_out} "
            f"sec={secs:.1f} vecs_per_sec={n_corpus / secs:.0f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
