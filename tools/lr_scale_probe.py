"""Scaling probe for distributed LR training (round 6): Nx corpus
blow-ups through text_lr_train's full 10-iteration gradient loop. Each
iteration is one two-phase aggregate over (feature, residual) pairs
with a 33-element weight vector as the only driver state, so seconds
should grow sub-linearly in corpus size (fixed per-iteration overheads
— 10 job launches, driver weight updates — dominate at small N and
amortize at large N). Super-linear growth would mean per-iteration
state is leaking into the data path.

Usage: python tools/lr_scale_probe.py [factors ...]   # default 1 4 16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.text import lr_train_hashed  # noqa: E402
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def blow_up(docs, n: int):
    parts = []
    for i in range(n):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
                "lang",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("lr-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = read_table(spark, sf_dir, "documents").repartition(32).cache()
    base.count()

    def run(docs):
        out = lr_train_hashed(
            docs.select("text", (F.col("lang") == "en").alias("y")),
            "text", "y", n_features=32, iters=10,
        )
        return out.count()

    for n in factors:
        docs = blow_up(base, n).cache()
        n_docs = docs.count()
        run(docs)  # warmup
        t0 = time.time()
        rows = run(docs)
        dt = time.time() - t0
        print(
            f"factor={n} docs={n_docs} weight_rows={rows} "
            f"seconds={dt:.2f} docs_per_sec={n_docs / dt:.0f}",
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
