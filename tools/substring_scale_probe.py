"""Scaling probe for exact substring-span dedup (round 6): Nx blow-ups
of the documents corpus through substring_span_dedup, with HALF the
copies exact text duplicates — so duplicate-shingle groups (the global
first-occurrence window's partition sizes) GROW with the factor, which
is precisely the load path a 100 TB template-heavy corpus stresses.

Even copies salt the first token (unique text, shingle groups of 1);
odd copies repeat the base text verbatim (every shingle's group grows
by one per odd copy). Linear seconds across factors = the shape holds;
super-linear would mean the window or the reassembly join is degrading
with group size. Times are steady state (one untimed warmup each).

Usage: python tools/substring_scale_probe.py [factors ...]  # 1 4 16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.dedup import substring_span_dedup  # noqa: E402
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def blow_up(docs, n: int):
    parts = []
    for i in range(n):
        text = (
            F.col("text")
            if i % 2 == 1
            else F.concat(F.lit(f"c{i} "), F.col("text"))
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                text.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("substring-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = read_table(spark, sf_dir, "documents").repartition(32).cache()
    base.count()

    def run(docs):
        out = substring_span_dedup(docs, "text", "doc_id", k=20)
        agg = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_removed").alias("removed"),
            F.sum("n_tokens").alias("tokens"),
        ).collect()[0]
        return agg["rows"], agg["removed"], agg["tokens"]

    for n in factors:
        docs = blow_up(base, n).cache()
        n_docs = docs.count()
        run(docs)  # warmup
        t0 = time.time()
        rows, removed, tokens = run(docs)
        dt = time.time() - t0
        print(
            f"factor={n} docs={n_docs} rows={rows} tokens={tokens} "
            f"removed={removed} seconds={dt:.2f} "
            f"docs_per_sec={n_docs / dt:.0f}",
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
