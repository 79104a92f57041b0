"""Scaling probe: synthetic Nx blow-ups of the documents corpus through
the dedup/LSH/packing path — evidence that the shapes scale linearly.

Each factor unions N shifted copies of documents (distinct ids, salted
first token so copies are near- but not exact dups). Times are steady
state (one untimed warmup per factor). Usage:

    python tools/scale_probe.py [factors ...]   # default 1 4 16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    lsh_candidates,
    minhash_signatures,
)
from etl_capnz_spark.operators.sampling import pack_sequences  # noqa: E402
from etl_capnz_spark.operators.text import bpe_token_count  # noqa: E402
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def blow_up(docs, n: int):
    parts = []
    for i in range(n):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
                "source",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("scale-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = read_table(spark, sf_dir, "documents").repartition(32).cache()
    base.count()

    def run(docs):
        sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8)
        cands = lsh_candidates(sigs, "doc_id", num_hashes=8, bands=4)
        n_cand = cands.count()
        n_kept = exact_dedup(docs, "text", "doc_id").count()
        packed = pack_sequences(
            docs.select(
                "doc_id", "source",
                bpe_token_count(F.col("text")).alias("n_tokens"),
            ),
            "doc_id", "n_tokens", 2048, "source",
        )
        n_bins = packed.agg(F.countDistinct("source", "bin")).collect()[0][0]
        return n_cand, n_kept, n_bins

    for n in factors:
        docs = blow_up(base, n).cache()
        n_docs = docs.count()
        run(docs)  # warmup
        t0 = time.time()
        n_cand, n_kept, n_bins = run(docs)
        dt = time.time() - t0
        print(
            f"factor={n} docs={n_docs} lsh_candidates={n_cand} "
            f"exact_kept={n_kept} pack_bins={n_bins} "
            f"seconds={dt:.2f} docs_per_sec={n_docs / dt:.0f}",
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
