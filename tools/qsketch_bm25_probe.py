"""Scaling probe for the continuation-session additions: mergeable
quantile sketch (events, distinct ids so row count grows with the
factor) and BM25 retrieval (documents, shifted ids — the posting lists
and corpus stats grow with the factor while the query set stays
fixed, the production shape).

Steady-state times (one untimed warmup per factor); one JSON line per
factor. Usage:

    python tools/qsketch_bm25_probe.py [factors ...]   # default 1 4 16
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.audit import quantile_sketch  # noqa: E402
from etl_capnz_spark.operators.text import bm25_search  # noqa: E402
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def blow_up(df, id_col, n: int, shift: int):
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * shift))
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn):
    fn()  # warmup
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session(
        "qsketch-bm25-probe", master="local[32]", shuffle_partitions=32
    )
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev0 = read_table(spark, sf, "events")
    docs0 = read_table(spark, sf, "documents")
    queries = spark.createDataFrame(
        [(1, "fast hash join"), (2, "window agg stream"),
         (3, "slow scan filter")],
        "query_id int, query string",
    )
    for n in factors:
        ev = blow_up(ev0, "event_id", n, 100_000_000)
        docs = blow_up(docs0, "doc_id", n, 100_000_000)

        def run_qs():
            quantile_sketch(
                ev, ["event_type"], "value", "event_id", k=128
            ).write.format("noop").mode("overwrite").save()

        def run_bm25():
            bm25_search(
                docs, "text", "doc_id", queries, top_k=10
            ).write.format("noop").mode("overwrite").save()

        print(json.dumps({
            "factor": n,
            "events": ev.count(),
            "docs": docs.count(),
            "quantile_sketch_s": timed(run_qs),
            "bm25_s": timed(run_bm25),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
