"""Parquet codec probe: the storage-layout lever that matters at 100 TB.

Lands the lineitem table once per codec (snappy / zstd / gzip / none),
then measures (a) bytes on disk and (b) wall time of a full-scan
aggregate (sum over two numeric columns + count) reading each landing.
One JSON line on stdout, same contract as bench.py.

Reading the output: zstd usually wins bytes at equal-or-better scan
speed than gzip; snappy trades ~15-30% more bytes for the fastest
decode; uncompressed is the I/O-bound strawman. On a real cluster the
bytes column is ALSO the shuffle/network column — at 100 TB the codec
choice is a cluster-sizing decision, not a nicety.

Usage::

    python tools/compression_probe.py          # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/compression_probe.py
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.session import get_session, read_table  # noqa: E402

CODECS = ["snappy", "zstd", "gzip", "none"]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_session("compression-probe")
    base = tempfile.mkdtemp(prefix="codec_probe_")
    results: dict[str, dict[str, float]] = {}
    try:
        # lineitem (numeric/date columns) unioned column-wise with the
        # documents text gives both codec regimes: delta-friendly
        # numerics and entropy-heavy prose.
        li = read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            "l_shipdate",
            "l_returnflag",
        )
        docs = read_table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("l_orderkey"),
            F.lit(0).cast("long").alias("l_partkey"),
            F.lit(0.0).alias("l_quantity"),
            F.lit(0.0).alias("l_extendedprice"),
            F.lit(None).cast("date").alias("l_shipdate"),
            F.col("text").alias("l_returnflag"),
        )
        src = li.unionByName(docs)
        n_rows = src.count()
        for codec in CODECS:
            path = os.path.join(base, codec)
            src.repartition(8).write.option(
                "compression", codec
            ).mode("overwrite").parquet(path)
            nbytes = _dir_bytes(path)
            # warm scan then timed scan (page cache holds both ways, so
            # the timed number is decode cost, the 100 TB CPU term)
            for timed in (False, True):
                t0 = time.time()
                spark.read.parquet(path).agg(
                    F.count("*"),
                    F.sum("l_quantity"),
                    F.sum("l_extendedprice"),
                    F.sum(F.length("l_returnflag")),
                ).collect()
                if timed:
                    scan_s = time.time() - t0
            results[codec] = {
                "bytes": nbytes,
                "mb": round(nbytes / 1e6, 2),
                "scan_sec": round(scan_s, 3),
                "scan_mrows_per_sec": round(n_rows / scan_s / 1e6, 2),
            }
        snappy = results["snappy"]["bytes"]
        for codec in CODECS:
            results[codec]["bytes_vs_snappy"] = round(
                results[codec]["bytes"] / snappy, 3
            )
        print(
            json.dumps(
                {
                    "metric": "parquet_codec_probe",
                    "value": results["zstd"]["scan_sec"],
                    "unit": "sec",
                    "n_rows": n_rows,
                    "codecs": results,
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
