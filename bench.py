"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``. Each query is forced
through the noop sink so every column is computed (a bare ``count()`` would
let Catalyst prune the work away).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402

HEADLINE = [
    "cap_features",
    "cap_polygon_points",
    "cap_centroid_window",
    "cap_signature",
    "cap_remarks",
    "cap_xml_roundtrip",
    "feed_links",
    "tpch_q1",
    "tpch_region_revenue",
    "tpch_topk",
    "events_session",
    "events_tumbling",
    "dedup_exact",
    "dedup_minhash",
    "text_quality",
    "knn_brute",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_session("bench")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    # Full untimed warmup pass: each query has its own generated code, so
    # warming one query leaves the others paying JIT + page-cache faults in
    # the timed pass (measured: cold first pass reads ~2x the steady state).
    # Steady-state is the number that scales — JIT amortizes to zero on a
    # real cluster run.
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    if warmup:
        for name in names:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "warmup": "full-pass" if warmup else "none",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
