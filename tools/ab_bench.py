"""Single-query A/B timing harness (guide §1: measure first).

Times the named queries exactly like bench.py (noop sink, per-query DF
rebuilt per pass) but without calibration/envelopes: 2 untimed warmup
passes then N timed passes, reporting min/median per query.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_bench.py q1 [q2 ...]
       (AB_PASSES=2 timed passes by default; AB_WARMUPS=2)
"""
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as mod  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warmups = int(os.environ.get("AB_WARMUPS", "2"))
    passes = int(os.environ.get("AB_PASSES", "2"))
    spark = get_session("ab-bench")
    qs = mod.queries()
    times: dict[str, list[float]] = {n: [] for n in names}
    for p in range(warmups + passes):
        for name in names:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = round(time.time() - t0, 3)
            if p >= warmups:
                times[name].append(sec)
            gc.collect()
    out = {
        n: {"min": min(v), "med": round(statistics.median(v), 3), "all": v}
        for n, v in times.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
