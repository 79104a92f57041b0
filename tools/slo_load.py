"""Sustained multi-tenant load generator for the under-load STREAM_SLO
recording (VERDICT r6 item 8): repeatedly submits ALL bench.py headline
queries concurrently (FAIR pools, the bench.py --concurrent shape) until
the stop file appears, so tools/stream_bench.py can be measured while a
realistic 29-query batch tenant saturates the same JVM-host's cores.

Usage:
    python tools/slo_load.py /tmp/stop_flag &   # tenant A: batch load
    python tools/stream_bench.py                # tenant B: streams
    touch /tmp/stop_flag                        # drain + exit

Note this is a SEPARATE JVM from the streaming one — host-level
contention (cores, page cache), not intra-JVM scheduling, which is the
honest model for two tenants sharing a node.
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402


def main() -> None:
    stop_flag = sys.argv[1] if len(sys.argv) > 1 else "/tmp/slo_load_stop"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        "slo-load",
        extra_confs={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in bench.HEADLINE if n in qs]
    sc = spark.sparkContext

    def run_one(name: str) -> None:
        sc.setLocalProperty("spark.scheduler.pool", f"load_{name}")
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    rounds = 0
    while not os.path.exists(stop_flag):
        with ThreadPoolExecutor(max_workers=len(names)) as pool:
            futures = [pool.submit(run_one, n) for n in names]
            for f in futures:
                try:
                    f.result()
                except Exception:  # noqa: BLE001 — load gen never dies
                    pass
        rounds += 1
        print(f"load round {rounds} done", flush=True)
    spark.stop()
    print(f"load generator stopped after {rounds} rounds", flush=True)


if __name__ == "__main__":
    main()
