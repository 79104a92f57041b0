"""Measure the versioned sketch-sink commit cost against group
cardinality G (round-8 continuation): each epoch rewrites the FULL
G x k state snapshot into _v_<n+1>, so per-epoch cost should be
LINEAR in G and FLAT in epoch number (no history accumulates in the
write path - the pointer trims epochs to 64 and old versions prune).
The artifact quantifies where per-batch full-snapshot rewrite stops
being viable and the partition-scoped / epoch-delta shapes (CAPACITY
section 23) take over.

    python tools/versioned_state_probe.py  # writes versioned_state_probe.json
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.audit import kmv_merge, kmv_sketch  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402
from etl_capnz_spark.streaming.stream import (  # noqa: E402
    _versioned_state_commit,
    _versioned_state_read,
    read_sketch_state,
)


def main() -> None:
    spark = get_session("vstate-probe", master="local[8]", shuffle_partitions=8)
    base = tempfile.mkdtemp(prefix="vstate_probe_")
    out = {"k": 16, "rows_per_group_per_epoch": 20, "epochs": 4, "groups": {}}
    try:
        for g in (1_000, 10_000, 100_000):
            state = os.path.join(base, f"state_{g}")
            times = []
            for epoch in range(4):
                batch = spark.range(g * 20).select(
                    (F.col("id") % g).cast("string").alias("grp"),
                    # epoch-shifted values so every epoch really merges
                    (F.col("id") * 4 + epoch).alias("v"),
                )
                cur = kmv_sketch(batch, ["grp"], "v", k=16)
                prev, pointer = _versioned_state_read(spark, state)
                if prev is not None:
                    prev = prev.select(
                        "grp", "sketch", "n_seen", "est_distinct"
                    )
                both = cur if prev is None else prev.unionByName(cur)
                merged = kmv_merge(both, ["grp"], k=16)
                t0 = time.time()
                _versioned_state_commit(
                    merged, state, pointer, f"probe:{epoch}"
                )
                times.append(round(time.time() - t0, 3))
            n_state = read_sketch_state(spark, state).count()
            out["groups"][str(g)] = {
                "commit_sec_per_epoch": times,
                "state_rows": n_state,
            }
            print(f"G={g}: {times} state_rows={n_state}", flush=True)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "versioned_state_probe.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
