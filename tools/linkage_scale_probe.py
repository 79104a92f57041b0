"""Scale probe for JW record linkage (tools/ convention: measured
curves -> CAPACITY.md). Runs jw_pairs + the full entity_golden chain
at three SFs and records rows/candidates/seconds so the 100 TB
extrapolation in CAPACITY §14 cites measured numbers.

Usage: python tools/linkage_scale_probe.py  (writes
linkage_scale_probe.json at the repo root)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.dedup import connected_components  # noqa: E402
from etl_capnz_spark.operators.linkage import jw_pairs  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402


def main() -> None:
    spark = get_session("linkage-probe")
    out = {}
    for sf in ("0.001", "0.01", "0.1"):
        docs = spark.read.parquet(
            f"/root/testdata/sf{sf}/documents.parquet"
        ).select(
            "doc_id", F.substring("text", 1, 12).alias("title"), "source"
        )
        n_docs = docs.count()
        # untimed warmup, then timed pair generation + verify
        jw_pairs(docs, "doc_id", "title", threshold=0.9).count()
        t0 = time.time()
        pairs = jw_pairs(docs, "doc_id", "title", threshold=0.9)
        pairs = pairs.localCheckpoint()
        n_pairs = pairs.count()
        t_pairs = round(time.time() - t0, 2)
        t0 = time.time()
        n_comp = connected_components(
            pairs.select("id_a", "id_b"), "id_a", "id_b"
        ).count()
        t_comp = round(time.time() - t0, 2)
        out[f"sf{sf}"] = {
            "n_docs": n_docs,
            "n_pairs": n_pairs,
            "jw_sec": t_pairs,
            "components_sec": t_comp,
            "n_linked_nodes": n_comp,
        }
        print(f"sf{sf}: {out[f'sf{sf}']}")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "linkage_scale_probe.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
