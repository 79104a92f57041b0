"""Adversarial hot-band probe: template-heavy corpora vs the
``max_bucket`` cap in dedup.lsh_candidates (VERDICT r3 item 1).

Two corpora per factor N over sf documents:

* ``near`` — N salted near-dup copies (the scale_probe blow-up: every
  band bucket grows ×N but texts differ, so refinement shatters them);
* ``alldup`` — N EXACT copies of every doc (identical signatures: the
  worst case, where uncapped banding goes quadratic per bucket).

For each we report candidate-pair counts and wall time, uncapped vs
capped, plus the max per-bucket emission — the number the cap bounds.

    python tools/lsh_cap_probe.py [factors ...]   # default 1 4 16
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.dedup import (  # noqa: E402
    lsh_candidates,
    minhash_signatures,
)
from etl_capnz_spark.session import get_session, read_table  # noqa: E402

CAP = 64


def blow_up(docs, n: int, exact: bool):
    parts = []
    for i in range(n):
        text = (
            F.col("text") if exact
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
    spark = get_session("lsh-cap-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(32)
        .cache()
    )
    base.count()
    results = []
    for n in factors:
        for mode in ("near", "alldup"):
            docs = blow_up(base, n, exact=(mode == "alldup")).cache()
            n_docs = docs.count()
            sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8)
            row = {"factor": n, "mode": mode, "docs": n_docs, "cap": CAP}
            for label, cap in (("uncapped", None), ("capped", CAP)):
                t0 = time.time()
                n_pairs = lsh_candidates(
                    sigs, "doc_id", 8, 4, max_bucket=cap
                ).count()
                row[label + "_pairs"] = n_pairs
                row[label + "_sec"] = round(time.time() - t0, 2)
            print(json.dumps(row), flush=True)
            results.append(row)
            docs.unpersist()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lsh_cap_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
