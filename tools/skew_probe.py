"""Skew-stress probe suite (VERDICT r5 item 4): planted power-law /
hot-key inputs through every join-shaped operator family, recording
rows-EMITTED and wall-time curves — the 100× evidence that no operator
goes super-linear in emitted rows once its cap is engaged.

Probes (each at growing factors):

* ``walks``   — star graph (one hub of degree H, symmetric): the fixed
  random_walks joins state→degree (fan-out 1) then equi-joins the
  ranked adjacency on (node, idx), so per-step emission == alive
  walkers. The probe measures the fixed plan's wall time and emission,
  computes the OLD single-key-join plan's emission analytically
  (Σ deg(node) over walkers — deg(hub)=H explodes it), and actually
  RUNS the old shape at the small factors to show the measured
  blow-up.
* ``containment`` — power-law bucket sizes (N, N/2, N/4, … ≥ 8) of
  byte-identical texts through containment_pairs: uncapped emission is
  Σ C(size, 2) (quadratic in the hot bucket), max_bucket=64 bounds it
  to star pairs per hot bucket.
* ``phonetic`` — hot Soundex blocks through phonetic_pairs: a
  same-length hot block is the worst case (the length band prunes
  nothing); max_block=64 length-refines then drops still-hot
  sub-blocks. A mixed-length mode shows refinement keeping the
  informative sub-blocks. Candidate-pair counts are computed from the
  block-size distribution (exact), wall time measured end-to-end.

Dedup band joins under template skew are covered by the sibling
``tools/lsh_cap_probe.py`` (recorded in lsh_cap_probe.json).

    python tools/skew_probe.py [probe ...]   # default: all
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.session import get_session  # noqa: E402

CAP = 64


def probe_walks(spark) -> list:
    from pyspark.sql.window import Window

    from etl_capnz_spark.operators.graph import random_walks

    results = []
    for hub_deg in (1000, 4000, 16000):
        leaves = spark.range(1, hub_deg + 1).select(
            F.col("id").alias("leaf")
        )
        edges = (
            leaves.select(F.lit(0).alias("src"), F.col("leaf").alias("dst"))
            .unionByName(
                leaves.select(
                    F.col("leaf").alias("src"), F.lit(0).alias("dst")
                )
            )
            .cache()
        )
        edges.count()
        t0 = time.time()
        out = random_walks(edges, walk_len=3).cache()
        rows_out = out.count()
        fixed_sec = round(time.time() - t0, 2)
        # per-step emission: fixed plan emits 1 row per alive walker;
        # the old single-key join would emit Σ deg(node) over walkers
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        per_step = (
            out.filter(F.col("step") < 3)
            .join(deg, out["node"] == deg["src"])
            .groupBy("step")
            .agg(
                F.count(F.lit(1)).alias("walkers"),
                F.sum("deg").alias("old_rows"),
            )
            .collect()
        )
        fixed_rows = sum(r["walkers"] for r in per_step)
        old_rows = sum(r["old_rows"] for r in per_step)
        row = {
            "probe": "walks",
            "hub_degree": hub_deg,
            "walkers": hub_deg + 1,
            "rows_out": rows_out,
            "fixed_sec": fixed_sec,
            "fixed_join_rows": fixed_rows,
            "old_join_rows": old_rows,
        }
        # actually run the OLD shape at small factors: same arithmetic,
        # single-key join + post-join idx filter
        if hub_deg <= 4000:
            adj = edges.select("src", "dst").distinct()
            w = Window.partitionBy("src").orderBy("dst")
            ranked = adj.withColumn(
                "idx", (F.row_number().over(w) - 1).cast("bigint")
            )
            dd = ranked.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
            ranked = ranked.join(dd, "src").localCheckpoint(eager=False)
            state = (
                adj.select(F.col("src").alias("start"))
                .distinct()
                .withColumn("node", F.col("start"))
            )
            t0 = time.time()
            total = state.count()
            for s in range(1, 4):
                h = F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit("walk0"),
                                F.col("start").cast("string"),
                                F.lit(str(s)),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("bigint")
                state = (
                    state.withColumn("_h", h)
                    .join(
                        ranked.select(
                            F.col("src").alias("node"), "dst", "idx", "deg"
                        ),
                        "node",
                    )
                    .filter(F.col("idx") == F.col("_h") % F.col("deg"))
                    .select("start", F.col("dst").alias("node"))
                    .localCheckpoint(eager=False)
                )
                total += state.count()
            row["old_shape_sec"] = round(time.time() - t0, 2)
            row["old_shape_rows_out"] = total
        out.unpersist()
        edges.unpersist()
        print(json.dumps(row), flush=True)
        results.append(row)
    return results


def _powerlaw_buckets(n: int) -> list:
    sizes = []
    s, k = n, 0
    while s >= 8:
        sizes.append((k, s))
        s //= 2
        k += 1
    return sizes


def probe_containment(spark) -> list:
    from etl_capnz_spark.operators.dedup import containment_pairs

    results = []
    for n in (1000, 4000, 16000):
        sizes = _powerlaw_buckets(n)
        parts = []
        off = 0
        for k, s in sizes:
            parts.append(
                spark.range(s).select(
                    (F.col("id") + off).alias("doc_id"),
                    F.lit(f"b{k}").alias("bkt"),
                    F.lit(
                        "alpha beta gamma delta epsilon zeta eta theta"
                    ).alias("text"),
                )
            )
            off += s
        docs = parts[0]
        for p in parts[1:]:
            docs = docs.unionByName(p)
        docs = docs.cache()
        n_docs = docs.count()
        row = {
            "probe": "containment",
            "factor": n,
            "docs": n_docs,
            "buckets": len(sizes),
            "cap": CAP,
            "analytic_uncapped_pairs": sum(
                s * (s - 1) // 2 for _, s in sizes
            ),
        }
        for label, cap in (("uncapped", None), ("capped", CAP)):
            if label == "uncapped" and n > 4000:
                row["uncapped_pairs"] = None  # quadratic: not materialized
                continue
            t0 = time.time()
            row[label + "_pairs"] = containment_pairs(
                docs, "text", "doc_id", "bkt", 0.5, max_bucket=cap
            ).count()
            row[label + "_sec"] = round(time.time() - t0, 2)
        docs.unpersist()
        print(json.dumps(row), flush=True)
        results.append(row)
    return results


def probe_phonetic(spark) -> list:
    from etl_capnz_spark.operators.linkage import phonetic_pairs

    results = []
    for n in (500, 1000, 2000):
        for mode in ("samelen", "mixedlen"):
            if mode == "samelen":
                name = F.format_string("smith%05d", F.col("id"))
            else:
                name = F.concat(
                    F.lit("s"),
                    F.expr("repeat('a', cast(id % 20 as int))"),
                    F.format_string("mith%03d", F.col("id")),
                )
            df = spark.range(n).select(
                F.col("id"), name.alias("name")
            ).cache()
            df.count()
            # exact candidate counts from the block-size distribution
            # (replayed in Python: same name construction per id)
            from collections import Counter

            if mode == "samelen":
                lens = Counter(len("smith%05d" % i) for i in range(n))
            else:
                lens = Counter(
                    len("s" + "a" * (i % 20) + "mith%03d" % i)
                    for i in range(n)
                )
            uncapped_cand = n * (n - 1) // 2  # one block; band may prune
            capped_cand = sum(
                s * (s - 1) // 2 for s in lens.values() if s <= CAP
            )
            row = {
                "probe": "phonetic",
                "factor": n,
                "mode": mode,
                "cap": CAP,
                "analytic_uncapped_cand": uncapped_cand,
                "analytic_capped_cand": capped_cand,
            }
            for label, cap in (("uncapped", None), ("capped", CAP)):
                if label == "uncapped" and n > 1000:
                    continue  # quadratic kernel cost: curve established
                t0 = time.time()
                row[label + "_pairs"] = phonetic_pairs(
                    df, "id", "name", threshold=0.85, max_block=cap
                ).count()
                row[label + "_sec"] = round(time.time() - t0, 2)
            df.unpersist()
            print(json.dumps(row), flush=True)
            results.append(row)
    return results


def main() -> None:
    which = sys.argv[1:] or ["walks", "containment", "phonetic"]
    spark = get_session("skew-probe")
    results = []
    for name in which:
        results += {
            "walks": probe_walks,
            "containment": probe_containment,
            "phonetic": probe_phonetic,
        }[name](spark)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "skew_probe.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
