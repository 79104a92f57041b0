"""Scaling probe for the round-4 additions: line-level global dedup,
exact heavy hitters, Bloom pre-filter build+probe, CMS build+estimate.

Each factor unions N shifted copies of the corpus (line dedup gets
copies with IDENTICAL text so the dedup actually bites — the adversarial
case where one line hash partition receives N copies; heavy hitters /
sketches get distinct-suffixed values so cardinality grows with N).
Times are steady-state (one untimed warmup per factor). Prints one JSON
line per factor. Usage:

    python tools/sketch_scale_probe.py [factors ...]   # default 1 4 16
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.bloom import (  # noqa: E402
    bloom_might_contain,
    build_bloom,
)
from etl_capnz_spark.operators.dedup import line_dedup_global  # noqa: E402
from etl_capnz_spark.operators.frequency import (  # noqa: E402
    cms_build,
    cms_estimate,
    heavy_hitters_exact,
)
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def blow_up_same_text(docs, n: int):
    """N copies, distinct ids, SAME text — every line duplicated N×."""
    parts = [
        docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"), "text"
        )
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn):
    fn()  # warmup
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("sketch-scale-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = read_table(spark, sf_dir, "events")

    for n in factors:
        d = blow_up_same_text(docs, n).repartition(32).cache()
        nd = d.count()
        t_lines, _ = timed(
            lambda: line_dedup_global(d, "text", "doc_id").count()
        )

        # n× rows via explode of an n-element array (distinct cold items
        # per copy, so item cardinality grows with the factor; 'hot'
        # stays one global ~25% key)
        e = ev.select(
            F.explode(
                F.array(*[F.lit(i) for i in range(n)])
            ).alias("copy"),
            "user_id",
        ).select(
            F.when(F.col("user_id") % 4 == 0, F.lit("hot"))
            .otherwise(
                F.concat_ws("_", F.lit("u"), F.col("user_id"), F.col("copy"))
            )
            .alias("item")
        ).cache()
        ne = e.count()
        t_hh, _ = timed(lambda: heavy_hitters_exact(e, "item", k=6).count())

        hashes = d.select(F.md5("text").alias("h"))
        t_bloom_build, bloom = timed(
            lambda: build_bloom(hashes, "h", num_bits=1 << 22)
        )
        t_bloom_probe, _ = timed(
            lambda: hashes.withColumn(
                "hit", bloom_might_contain(F.col("h"), bloom, 1 << 22)
            )
            .filter("hit")
            .count()
        )

        t_cms, _ = timed(
            lambda: cms_estimate(
                cms_build(e, "item", depth=3, width=1024),
                e.distinct(),
                "item",
                depth=3,
                width=1024,
            ).count()
        )

        print(
            json.dumps(
                {
                    "factor": n,
                    "docs": nd,
                    "events": ne,
                    "line_dedup_s": round(t_lines, 2),
                    "heavy_hitters_s": round(t_hh, 2),
                    "bloom_build_s": round(t_bloom_build, 2),
                    "bloom_probe_s": round(t_bloom_probe, 2),
                    "cms_s": round(t_cms, 2),
                }
            ),
            flush=True,
        )
        d.unpersist()
        e.unpersist()


if __name__ == "__main__":
    main()
