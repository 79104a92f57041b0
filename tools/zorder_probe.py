"""Z-order vs 1-D-sorted layout: measured min/max file-pruning counts.

Writes the same deterministic pseudo-uniform point set (hash-derived, so
runs are reproducible) under (a) Z-order clustering and (b) a 1-D range
sort, at several file counts, then for a grid of 2-D box predicates
counts the files a perfect min/max pruner would read under each layout.
Prints one JSON line per (n_files, box) combination and a summary line.

Usage: python tools/zorder_probe.py [n_rows]   # default 200_000
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.layout import (  # noqa: E402
    file_minmax_overlap,
    zorder_write,
    zvalue2,
)
from etl_capnz_spark.session import get_session  # noqa: E402

DOMAIN = 1 << 16


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_session("zorder-probe")
    df = (
        spark.range(n_rows)
        .withColumn("x", F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(DOMAIN)))
        .withColumn("y", F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(DOMAIN)))
    )
    boxes = {
        "quarter_x_tenth_y": ((0, DOMAIN // 4), (0, DOMAIN // 10)),
        "center_tile": (
            (DOMAIN // 2, DOMAIN // 2 + DOMAIN // 8),
            (DOMAIN // 2, DOMAIN // 2 + DOMAIN // 8),
        ),
        "narrow_band_y": ((0, DOMAIN), (0, DOMAIN // 50)),
    }
    totals = {"z": 0, "linear": 0, "files": 0}
    with tempfile.TemporaryDirectory() as tmp:
        for n_files in (16, 64):
            zpath = os.path.join(tmp, f"z_{n_files}")
            lpath = os.path.join(tmp, f"l_{n_files}")
            zorder_write(df, zpath, zvalue2(F.col("x"), F.col("y")), n_files)
            (
                df.repartitionByRange(n_files, "x")
                .sortWithinPartitions("x")
                .write.mode("overwrite")
                .parquet(lpath)
            )
            for name, ((xlo, xhi), (ylo, yhi)) in boxes.items():
                box = {"x": (float(xlo), float(xhi)), "y": (float(ylo), float(yhi))}
                z_read = int(
                    file_minmax_overlap(spark.read.parquet(zpath), box)
                    .filter("overlaps")
                    .count()
                )
                l_read = int(
                    file_minmax_overlap(spark.read.parquet(lpath), box)
                    .filter("overlaps")
                    .count()
                )
                totals["z"] += z_read
                totals["linear"] += l_read
                totals["files"] += n_files
                print(
                    json.dumps(
                        {
                            "n_files": n_files,
                            "box": name,
                            "zorder_files_read": z_read,
                            "linear_files_read": l_read,
                        }
                    ),
                    flush=True,
                )
    print(
        json.dumps(
            {
                "summary": "files a perfect min/max pruner reads, all boxes",
                "n_rows": n_rows,
                "zorder_total": totals["z"],
                "linear_total": totals["linear"],
                "files_total": totals["files"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
