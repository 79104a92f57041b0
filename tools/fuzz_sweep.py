"""Multi-seed differential fuzz sweep: run tools/query_fuzz.py's
generator across many seeds in ONE Spark/DuckDB session pair and
record the evidence (FUZZ_SWEEP.json) — the nightly-sweep form of the
per-seed CLI. Any mismatch is recorded with its (seed, index) and SQL
for exact replay.

    python tools/fuzz_sweep.py [--seeds 18] [--n 200] [--start 7]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import duckdb  # noqa: E402

import query_fuzz as qf  # noqa: E402
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=18)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--start", type=int, default=7)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session("fuzz-sweep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in qf.TABLES:
        read_table(spark, args.sf, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )
    out = {"sf": args.sf, "n_per_seed": args.n, "seeds": [], "mismatches": []}
    t0 = time.time()
    for s in range(args.start, args.start + args.seeds):
        ts = time.time()
        bad = qf.run_fuzz(spark, con, args.n, seed=s)
        out["seeds"].append(
            {"seed": s, "ok": args.n - len(bad), "wall_s": round(time.time() - ts, 1)}
        )
        for i, sql, detail in bad:
            out["mismatches"].append(
                {"seed": s, "index": i, "detail": detail, "sql": sql}
            )
        print(f"seed {s}: {args.n - len(bad)}/{args.n} ok", flush=True)
    out["total_queries"] = args.seeds * args.n
    out["total_mismatches"] = len(out["mismatches"])
    out["wall_s"] = round(time.time() - t0, 1)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "FUZZ_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("total_queries", "total_mismatches", "wall_s")}))
    sys.exit(out["total_mismatches"])


if __name__ == "__main__":
    main()
