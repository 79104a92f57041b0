"""CLI entry point — the engine's twin of the reference's local dev
runner (entry point B, ``ts-node task.ts``; SURVEY.md §3.2/§3.3).

    python -m etl_capnz_spark run <xml_dir> --out features.geojson
    python -m etl_capnz_spark run <xml_dir> --out-dir features_ndjson/
    python -m etl_capnz_spark run <xml_dir> --submit http://host/api
    python -m etl_capnz_spark query tpch_q1 --sf-dir /root/testdata/sf0.01

``run`` executes the full reference dataflow over a directory of landed
CAP XML snapshots: parse (X1, error-isolated) → required-field +
expiry filters (T5/T6) → feature fan-out (G*/F*/C*) → FeatureCollection
document (S4) or scalable NDJSON sink, with optional HTTP submit (the
reference's ``this.submit``, task.ts:882). ``query`` runs any contract
query from ``__spark_entry__.queries()`` and prints a row sample —
the ad-hoc inspection loop.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _default_now() -> str:
    import datetime

    return (
        datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%d %H:%M:%S")
    )


def cmd_run(spark: SparkSession, args: argparse.Namespace) -> int:
    from etl_capnz_spark.operators.extract import (
        active_filter,
        required_filter,
    )
    from etl_capnz_spark.operators.features import build_features
    from etl_capnz_spark.sinks.geojson import (
        counted,
        feature_collection_json,
        write_features,
    )
    from etl_capnz_spark.pipeline import Pipeline

    alerts = Pipeline.from_feed(
        spark, args.xml_dir, per_line=args.per_line
    ).df
    alerts = active_filter(required_filter(alerts), args.now)
    features = build_features(alerts)
    features, obs = counted(features)
    if args.out_dir:
        write_features(features, args.out_dir, partitions=args.partitions)
        stats = obs.get
        print(f"wrote NDJSON features to {args.out_dir}: {stats}", file=sys.stderr)
        return 0
    doc = feature_collection_json(features)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc)
        print(f"wrote {args.out} ({obs.get})", file=sys.stderr)
    if args.submit:
        from etl_capnz_spark.sinks.submit import post_json

        status, _, err = post_json(args.submit, doc, retries=args.retries)
        print(
            f"submitted to {args.submit}: HTTP {status}"
            + (f" (error: {err})" if err else ""),
            file=sys.stderr,
        )
        if err:
            return 1
    if not args.out and not args.submit:
        print(doc)
    return 0


def cmd_query(spark: SparkSession, args: argparse.Namespace) -> int:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if args.name not in qs:
        print(
            f"unknown query {args.name!r}; {len(qs)} available "
            f"(e.g. {', '.join(sorted(qs)[:8])}, ...)",
            file=sys.stderr,
        )
        return 2
    df = qs[args.name](spark, args.sf_dir)
    n = df.count()
    df.show(args.limit, truncate=not args.wide)
    print(f"{args.name}: {n} rows", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m etl_capnz_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="CAP XML dir → GeoJSON features")
    r.add_argument("xml_dir")
    r.add_argument(
        "--per-line",
        action="store_true",
        help="one CAP document per LINE (compact landings); default is "
        "one document per FILE (real multi-line CAP XML snapshots)",
    )
    r.add_argument("--out", help="single FeatureCollection document path")
    r.add_argument(
        "--out-dir", help="scalable NDJSON feature directory (text sink)"
    )
    r.add_argument("--submit", help="POST the FeatureCollection to this URL")
    r.add_argument("--retries", type=int, default=3)
    r.add_argument("--partitions", type=int, default=None)
    r.add_argument(
        "--now",
        default=_default_now(),
        help="expiry-filter reference time (UTC, 'YYYY-MM-DD HH:MM:SS')",
    )

    q = sub.add_parser("query", help="run a contract query by name")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--wide", action="store_true")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        from etl_capnz_spark.session import get_session

        spark = get_session("etl-capnz-cli")
    try:
        if args.cmd == "run":
            return cmd_run(spark, args)
        return cmd_query(spark, args)
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
