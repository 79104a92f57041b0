"""Sweep all queries() entries for output columns the driver's pandas
canonicalizer cannot sort (array / struct / map / binary types).

The driver canonicalizes Spark and oracle results with
``pandas.sort_values`` over every column before hashing; a top-level
ArrayType column materializes as Python lists → ``TypeError: unhashable
type: 'list'`` (see CORRECTNESS_r02.json, tpch_order_lines). Any entry
listed by this tool must serialize such columns (array_join / to_json)
in BOTH the Spark projection and the oracle SQL.

Usage: python tools/schema_sweep.py [sf_dir]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import types as T

import __spark_entry__ as entry_mod
from etl_capnz_spark.session import get_session

BAD = (T.ArrayType, T.StructType, T.MapType, T.BinaryType)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session()
    qs = entry_mod.queries()
    bad_entries: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            bad_cols = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if isinstance(f.dataType, BAD)
            ]
            if bad_cols:
                bad_entries[name] = bad_cols
        except Exception as e:  # noqa: BLE001
            errs[name] = f"{type(e).__name__}: {e}"
    print(f"swept {len(qs)} entries")
    for name, cols in bad_entries.items():
        print(f"BAD  {name}: {', '.join(cols)}")
    for name, msg in errs.items():
        print(f"ERR  {name}: {msg.splitlines()[0][:200]}")
    if not bad_entries and not errs:
        print("all entries canonicalizer-safe")


if __name__ == "__main__":
    main()
