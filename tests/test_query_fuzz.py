"""Differential query fuzz (SQLancer-lite, tools/query_fuzz.py): 200
seeded random join/agg/window/set-op/subquery queries, each run through
Spark SQL AND DuckDB over the same parquet tables, compared as
canonicalized multisets. Hunts the wrong-answer classes the
hand-written 312-entry contract can't reach — optimizer edge cases,
null/ties interactions, join-reorder and expression-rewrite bugs.
Seeded: a failure names its exact (seed, index) for replay via
`python tools/query_fuzz.py --seed S --n N`."""
import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


SF = os.environ.get("SPARK_GRAFT_FUZZ_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def engines(spark):
    import query_fuzz as qf

    from etl_capnz_spark.session import read_table

    con = duckdb.connect()
    for t in qf.TABLES:
        read_table(spark, SF, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield spark, con
    # the session-scoped SparkSession outlives this module: drop the
    # views so no later test accidentally reads sf0.01 tables by name
    for t in qf.TABLES:
        spark.catalog.dropTempView(t)
    con.close()


@pytest.mark.slow
def test_differential_fuzz_200_queries(engines):
    import query_fuzz as qf

    spark, con = engines
    bad = qf.run_fuzz(spark, con, n=200, seed=7)
    msg = "\n".join(
        f"[7:{i}] {d}\n  {sql}" for i, sql, d in bad[:5]
    )
    assert not bad, f"{len(bad)} differential mismatches:\n{msg}"
