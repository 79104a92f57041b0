"""Audit operators (operators/audit.py): fingerprints must be invariant
to partitioning/order, and snapshot_diff must classify each key right."""

from pyspark.sql import functions as F

from etl_capnz_spark.operators.audit import snapshot_diff, table_fingerprint


def test_fingerprint_invariant_to_partitioning(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), "v%d" % i) for i in range(100)],
        "id bigint, grp string, val string",
    )
    a = table_fingerprint(df.repartition(1), "grp", "id", "val").collect()
    b = table_fingerprint(
        df.repartition(7, "val"), "grp", "id", "val"
    ).collect()
    key = lambda rows: sorted((tuple(r) for r in rows))
    assert key(a) == key(b)


def test_fingerprint_detects_single_value_change(spark):
    df1 = spark.createDataFrame(
        [(1, "g", "x"), (2, "g", "y")], "id bigint, grp string, val string"
    )
    df2 = spark.createDataFrame(
        [(1, "g", "x"), (2, "g", "z")], "id bigint, grp string, val string"
    )
    f1 = table_fingerprint(df1, "grp", "id", "val").collect()[0]
    f2 = table_fingerprint(df2, "grp", "id", "val").collect()[0]
    assert f1["n_rows"] == f2["n_rows"]
    assert f1["hash_sum"] != f2["hash_sum"]


def test_snapshot_diff_classification(spark):
    before = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    after = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "k bigint, v string"
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(before, after, "k", "v").collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_value_perturbs_hash(spark):
    before = spark.createDataFrame([(1, "a")], "k bigint, v string")
    after = spark.createDataFrame(
        [(1, None)], "k bigint, v string"
    )
    got = snapshot_diff(before, after, "k", "v").collect()[0]
    assert got["change_type"] == "changed"
