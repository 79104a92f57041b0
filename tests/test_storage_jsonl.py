"""Storage-layout sinks (clustered / sharded writes) and the JSONL
quarantine source."""

import glob
import json

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_capnz_spark.sinks.storage import write_clustered, write_training_shards
from etl_capnz_spark.sources.jsonl import read_jsonl


def test_write_clustered_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    out = str(tmp_path / "clustered")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_clustered(docs, out, ["doc_id"], n_files=4)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id"])
        ids = t["doc_id"].to_pylist()
        assert ids == sorted(ids), "rows must be sorted within each file"
        ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo, "file key ranges must be disjoint for skipping"
    # round trip: nothing lost
    assert spark.read.parquet(out).count() == docs.count()


def test_write_training_shards_manifest_matches_files(spark, sf_dir, tmp_path):
    from etl_capnz_spark.operators.sampling import pack_sequences
    from etl_capnz_spark.operators.text import bpe_token_count

    out = str(tmp_path / "shards")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", bpe_token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", 2048)
    manifest = write_training_shards(packed, out).collect()
    assert len(manifest) >= 2
    for row in manifest:
        shard_df = spark.read.parquet(f"{out}/bin={row['bin']}")
        assert shard_df.count() == row["n_docs"]
        got_tokens = shard_df.agg(F.sum("n_tokens")).collect()[0][0]
        assert got_tokens == row["n_tokens"]
    total = sum(r["n_docs"] for r in manifest)
    assert total == docs.count()


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world"}),
        '{"doc_id": 2, "text": "broken',  # truncated JSON
        json.dumps({"doc_id": 3, "text": "fine"}),
        "not json at all",
    ]
    p.write_text("\n".join(lines))
    good, quarantine = read_jsonl(spark, str(p), "doc_id BIGINT, text STRING")
    good_rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert good_rows == {1: "hello world", 3: "fine"}
    bad = sorted(r["raw"] for r in quarantine.collect())
    assert bad == sorted(['{"doc_id": 2, "text": "broken', "not json at all"])


def test_zorder_clustering_prunes_2d_box(spark, sf_dir, tmp_path):
    """Z-order-clustered files let a 2-D box predicate skip most files;
    a hash-partitioned (unclustered) layout forces reading ~all of them."""
    from pyspark.sql import functions as F2

    from etl_capnz_spark.session import read_table
    from etl_capnz_spark.sinks.storage import write_clustered, z_value

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        (F2.col("user_id") % 64).alias("x"),
        (F2.expr("unix_micros(ts) div 3600000000") % 64).alias("y"),
    )
    ev = ev.withColumn("z", z_value(F2.col("x"), F2.col("y"), 6))

    z_dir = str(tmp_path / "by_z")
    flat_dir = str(tmp_path / "flat")
    write_clustered(ev, z_dir, ["z"], n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(flat_dir)

    def candidate_files(path):
        n = 0
        for f in glob.glob(path + "/part-*.parquet"):
            t = pq.read_table(f, columns=["x", "y"])
            xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
            if not xs:
                continue
            # file overlaps the box x<8, y<8 iff its min corner does
            if min(xs) < 8 and min(ys) < 8:
                n += 1
        return n

    n_z = candidate_files(z_dir)
    n_flat = candidate_files(flat_dir)
    assert n_flat >= 12, f"hash layout should spread the box ({n_flat})"
    assert n_z <= n_flat // 3, f"z-layout must prune: z={n_z} flat={n_flat}"


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC source/sink parity: the engine reads and writes ORC with the
    same DataFrame surface as parquet (a lake migration often mixes
    both) — schema and values survive the round trip."""
    out = str(tmp_path / "orc")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.orc(out)
    back = spark.read.orc(out)
    assert back.schema == docs.schema
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Additive schema evolution: files written before a column existed
    read back as NULL for that column under mergeSchema — the pattern
    that lets a 100 TB landing zone evolve without rewriting history."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id bigint, v string"
    ).write.parquet(out + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, v string, score double"
    ).write.parquet(out + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "v", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 9.5


def test_merge_aggregate_state_equals_recompute(spark, sf_dir, tmp_path):
    """Incremental rollup maintenance: merging three event batches into
    the state table one at a time must equal aggregating everything from
    scratch — the distributive-algebra contract of the delta-merge."""
    from etl_capnz_spark.session import read_table
    from etl_capnz_spark.sinks.storage import merge_aggregate_state

    ev = read_table(spark, sf_dir, "events")
    state = str(tmp_path / "rollup_state")
    final = None
    for i in range(3):
        batch = ev.filter(F.col("event_id") % 3 == i)
        final = merge_aggregate_state(
            spark, batch, state, ["event_type"], ["value"]
        )
    got = {
        r["event_type"]: (r["n"], round(r["sum_value"], 6))
        for r in final.collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_csv_permissive_quarantines_corrupt_rows(spark, tmp_path):
    """CSV ingestion with row-level error isolation (the T8 discipline on
    a different format): PERMISSIVE mode parses what it can, lands the
    raw text of broken rows in _corrupt_record, and good rows flow
    through untouched — no thrown job, auditable quarantine."""
    src = tmp_path / "csv"
    src.mkdir()
    (src / "data.csv").write_text(
        "id,val\n1,10\n2,notanumber\n3,30\nbadrow\n"
    )
    df = (
        spark.read.option("header", "true")
        .schema("id int, val int, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(src))
    ).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert {(r["id"], r["val"]) for r in good.collect()} == {
            (1, 10),
            (3, 30),
        }
        assert sorted(r["_corrupt_record"] for r in bad.collect()) == [
            "2,notanumber",
            "badrow",
        ]
    finally:
        df.unpersist()


def test_orc_roundtrip_is_value_exact_with_pushdown(spark, sf_dir, tmp_path):
    """ORC as an interchange format: a typed events projection writes
    to ORC and reads back value-exact (every row, every column), and
    a filtered read pushes the predicate into the ORC scan — the same
    format-layer guarantees the parquet paths get."""
    from pyspark.sql import functions as F

    src = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            "ts",
        )
    )
    out = str(tmp_path / "events_orc")
    src.write.format("orc").mode("overwrite").save(out)
    back = spark.read.format("orc").load(out)

    cols = sorted(back.columns)
    assert cols == sorted(src.columns)
    a = sorted(map(tuple, src.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b

    filtered = back.filter(F.col("event_type") == "purchase")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_type" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], "predicate must reach the ORC scan"
    n_orc = filtered.count()
    n_parq = src.filter(F.col("event_type") == "purchase").count()
    assert n_orc == n_parq


def test_csv_permissive_isolation_semantics(spark):
    """The format-layer T8 discipline (csv_error_isolation entry): a
    cast-failing field corrupts the row but KEEPS parseable sibling
    fields; an all-empty line is legal NULLs, NOT corruption; a clean
    line round-trips exactly."""
    from pyspark.sql import functions as F

    lines = spark.createDataFrame(
        [("oops,bad,row",), (",,",), ("7,click,88",)], "raw string"
    )
    schema = (
        "event_id bigint, event_type string, cents bigint, _bad string"
    )
    rows = {
        r["raw"]: r
        for r in lines.select(
            "raw",
            F.from_csv(
                "raw",
                schema,
                {
                    "mode": "PERMISSIVE",
                    "columnNameOfCorruptRecord": "_bad",
                },
            ).alias("r"),
        )
        .select("raw", "r.*")
        .collect()
    }
    bad = rows["oops,bad,row"]
    assert bad["_bad"] == "oops,bad,row"
    assert bad["event_id"] is None and bad["event_type"] == "bad"
    empty = rows[",,"]
    assert empty["_bad"] is None  # NULLs, not corruption
    assert empty["event_id"] is None and empty["event_type"] is None
    good = rows["7,click,88"]
    assert good["_bad"] is None and good["event_id"] == 7
    assert good["event_type"] == "click" and good["cents"] == 88
