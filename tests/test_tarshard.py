"""WebDataset-style tar shards (sinks/tarshard.py): byte-determinism,
exact round-trip incl. NULL content, and shard routing."""

import hashlib
import io
import tarfile

from pyspark.sql import functions as F


def _shards_by_id(rows):
    return {r["shard_id"]: r for r in rows}


def test_tar_roundtrip_with_null_content_and_meta(spark):
    """Pack → unpack must reproduce every (id, text, meta) exactly —
    including a NULL text (packed as an empty member + content_null
    marker, restored as NULL, never as '')."""
    from etl_capnz_spark.sinks.tarshard import (
        pack_tar_shards,
        unpack_tar_shards,
    )

    df = spark.createDataFrame(
        [
            (1, "hello wörld", "en", 11),
            (2, None, "de", 0),
            (3, "", "mi", 0),
            (4, "a\nb\tc", "en", 5),
        ],
        "doc_id long, text string, lang string, n long",
    )
    out = {
        r["member_id"]: r
        for r in unpack_tar_shards(
            pack_tar_shards(df, "doc_id", "text", ["lang", "n"], 2)
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["text"] == "hello wörld"
    assert out[2]["text"] is None  # NULL restored, not ''
    assert out[3]["text"] == ""  # '' stays '', not NULL
    assert out[4]["text"] == "a\nb\tc"
    import json

    m1 = json.loads(out[1]["meta"])
    assert m1 == {"lang": "en", "n": 11, "content_null": False}
    assert json.loads(out[2]["meta"])["content_null"] is True


def test_tar_bytes_deterministic_and_partition_invariant(spark, sf_dir):
    """Re-packing — even from a differently-partitioned input — must
    produce byte-identical shards (sorted members, zeroed mtime/owner):
    the property that makes the sink idempotent and its output
    cacheable/diffable at 100 TB."""
    from etl_capnz_spark.sinks.tarshard import pack_tar_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = _shards_by_id(
        pack_tar_shards(
            docs, "doc_id", "text", ["lang"], 4
        ).collect()
    )
    b = _shards_by_id(
        pack_tar_shards(
            docs.repartition(13, "source"), "doc_id", "text", ["lang"], 4
        ).collect()
    )
    assert set(a) == set(b) and len(a) == 4
    for sid in a:
        ha = hashlib.md5(bytes(a[sid]["tar_bytes"])).hexdigest()
        hb = hashlib.md5(bytes(b[sid]["tar_bytes"])).hexdigest()
        assert ha == hb
    assert sum(r["n_entries"] for r in a.values()) == docs.count()


def test_tar_members_sorted_and_readable_by_stdlib(spark):
    """The shard must be a PLAIN tar any loader can open: stdlib
    tarfile lists members in sorted-by-id order, txt before json per
    sample, USTAR headers."""
    from etl_capnz_spark.sinks.tarshard import pack_tar_shards

    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )
    rows = pack_tar_shards(df, "doc_id", "text", ["lang"], 1).collect()
    assert len(rows) == 1
    with tarfile.open(
        fileobj=io.BytesIO(bytes(rows[0]["tar_bytes"])), mode="r"
    ) as tar:
        names = [m.name for m in tar.getmembers()]
        assert all(m.mtime == 0 and m.uid == 0 for m in tar.getmembers())
    stems = [n.split(".")[0] for n in names[::2]]
    assert stems == sorted(stems)
    assert names == [
        f"{int(s):012d}{ext}" for s in stems for ext in (".txt", ".json")
    ]
