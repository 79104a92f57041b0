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
