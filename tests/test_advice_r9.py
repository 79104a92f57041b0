"""Pins for the round-9 ADVICE fixes (VERDICT r8 ADVICE.md):

1. frontier pre-ledger resume refuses LOUDLY (sentinel run_tag) instead
   of silently dropping the fresh checkpoint's early rounds;
2. _versioned_state_commit sweeps EVERY stale _v_ dir, so a crash
   between pointer write and prune can't orphan a version forever;
3. ndcg_at_k raises on out-of-range graded relevance instead of the
   32-bit shiftleft wrap;
4. randomized_response_counts excludes NULL id/truth rows (no silent
   est_true bias, no unflipped pass-through).
"""

import json
import os

import pytest

from pyspark.sql import functions as F


def test_pre_ledger_resume_refuses_loudly(spark, tmp_path):
    from etl_capnz_spark.streaming.stream import (
        _ensure_committed_ledger,
        _read_committed_ledger,
    )

    sched = str(tmp_path / "schedule")
    # a pre-ledger sink: round dirs exist, no _committed.json
    os.makedirs(os.path.join(sched, "round=0"))
    os.makedirs(os.path.join(sched, "round=1"))
    _ensure_committed_ledger(sched, prefix="round=", run_tag="tag_fresh")
    ledger = _read_committed_ledger(sched)
    # lineage is unknowable -> sentinel, NOT the new run_tag (which
    # would let batch ids 0..1 early-return as committed replays)
    assert ledger["run_tag"] == "__pre_ledger__"
    assert ledger["epochs"] == ["round=0", "round=1"]
    # a genuinely fresh sink still stamps the real tag
    fresh = str(tmp_path / "fresh")
    _ensure_committed_ledger(fresh, prefix="round=", run_tag="tag_fresh")
    assert _read_committed_ledger(fresh)["run_tag"] == "tag_fresh"


def test_frontier_stream_raises_on_pre_ledger_dir(spark, tmp_path):
    from etl_capnz_spark.streaming.stream import frontier_schedule_stream

    src = str(tmp_path / "links")
    sched = str(tmp_path / "sched")
    crawled = str(tmp_path / "crawled")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(os.path.join(sched, "round=0"))  # pre-ledger leftover
    spark.createDataFrame(
        [("http://a/", "http://a/x")], "src string, url string"
    ).write.mode("overwrite").json(src)
    stream = spark.readStream.schema("src string, url string").json(src)
    q = frontier_schedule_stream(
        stream, sched, crawled, checkpoint=ckpt
    ).trigger(availableNow=True).start()
    with pytest.raises(Exception, match="predate the committed-epochs"):
        q.awaitTermination()
        raise RuntimeError(str(q.exception() or "no error"))


def test_versioned_prune_sweeps_all_stale(spark, tmp_path):
    from etl_capnz_spark.streaming.stream import (
        _versioned_state_commit,
        _write_scd2_pointer,
    )

    state = str(tmp_path / "state")
    os.makedirs(state)
    df = spark.range(3).select(F.col("id").alias("k"))
    # simulate a history where prunes were skipped: versions 1..5 on
    # disk, pointer at 5
    for i in range(1, 6):
        df.write.mode("overwrite").parquet(os.path.join(state, f"_v_{i}"))
    _write_scd2_pointer(state, {"version": 5, "epochs": ["e5"]})
    with open(os.path.join(state, "_version.json")) as f:
        ptr = json.load(f)
    _versioned_state_commit(df, state, ptr, "e6", keep_versions=3)
    vdirs = sorted(e for e in os.listdir(state) if e.startswith("_v_"))
    # floor = 6 - 3 = 3: versions 1..3 ALL swept (old code removed only
    # _v_3 and orphaned 1..2 forever), 4..6 retained
    assert vdirs == ["_v_4", "_v_5", "_v_6"]


def test_ndcg_rejects_out_of_range_rel(spark):
    from etl_capnz_spark.operators.mlmetrics import ndcg_at_k

    df = spark.createDataFrame(
        [(1, 10, 5.0, 70)],
        "q int, item int, score double, rel int",
    )
    with pytest.raises(Exception, match="graded relevance"):
        ndcg_at_k(df, "q", "item", "score", "rel", k=3).collect()
    # rel 30 used to wrap to a NEGATIVE 32-bit gain; bigint base keeps
    # 2^30 - 1 exact
    ok = spark.createDataFrame(
        [(1, 10, 5.0, 30)], "q int, item int, score double, rel int"
    )
    row = ndcg_at_k(ok, "q", "item", "score", "rel", k=3).collect()[0]
    assert row["ndcg"] == 1.0 and row["dcg"] == float(2**30 - 1)


def test_randomized_response_null_discipline(spark):
    from etl_capnz_spark.operators.audit import randomized_response_counts

    clean = spark.createDataFrame(
        [(i, "g", i % 2 == 0) for i in range(100)],
        "id bigint, grp string, truth boolean",
    )
    noisy = clean.unionByName(
        spark.createDataFrame(
            [(None, "g", True), (999, "g", None)],
            "id bigint, grp string, truth boolean",
        )
    )
    a = randomized_response_counts(
        clean, "grp", "truth", "id", seed="s"
    ).collect()[0]
    b = randomized_response_counts(
        noisy, "grp", "truth", "id", seed="s"
    ).collect()[0]
    # NULL id/truth rows are excluded entirely: same n, same estimate
    assert a["n"] == b["n"] == 100
    assert a["est_true"] == b["est_true"]
