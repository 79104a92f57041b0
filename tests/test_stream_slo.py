"""Streaming latency SLO envelope (STREAM_SLO.json / STREAM_SLO.md):
replay a small event stream through representative stateful paths and
pin each path's measured p95 batch latency inside the recorded sf0.1
budget. The test data is ~10× smaller than the recording, so a breach
here is an unambiguous regression (state blow-up, lost watermark,
accidental Python hot path), never noise."""

import json
import os
import time

import pytest

#: slow tier (pytest.ini): streaming SLO replays (~1 min)
pytestmark = pytest.mark.slow

from etl_capnz_spark.session import read_table

SLO_PATH = os.path.join(os.path.dirname(__file__), "..", "STREAM_SLO.json")


def _budget(path_name: str) -> float:
    with open(SLO_PATH) as f:
        slo = json.load(f)
    return float(slo["paths"][path_name]["p95_budget_ms"])


def _pctl(xs, f):
    s = sorted(xs)
    k = (len(s) - 1) * f
    lo, hi = int(k), min(int(k) + 1, len(s) - 1)
    return s[lo] + (s[hi] - s[lo]) * (k - lo)


def _replay(spark, tmp_path, transform, name):
    events = read_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / f"in_{name}")
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(f"slo_{name}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"cp_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    lat = [
        float(p["durationMs"]["triggerExecution"])
        for p in (json.loads(pp.json) for pp in q.recentProgress)
        if p.get("numInputRows", 0) > 0 and "triggerExecution" in p["durationMs"]
    ]
    assert lat, f"{name}: no batches with input rows recorded"
    return _pctl(lat, 0.95)


def test_slo_artifact_covers_every_benched_path():
    with open(SLO_PATH) as f:
        slo = json.load(f)
    assert set(slo["paths"]) == {
        "tumbling",
        "sliding",
        "session",
        "dedup_watermark",
        "stateful_totals",
        "interval_join",
        "crawl_ingest",
        "frontier_rounds",
        "feed_stream",
        "sketch_fold",
        "neardup_fold",
    }
    for name, p in slo["paths"].items():
        assert p["p95_budget_ms"] >= p["measured_p95_ms"], name


@pytest.mark.parametrize("path_name", ["tumbling", "stateful_totals"])
def test_p95_within_budget(spark, tmp_path, path_name):
    from etl_capnz_spark.streaming.stream import (
        running_user_totals,
        tumbling_counts,
    )

    transform = {
        "tumbling": tumbling_counts,
        "stateful_totals": running_user_totals,
    }[path_name]
    p95 = _replay(spark, tmp_path, transform, path_name)
    budget = _budget(path_name)
    assert p95 <= budget, (
        f"{path_name}: p95 {p95:.0f} ms exceeds SLO budget {budget:.0f} ms "
        f"on 1/10th-size data — regression"
    )


def test_slo_replay_sketch_fold(spark, tmp_path):
    """sf0.01 replay of the versioned KMV sketch-fold path (per-batch
    sketch build + committed-state merge + _v_<n+1> write + pointer
    commit) inside the recorded sf0.1 budget — the regression net for
    the versioned-state discipline's per-batch cost."""
    from etl_capnz_spark.streaming.stream import kmv_distinct_sink

    events = read_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "in_sketch_fold")
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cp = str(tmp_path / "cp_sketch_fold")
    q = (
        kmv_distinct_sink(
            stream, str(tmp_path / "state_sketch_fold"), cp,
            ["event_type"], "user_id", k=64,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    lat = [
        float(p["durationMs"]["triggerExecution"])
        for p in (json.loads(pp.json) for pp in q.recentProgress)
        if p.get("numInputRows", 0) > 0
        and "triggerExecution" in p["durationMs"]
    ]
    assert lat, "sketch_fold: no batches with input rows recorded"
    p95 = _pctl(lat, 0.95)
    assert p95 <= _budget("sketch_fold"), (
        f"sketch_fold p95 {p95}ms over budget"
    )


def test_slo_replay_neardup_fold(spark, tmp_path):
    """sf0.01 replay of the incremental near-dup ingest path (per-batch
    MinHash/LSH probe against the committed band index + survivor
    admission + one ledger commit) inside the recorded sf0.1 budget."""
    from etl_capnz_spark.streaming.stream import incremental_neardup_sink

    docs = read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "in_neardup")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        incremental_neardup_sink(
            stream,
            str(tmp_path / "out_neardup"),
            str(tmp_path / "idx_neardup"),
            str(tmp_path / "cp_neardup"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    lat = [
        float(p["durationMs"]["triggerExecution"])
        for p in (json.loads(pp.json) for pp in q.recentProgress)
        if p.get("numInputRows", 0) > 0
        and "triggerExecution" in p["durationMs"]
    ]
    assert lat, "neardup_fold: no batches with input rows recorded"
    p95 = _pctl(lat, 0.95)
    assert p95 <= _budget("neardup_fold"), (
        f"neardup_fold p95 {p95}ms over budget"
    )
