"""THE crash matrix (VERDICT r8 next-round #1): every accumulating sink
× every commit-ordering crash point, one parameterized table.

Round 8 closed with five parallel commit disciplines and six
review-caught crash bugs written in the gaps between them; round 9
consolidated them into streaming/commitlog.py, whose named
``crash_point`` hooks let ONE test inject a crash at each ordering
point of each sink and assert the two properties a table format's log
provides:

1. **Reader isolation** — after the crash, the sink's reader returns
   exactly the committed prefix (batch 1), or — when the crash lands
   AFTER the atomic commit (``snapshot.cleanup``) — the full state;
   never a torn batch-2 mix.
2. **Replay convergence** — restarting the stream from the same
   checkpoint converges to a crash-free reference run's exact state.

Protocol per case: land file 1 → run (commits batch 1) → capture the
reader's prefix rows → land file 2 + arm the hook → run (batch 2
crashes at the point) → assert reader == prefix/full per the point →
disarm → run again (replay) → assert reader == an independent
crash-free reference run over the same two files.
"""

import json as js

import pytest

#: slow tier (pytest.ini): 30-case crash matrix (~2 min)
pytestmark = pytest.mark.slow

from etl_capnz_spark.streaming import commitlog


class InjectedCrash(RuntimeError):
    pass


@pytest.fixture(autouse=True)
def _disarm():
    yield
    commitlog.CRASH_HOOK = None


def _arm(point: str) -> None:
    def hook(name: str) -> None:
        if name == point:
            raise InjectedCrash(f"injected crash at {name}")

    commitlog.CRASH_HOOK = hook


# --- per-sink drivers --------------------------------------------------------

EVENTS_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, ts STRING"
)


def _events_batch(i: int) -> list[dict]:
    return [
        {
            "event_id": i * 100 + j,
            "user_id": (i * 7 + j) % 5,
            "event_type": f"t{j % 3}",
            "value": float(10 * i + j),
            "ts": f"2024-01-0{i + 1} 00:00:{j:02d}",
        }
        for j in range(8)
    ]


def _events_stream(spark, land):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .json(str(land))
        .selectExpr(
            "event_id", "user_id", "event_type", "value",
            "cast(ts as timestamp) AS ts",
        )
    )


def _rows(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def _kmv(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        kmv_distinct_sink,
        read_sketch_state,
    )

    state = f"{root}/state"
    return (
        lambda: kmv_distinct_sink(
            _events_stream(spark, land), state, f"{root}/cp",
            ["event_type"], "user_id", k=16,
        ),
        lambda: _rows(read_sketch_state(spark, state)),
        _events_batch,
    )


def _hll(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        hll_distinct_sink,
        read_sketch_state,
    )

    state = f"{root}/state"
    return (
        lambda: hll_distinct_sink(
            _events_stream(spark, land), state, f"{root}/cp",
            ["event_type"], "user_id",
        ),
        lambda: _rows(read_sketch_state(spark, state)),
        _events_batch,
    )


def _quantile(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        quantile_sketch_sink,
        read_sketch_state,
    )

    state = f"{root}/state"
    return (
        lambda: quantile_sketch_sink(
            _events_stream(spark, land), state, f"{root}/cp",
            ["event_type"], "value", "event_id", k=8,
        ),
        lambda: _rows(read_sketch_state(spark, state)),
        _events_batch,
    )


def _upsert(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        read_sketch_state,
        upsert_alert_state,
    )

    state = f"{root}/state"
    stream = (
        spark.readStream.schema(
            "identifier STRING, msg_type STRING, sent STRING"
        )
        .json(str(land))
        .selectExpr(
            "identifier", "msg_type",
            "cast(sent as timestamp) AS sent_ts",
        )
    )

    def batch(i: int) -> list[dict]:
        return [
            {
                "identifier": f"id{j}",
                "msg_type": "Cancel" if i == 1 and j == 0 else "Alert",
                "sent": f"2024-01-0{i + 1} 00:00:0{j}",
            }
            for j in range(3)
        ]

    return (
        lambda: upsert_alert_state(stream, state, f"{root}/cp"),
        lambda: _rows(read_sketch_state(spark, state)),
        batch,
    )


def _scd2(spark, land, root):
    from etl_capnz_spark.streaming.stream import read_scd2_state, scd2_sink

    dim = f"{root}/dim"
    stream = spark.readStream.schema(
        "k BIGINT, bal DOUBLE, seg STRING, as_of STRING"
    ).json(str(land))

    def batch(i: int) -> list[dict]:
        return [
            {
                "k": j,
                "bal": 10.0 * i + j,
                "seg": "A" if i == 0 else "B",
                "as_of": f"2024-01-0{i + 1}",
            }
            for j in range(3)
        ]

    return (
        lambda: scd2_sink(stream, dim, f"{root}/cp", "k", ["bal", "seg"]),
        lambda: _rows(read_scd2_state(spark, dim)),
        batch,
    )


def _cusum(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        cusum_sink,
        read_cusum_alarms,
        read_cusum_state,
    )

    out = f"{root}/out"
    return (
        lambda: cusum_sink(
            _events_stream(spark, land), out, f"{root}/cp",
            "user_id", "ts", "value", "event_id",
            level=5.0, threshold=8.0,
        ),
        lambda: (
            _rows(read_cusum_state(spark, out)),
            _rows(read_cusum_alarms(spark, out)),
        ),
        _events_batch,
    )


def _cms(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        cms_sketch_sink,
        read_cms_state,
    )

    state = f"{root}/state"
    return (
        lambda: cms_sketch_sink(
            _events_stream(spark, land), state, f"{root}/cp",
            "event_type", depth=2, width=16,
        ),
        lambda: _rows(read_cms_state(spark, state)),
        _events_batch,
    )


def _mg(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        mg_heavy_hitters_sink,
        read_mg_state,
    )

    state = f"{root}/state"
    return (
        lambda: mg_heavy_hitters_sink(
            _events_stream(spark, land), state, f"{root}/cp",
            "event_type", k=4,
        ),
        lambda: _rows(read_mg_state(spark, state, k=4)),
        _events_batch,
    )


def _dedup(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        incremental_dedup_sink,
        read_incremental_output,
    )

    out, idx = f"{root}/out", f"{root}/idx"
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").json(
        str(land)
    )

    def batch(i: int) -> list[dict]:
        # batch 2 repeats one batch-1 text (the cross-batch dup) and
        # adds fresh ones
        return [
            {"doc_id": i * 10 + j, "text": f"doc text {0 if j == 0 else i * 10 + j}"}
            for j in range(4)
        ]

    return (
        lambda: incremental_dedup_sink(
            stream, out, idx, f"{root}/cp", compact_every=100
        ),
        lambda: _rows(
            read_incremental_output(spark, out).select("doc_id", "text")
        ),
        batch,
    )


def _neardup(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        incremental_neardup_sink,
        read_neardup_output,
    )

    out, idx = f"{root}/out", f"{root}/idx"
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").json(
        str(land)
    )

    def batch(i: int) -> list[dict]:
        # batch 2's first doc repeats a batch-1 text (cross near-dup)
        return [
            {
                "doc_id": i * 10 + j,
                "text": f"document body number {0 if j == 0 else i * 10 + j} "
                "with enough words to shingle",
            }
            for j in range(3)
        ]

    return (
        lambda: incremental_neardup_sink(stream, out, idx, f"{root}/cp"),
        lambda: _rows(
            read_neardup_output(spark, out).select("doc_id", "text")
        ),
        batch,
    )


def _frontier(spark, land, root):
    from etl_capnz_spark.streaming.stream import (
        frontier_schedule_stream,
        read_frontier_schedule,
    )

    sched, crawled = f"{root}/sched", f"{root}/crawled"
    stream = spark.readStream.schema("src BIGINT, url STRING").json(
        str(land)
    )

    def batch(i: int) -> list[dict]:
        return [
            {"src": 1, "url": f"http://h{i}.com/p{j}"} for j in range(3)
        ]

    return (
        lambda: frontier_schedule_stream(
            stream, sched, crawled, f"{root}/cp"
        ),
        lambda: _rows(
            read_frontier_schedule(spark, sched).select("url", "round")
        ),
        batch,
    )


SINKS = {
    "kmv": _kmv,
    "hll": _hll,
    "quantile": _quantile,
    "upsert": _upsert,
    "scd2": _scd2,
    "cusum": _cusum,
    "cms": _cms,
    "mg": _mg,
    "dedup": _dedup,
    "neardup": _neardup,
    "frontier": _frontier,
}

# crash point -> what a reader must see after the crash:
# "prefix" (batch 2 never became visible) or "full" (the crash landed
# after the atomic commit, so batch 2 IS committed and the replay is a
# no-op)
SNAPSHOT_POINTS = {
    "snapshot.write": "prefix",
    "snapshot.committed": "prefix",
    "pointer.commit": "prefix",
    "snapshot.cleanup": "full",
}
LEDGER_POINTS = {"ledger.append": "prefix"}

MATRIX = [
    *[
        (sink, point, vis)
        for sink in ("kmv", "hll", "quantile", "upsert", "scd2", "cusum")
        for point, vis in SNAPSHOT_POINTS.items()
    ],
    *[
        (sink, point, vis)
        for sink in ("cms", "mg", "frontier", "neardup")
        for point, vis in LEDGER_POINTS.items()
    ],
    ("dedup", "manifest.commit", "prefix"),
    ("dedup", "ledger.append", "prefix"),
]


def _land(land, i: int, rows: list[dict]) -> None:
    (land / f"b{i}.jsonl").write_text(
        "\n".join(js.dumps(r) for r in rows)
    )


def _run(make_sink) -> None:
    q = make_sink().trigger(availableNow=True).start()
    q.awaitTermination(180)


def _run_expect_crash(make_sink) -> None:
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = make_sink().trigger(availableNow=True).start()
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(180)
        if q.exception() is not None:
            raise q.exception()


@pytest.mark.parametrize("sink,point,visibility", MATRIX)
def test_crash_matrix(spark, tmp_path, sink, point, visibility):
    driver = SINKS[sink]

    # independent crash-free reference over the same two batches
    ref_land = tmp_path / "ref_land"
    ref_land.mkdir()
    ref_sink, ref_read, mk_batch = driver(
        spark, ref_land, str(tmp_path / "ref")
    )
    _land(ref_land, 0, mk_batch(0))
    _run(ref_sink)
    _land(ref_land, 1, mk_batch(1))
    _run(ref_sink)
    expected_full = ref_read()

    # the run under test: batch 1 commits, batch 2 crashes at `point`
    land = tmp_path / "land"
    land.mkdir()
    mk_sink, read, _ = driver(spark, land, str(tmp_path / "run"))
    _land(land, 0, mk_batch(0))
    _run(mk_sink)
    expected_prefix = read()

    _land(land, 1, mk_batch(1))
    _arm(point)
    try:
        _run_expect_crash(mk_sink)
    finally:
        commitlog.CRASH_HOOK = None

    # 1) reader isolation: exactly the committed prefix (or the full
    #    state when the crash landed after the atomic commit) — never
    #    a torn mix
    seen = read()
    assert seen == (
        expected_prefix if visibility == "prefix" else expected_full
    ), f"{sink} @ {point}: reader saw a torn state"

    # 2) replay convergence: restart from the same checkpoint, land
    #    nothing new — the replayed batch must converge to the
    #    crash-free reference
    _run(mk_sink)
    assert read() == expected_full, f"{sink} @ {point}: replay diverged"
