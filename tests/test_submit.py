"""S4 egress: FeatureCollection HTTP POST with the S1 retry contract
(task.ts:882 submit; retry/backoff task.ts:382-407)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from etl_capnz_spark.sinks.submit import (
    foreach_batch_submitter,
    post_json,
    submit_features,
)


@pytest.fixture(scope="module")
def post_server():
    """Loopback POST sink: /ok → 200 (records bodies); /flaky → 500 twice
    then 200; /fail → 500 always."""
    state = {"hits": {}, "bodies": []}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            hits = state["hits"]
            hits[self.path] = hits.get(self.path, 0) + 1
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            if self.path == "/ok" or (
                self.path == "/flaky" and hits[self.path] >= 3
            ):
                state["bodies"].append(
                    (self.path, raw.decode(), self.headers.get("Content-Type"))
                )
                body = b'{"accepted":true}'
                self.send_response(200)
            else:
                body = b"boom"
                self.send_response(500)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", state
    srv.shutdown()


def _two_features(spark):
    from tests.test_sinks_pipeline import _features

    return _features(spark)


def test_submit_posts_collection_document(spark, post_server):
    base, state = post_server
    status, resp, err = submit_features(
        _two_features(spark), f"{base}/ok", sleep=lambda s: None
    )
    assert (status, err) == (200, None) and json.loads(resp)["accepted"]
    path, raw, ctype = state["bodies"][-1]
    assert path == "/ok" and ctype == "application/json"
    fc = json.loads(raw)
    assert fc["type"] == "FeatureCollection"
    assert {f["id"] for f in fc["features"]} == {"A-1", "A-1-center"}


def test_post_retries_with_linear_backoff(post_server):
    base, state = post_server
    sleeps: list[float] = []
    status, resp, err = post_json(
        f"{base}/flaky", "{}", retries=2, sleep=sleeps.append
    )
    assert status == 200 and err is None
    assert state["hits"]["/flaky"] == 3  # 2 failures + success
    assert sleeps == [1.0, 2.0]  # 1000*(attempt+1) ms, task.ts:401


def test_strict_submit_raises_on_exhaustion(spark, post_server):
    base, state = post_server
    with pytest.raises(RuntimeError, match="submit .* failed"):
        submit_features(
            _two_features(spark), f"{base}/fail", retries=1,
            sleep=lambda s: None,
        )
    assert state["hits"]["/fail"] == 2
    # non-strict returns the error triple instead
    status, resp, err = submit_features(
        _two_features(spark), f"{base}/fail", retries=0, strict=False,
        sleep=lambda s: None,
    )
    assert status == -1 and "HTTPError" in err


def test_foreach_batch_submitter(spark, post_server):
    base, state = post_server
    before = len(state["bodies"])
    fn = foreach_batch_submitter(f"{base}/ok")
    fn(_two_features(spark), 0)
    assert len(state["bodies"]) == before + 1
    # empty batch → no POST
    fn(_two_features(spark).limit(0), 1)
    assert len(state["bodies"]) == before + 1


def test_http_submit_datasource_writer(spark, post_server):
    """Spark 4 Python DataSource WRITER: partition-parallel NDJSON POST
    from executors — every row delivered exactly once across batches,
    with Content-Type and batch_size honored."""
    import json

    from etl_capnz_spark.sinks import http_sink

    base, state = post_server
    http_sink.register(spark)
    df = spark.range(0, 20).selectExpr(
        "id AS feature_id", "concat('cs-', id) AS callsign"
    ).repartition(4)
    (
        df.write.format("http_submit")
        .option("url", base + "/ok")
        .option("batch_size", "3")
        .mode("append")
        .save()
    )
    ndjson_bodies = [
        b for p, b, ct in state["bodies"]
        if ct == "application/x-ndjson" and p == "/ok"
    ]
    rows = [json.loads(line) for b in ndjson_bodies for line in b.split("\n")]
    assert sorted(r["feature_id"] for r in rows) == list(range(20))
    # 4 partitions x batch_size 3 over 5 rows each -> at least 8 batches
    assert len(ndjson_bodies) >= 8


def test_http_submit_datasource_retries_then_fails(spark, post_server):
    from etl_capnz_spark.sinks import http_sink

    base, state = post_server
    http_sink.register(spark)
    df = spark.range(0, 3).coalesce(1)
    import pytest

    with pytest.raises(Exception) as ei:
        (
            df.write.format("http_submit")
            .option("url", base + "/fail")
            .option("retries", "2")
            .mode("append")
            .save()
        )
    assert "http_submit batch failed" in str(ei.value)
