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
