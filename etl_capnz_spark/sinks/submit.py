"""S4 egress: HTTP POST of the FeatureCollection (SURVEY.md §2.1).

The reference's only egress is ``this.submit(fc)`` (task.ts:882) — the
host framework converts the FeatureCollection and POSTs it to the ETL
API. Engine counterpart:

* ``post_json`` — one POST with the SAME retry/timeout/backoff contract
  as the fetch side (per-attempt timeout task.ts:15-17, ``retries``
  attempts task.ts:19-22, linear backoff 1000·(attempt+1) ms task.ts:401,
  non-2xx → error task.ts:394-396).
* ``submit_features`` — builds the bounded FeatureCollection document
  (sinks/geojson.py: one scheduled batch, dozens of features — the
  reference's workload shape) and POSTs it. Driver-side by design: the
  document is a single bounded payload, not a distributed write (the
  scalable path is ``write_features``' newline-delimited sink).
* ``foreach_batch_submitter`` — the streaming adapter: a
  ``foreachBatch`` function POSTing one collection per micro-batch.

Failure semantics mirror the reference: an exhausted submit raises (the
framework's submit rejection fails the Lambda run); pass ``strict=False``
to get the (status, body, error) triple instead for per-run isolation.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from etl_capnz_spark.sinks.geojson import feature_collection_json
from etl_capnz_spark.sources.http import DEFAULT_RETRIES, DEFAULT_TIMEOUT_MS


def post_json(
    url: str,
    body: str,
    headers: dict[str, str] | None = None,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    retries: int = DEFAULT_RETRIES,
    sleep=time.sleep,
) -> tuple[int, str | None, str | None]:
    """POST a JSON document with the S1 retry contract.

    Returns (status, response_body, error) — error is set only when every
    attempt failed.
    """
    import urllib.error
    import urllib.request

    payload = body.encode("utf-8")
    hdrs = {"Content-Type": "application/json", **(headers or {})}
    last_err: str | None = None
    for attempt in range(retries + 1):
        try:
            req = urllib.request.Request(
                url, data=payload, headers=hdrs, method="POST"
            )
            with urllib.request.urlopen(req, timeout=timeout_ms / 1000.0) as resp:
                status = getattr(resp, "status", 200)
                if not 200 <= status < 300:
                    raise urllib.error.HTTPError(
                        url, status, f"HTTP {status}", resp.headers, None
                    )
                return status, resp.read().decode("utf-8", "replace"), None
        except Exception as exc:  # noqa: BLE001 — same isolation as fetch
            last_err = f"{type(exc).__name__}: {exc}"
            if attempt < retries:
                sleep(1.0 * (attempt + 1))  # linear backoff, task.ts:401
    return -1, None, last_err


def submit_features(
    features: DataFrame,
    url: str,
    headers: dict[str, str] | None = None,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    retries: int = DEFAULT_RETRIES,
    strict: bool = True,
    sleep=time.sleep,
) -> tuple[int, str | None, str | None]:
    """Build the FeatureCollection document and POST it (task.ts:882)."""
    doc = feature_collection_json(features)
    status, body, err = post_json(
        url, doc, headers, timeout_ms, retries, sleep
    )
    if strict and err is not None:
        raise RuntimeError(f"submit to {url} failed: {err}")
    return status, body, err


def foreach_batch_submitter(
    url: str,
    headers: dict[str, str] | None = None,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    retries: int = DEFAULT_RETRIES,
):
    """Streaming egress: ``writeStream.foreachBatch(...)`` adapter POSTing
    one FeatureCollection per micro-batch (empty batches are skipped —
    the reference submits whatever the scheduled run produced, and an
    empty run produces an empty collection it still submits, but an empty
    STREAM batch means no new data at all)."""

    def _submit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        submit_features(batch_df, url, headers, timeout_ms, retries)

    return _submit
