"""S1/S2: HTTP fetch as a distributed operator (SURVEY.md §2.1).

The reference fetches the feed once and each alert URL SEQUENTIALLY
(task.ts:626-630) with per-attempt timeout and linear-backoff retry
(task.ts:382-407). Here the URL table is a DataFrame: ``repartition`` to
the desired fetch parallelism, then an Arrow-batched ``mapInPandas`` whose
worker runs the same retry loop per URL. Spark's own task retry
(``spark.task.maxFailures``) is the coarse outer guard; the in-UDF loop is
the fine-grained one, preserving the reference's semantics:

* per-attempt timeout (default 30 000 ms, task.ts:15-17)
* retries (default 2 → 3 tries, task.ts:19-22)
* backoff 1000·(attempt+1) ms (task.ts:401)
* non-2xx → error (task.ts:394-396); after the last attempt the error is
  recorded in the ``error`` column (per-record isolation, not job failure)

No network egress happens in unit tests — they run against a loopback
server; production feeds are the three NZ alerting authorities
(reference README.md:7-11).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

from pyspark.sql import DataFrame

DEFAULT_TIMEOUT_MS = 30000  # task.ts:16
DEFAULT_RETRIES = 2  # task.ts:20


def fetch_one(
    url: str,
    headers: dict[str, str] | None = None,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    retries: int = DEFAULT_RETRIES,
    sleep=time.sleep,
) -> tuple[int, str | None, str | None]:
    """Fetch one URL with the reference's retry/backoff contract.

    Returns (status, body, error) — error is set only when every attempt
    failed. Split out for direct unit testing of the retry logic.
    """
    import urllib.error
    import urllib.request

    last_err: str | None = None
    for attempt in range(retries + 1):
        try:
            req = urllib.request.Request(url, headers=headers or {})
            with urllib.request.urlopen(req, timeout=timeout_ms / 1000.0) as resp:
                status = getattr(resp, "status", 200)
                if not 200 <= status < 300:
                    raise urllib.error.HTTPError(
                        url, status, f"HTTP {status}", resp.headers, None
                    )
                return status, resp.read().decode("utf-8", "replace"), None
        except Exception as exc:  # noqa: BLE001 — per-record isolation
            last_err = f"{type(exc).__name__}: {exc}"
            if attempt < retries:
                sleep(1.0 * (attempt + 1))  # linear backoff, task.ts:401
    return -1, None, last_err


def fetch_urls(
    urls: DataFrame,
    url_col: str = "url",
    headers: dict[str, str] | None = None,
    timeout_ms: int = DEFAULT_TIMEOUT_MS,
    retries: int = DEFAULT_RETRIES,
    parallelism: int | None = None,
) -> DataFrame:
    """Fetch every URL in the DataFrame → columns + (status, body, error).

    The reference's sequential per-alert loop becomes partition-parallel:
    with N partitions, N URLs are in flight — the single biggest structural
    speedup over the reference (SURVEY.md §4.1).
    """
    if parallelism is None:
        parallelism = urls.sparkSession.sparkContext.defaultParallelism
    df = urls.repartition(parallelism)
    out_schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    out_schema += ", status int, body string, error string"

    def _fetch_batch(batches: Iterator) -> Iterator:
        for pdf in batches:
            results = [
                fetch_one(u, headers, timeout_ms, retries)
                for u in pdf[url_col]
            ]
            pdf = pdf.copy()
            pdf["status"] = [r[0] for r in results]
            pdf["body"] = [r[1] for r in results]
            pdf["error"] = [r[2] for r in results]
            yield pdf

    return df.mapInPandas(_fetch_batch, out_schema)
