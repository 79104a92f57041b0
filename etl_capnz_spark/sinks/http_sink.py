"""Partition-parallel HTTP submit as a Spark 4 Python DataSource WRITER
(the write-side twin of sources/http_source.py's DataSourceReader).

The reference submits ONE FeatureCollection per run (task.ts:882) — fine
for dozens of features, a bottleneck for millions. This sink shards the
egress: every partition POSTs its rows as NDJSON batches from the
EXECUTORS (no driver collect), with the S1 retry/backoff contract per
request, and reports per-partition delivery stats through the writer
commit protocol (WriterCommitMessage → driver-side commit/abort).

    df.write.format("http_submit").option("url", ...)
      .option("batch_size", "500").mode("append").save()

Scale: egress bandwidth grows with executors; the driver sees only one
tiny commit message per partition. Failure semantics: a partition whose
batch exhausts its retries raises — Spark retries the task, and the
driver's abort() hook fires if the job dies (at-least-once delivery,
the same contract every distributed HTTP sink has without a
transactional receiver).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class HttpCommit(WriterCommitMessage):
    def __init__(self, n_rows: int, n_batches: int):
        self.n_rows = n_rows
        self.n_batches = n_batches


class HttpSubmitWriter(DataSourceWriter):
    def __init__(self, options):
        self.url = options.get("url")
        if not self.url:
            raise ValueError("http_submit requires .option('url', ...)")
        self.batch_size = int(options.get("batch_size", "500"))
        self.retries = int(options.get("retries", "3"))
        self.timeout_ms = int(options.get("timeout_ms", "5000"))

    def write(self, rows):
        # runs ON EXECUTORS, one call per partition
        from etl_capnz_spark.sinks.submit import post_json

        buf: list[str] = []
        n_rows = n_batches = 0

        def flush():
            nonlocal n_batches
            if not buf:
                return
            status, _, err = post_json(
                self.url,
                "\n".join(buf),
                headers={"Content-Type": "application/x-ndjson"},
                timeout_ms=self.timeout_ms,
                retries=self.retries,
            )
            if err:
                raise RuntimeError(
                    f"http_submit batch failed after {self.retries} "
                    f"retries: {err}"
                )
            n_batches += 1
            buf.clear()

        for row in rows:
            buf.append(json.dumps(row.asDict(recursive=True), default=str))
            n_rows += 1
            if len(buf) >= self.batch_size:
                flush()
        flush()
        return HttpCommit(n_rows, n_batches)

    def commit(self, messages):
        total = sum(m.n_rows for m in messages if m is not None)
        batches = sum(m.n_batches for m in messages if m is not None)
        # driver-side summary; a transactional receiver would be told
        # "epoch complete, n=total" here
        print(
            f"http_submit: delivered {total} rows in {batches} batches "
            f"across {len(messages)} partitions"
        )

    def abort(self, messages):
        delivered = sum(m.n_rows for m in messages if m is not None)
        print(
            f"http_submit: job aborted; {delivered} rows from completed "
            "partitions were already delivered (at-least-once)"
        )


class HttpSubmitDataSource(DataSource):
    @classmethod
    def name(cls):
        return "http_submit"

    def writer(self, schema, overwrite):
        return HttpSubmitWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(HttpSubmitDataSource)
