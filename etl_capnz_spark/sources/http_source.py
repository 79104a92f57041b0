"""S1/S2 as a Spark 4 Python Data Source (SURVEY.md §4.2: 'HTTP source
needs a custom data source — Python Data Source API').

``spark.read.format("capnz_http").option("urls", "u1,u2,...").load()``
yields (url, status, body, error) with one PARTITION PER URL — Spark
schedules the fetches across executors, replacing the reference's
sequential loop (task.ts:626-630) with cluster-parallel I/O while keeping
its retry contract (fetch_one). ``timeout_ms`` / ``retries`` options map to
the reference env knobs (task.ts:15-22).

This is the declarative twin of sources/http.fetch_urls (mapInPandas):
use the data source when the URL list is a config input, the mapInPandas
operator when the URLs are themselves a DataFrame computed upstream.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from etl_capnz_spark.sources.http import (
    DEFAULT_RETRIES,
    DEFAULT_TIMEOUT_MS,
    fetch_one,
)

SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("status", IntegerType(), True),
        StructField("body", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class CapHttpReader(DataSourceReader):
    def __init__(self, options):
        self.urls = [
            u.strip() for u in options.get("urls", "").split(",") if u.strip()
        ]
        self.timeout_ms = int(options.get("timeout_ms", DEFAULT_TIMEOUT_MS))
        self.retries = int(options.get("retries", DEFAULT_RETRIES))

    def partitions(self):
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition):
        status, body, error = fetch_one(
            partition.url, timeout_ms=self.timeout_ms, retries=self.retries
        )
        yield (partition.url, status, body, error)


class CapHttpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "capnz_http"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return CapHttpReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CapHttpDataSource)


# --- streaming half of the custom-source matrix (Spark 4
# SimpleDataSourceStreamReader; VERDICT r4 task 4) -------------------------
#
# ``spark.readStream.format("capnz_feed_stream").option("path", dir)``
# tails a LANDED-SNAPSHOT directory: each immutable landed file holds one
# XML document per line (the same text-per-line contract as
# streaming/stream.read_xml_stream), files ordered by name. The offset is
# {"files": n, "seq": m, "last": name, "batch": [names]} — count + total
# rows consumed, PLUS the lexicographic consumed-watermark name and the
# explicit file list of the batch that produced the offset. New files are
# selected by ``name > last`` (never by position), so replay is
# DETERMINISTIC even against a misbehaving producer; ``readBetweenOffsets``
# replays exactly ``end["batch"]`` — byte-identical rows after a crash no
# matter what landed since. The monotone-naming contract (producers land
# timestamp-prefixed names via write-temp-then-rename) is ENFORCED, not
# assumed: read() recounts the files at-or-below the watermark and raises
# if a file ever LANDS out of order (the silent-data-loss case); consumed
# files DELETED by producer retention are tolerated — they sort at-or-below
# the watermark and are never re-selected (the pre-fix count-based offset
# would have re-read live files after any deletion). This is the bridge that makes the
# NON-replayable HTTP feed replayable: the batch fetcher
# (fetch_urls / capnz_http) lands snapshots; the stream source only ever
# reads the landed log. Rows: (seq, path, xml), seq globally continuous.

from pyspark.sql.datasource import SimpleDataSourceStreamReader
from pyspark.sql.types import LongType

STREAM_SCHEMA = StructType(
    [
        StructField("seq", LongType(), False),
        StructField("path", StringType(), False),
        StructField("xml", StringType(), True),
    ]
)


class CapFeedStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.dir = options.get("path", "")
        if not self.dir:
            raise ValueError("capnz_feed_stream requires option 'path'")

    def _landed(self):
        import os

        try:
            names = os.listdir(self.dir)
        except FileNotFoundError:
            return []
        out = []
        for n in sorted(names):
            # producers land via write-temp-then-rename; dot/underscore
            # prefixes are the in-progress / metadata convention
            if n.startswith((".", "_")):
                continue
            p = os.path.join(self.dir, n)
            if os.path.isfile(p):
                out.append(p)
        return out

    def _read_files(self, paths, seq0):
        seq = seq0
        for p in paths:
            with open(p, encoding="utf-8") as f:
                for line in f:
                    line = line.rstrip("\n")
                    if line:
                        yield (seq, p, line)
                        seq += 1

    def initialOffset(self) -> dict:
        return {"files": 0, "seq": 0, "last": ""}

    def read(self, start: dict):
        import os

        files = self._landed()
        last = start.get("last")
        if last is None:
            # legacy count-based checkpoint (pre name-watermark): one
            # positional selection to upgrade, then offsets carry names
            new = files[start["files"] :]
        else:
            consumed = (
                [p for p in files if os.path.basename(p) <= last]
                if last
                else []
            )
            # count <= recorded: consumed files may be RETENTION-
            # DELETED (commit() says retention is the producer's
            # concern — deletion at-or-below the watermark is allowed
            # and never re-read, since selection is name > last).
            # count > recorded is the fatal case: a file LANDED below
            # the consumed watermark, i.e. out of lexicographic order
            # — silently skipping it would lose data forever. (A
            # deletion can mask a simultaneous out-of-order landing in
            # this count check; the watermark still guarantees the
            # late file is never half-read, only detectably absent.)
            if len(consumed) > start["files"]:
                raise RuntimeError(
                    "capnz_feed_stream: landed-file log mutated under "
                    f"the checkpoint — {len(consumed)} files sort <= the "
                    f"consumed watermark {last!r} but the offset recorded "
                    f"only {start['files']} consumed. A producer landed "
                    "a file out of lexicographic order below the "
                    "watermark; the replayability contract requires "
                    "monotone-named landings (timestamp-prefixed, "
                    "write-temp-then-rename)."
                )
            new = [p for p in files if os.path.basename(p) > last]
        if not new:
            return iter([]), dict(start)
        rows = list(self._read_files(new, start["seq"]))
        end = {
            "files": start["files"] + len(new),
            "seq": start["seq"] + len(rows),
            "last": os.path.basename(new[-1]),
            # the explicit batch file list: readBetweenOffsets replays
            # EXACTLY these, independent of anything landed since
            "batch": [os.path.basename(p) for p in new],
        }
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        import os

        # crash replay: identical rows for an identical offset range —
        # the end offset names its batch files explicitly, so the replay
        # set is exact regardless of later landings (legacy count-only
        # offsets fall back to positional slicing of the sorted listing)
        batch = end.get("batch")
        start_last = start.get("last")
        if batch is not None and start_last is not None:
            if start_last:
                batch = [n for n in batch if n > start_last]
            paths = [os.path.join(self.dir, n) for n in batch]
        else:
            # legacy count-based offset on either end: positional slice
            paths = self._landed()[start["files"] : end["files"]]
        return self._read_files(paths, start["seq"])

    def commit(self, end: dict) -> None:
        pass  # landed files are retained; retention is the producer's


class CapFeedStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "capnz_feed_stream"

    def schema(self):
        return STREAM_SCHEMA

    def simpleStreamReader(self, schema):
        return CapFeedStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(CapFeedStreamSource)
