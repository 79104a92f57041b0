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
