"""The end-to-end CAP pipeline — the engine analog of the reference's
``control()`` (SURVEY.md §3.3), as a lazily-composed DataFrame plan.

Stages (all narrow until the sink):

  feed snapshots → link extraction (T1-T4) → [fetch (S2)] → XML parse (X1)
  → permissive flatten + required filter (T5/T7) → expiry filter (T6)
  → feature fan-out (F1-F3, C1-C9, G1-G5) → GeoJSON sink (S4)

Entry points mirror the reference's three (SURVEY.md §3):
  * library API: ``CapPipeline(spark, env).features_from_xml(df)``
  * batch runner over landed snapshots: ``run_batch``
  * the streaming wrapper lives in streaming/stream.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_capnz_spark.config import Environment
from etl_capnz_spark.operators.extract import (
    active_filter,
    extract_feed_links,
    required_filter,
)
from etl_capnz_spark.operators.features import build_features
from etl_capnz_spark.sources.http import fetch_urls
from etl_capnz_spark.sources.xml import parse_cap_xml


class CapPipeline:
    def __init__(self, spark: SparkSession, env: Environment):
        self.spark = spark
        self.env = env

    def links(self, feed_bodies: DataFrame, body_col: str = "body") -> DataFrame:
        """Feed text → distinct CAP alert URLs (T1-T4)."""
        return extract_feed_links(feed_bodies, body_col)

    def fetch(self, urls: DataFrame) -> DataFrame:
        """Fan-out fetch of alert documents (S2) with the env's retry
        contract. Off the correctness path in tests (network)."""
        return fetch_urls(
            urls,
            headers=self.env.headers,
            timeout_ms=self.env.timeout_ms,
            retries=self.env.retries,
        )

    def alerts_from_xml(self, xml_docs: DataFrame, xml_col: str = "xml") -> DataFrame:
        """CAP XML → typed alert rows, timestamps parsed, invalid dropped."""
        alerts = parse_cap_xml(xml_docs, xml_col)
        return (
            alerts.withColumn("sent_ts", F.try_to_timestamp(F.col("sent")))
            .withColumn("onset_ts", F.try_to_timestamp(F.nullif(F.col("onset"), F.lit(""))))
            .withColumn(
                "expires_ts", F.try_to_timestamp(F.nullif(F.col("expires"), F.lit("")))
            )
        )

    def features(self, alerts: DataFrame, now=None) -> DataFrame:
        """Active alerts → feature rows. ``now`` injectable for
        deterministic tests; defaults to wall clock like the reference
        (task.ts:636).

        ``required_filter`` also drops alerts whose ``sent`` failed
        timestamp parsing — the reference throws in
        ``new Date(sent).toISOString()`` during feature build and the
        per-alert catch skips the alert (task.ts:670, 876-878)."""
        now_col = F.current_timestamp() if now is None else F.lit(now).cast("timestamp")
        return build_features(active_filter(required_filter(alerts), now_col))

    def features_from_xml(
        self, xml_docs: DataFrame, xml_col: str = "xml", now=None
    ) -> DataFrame:
        return self.features(self.alerts_from_xml(xml_docs, xml_col), now=now)


def run_batch(
    spark: SparkSession,
    env: Environment,
    snapshot_path: str,
    out_path: str,
    now=None,
) -> None:
    """Batch entry point: landed XML snapshots (one doc per file/line) →
    newline-delimited GeoJSON features at ``out_path``."""
    from etl_capnz_spark.sinks.geojson import write_features

    pipe = CapPipeline(spark, env)
    xml_docs = spark.read.text(snapshot_path).withColumnRenamed("value", "xml")
    write_features(pipe.features_from_xml(xml_docs, now=now), out_path)
