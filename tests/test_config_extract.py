"""S3 config schema/defaults + T8 permissive read + T1-T4 edge cases."""

import pytest
from pyspark.sql import functions as F

from etl_capnz_spark.config import Environment
from etl_capnz_spark.operators.extract import (
    extract_feed_links,
    read_alerts_permissive,
)


def test_environment_defaults_and_headers():
    env = Environment.from_env(
        {
            "RSS_URL": "https://alerts.metservice.com/cap/rss",
            "Headers": [{"key": "User-Agent", "value": "etl"}],
        }
    )
    assert env.timeout_ms == 30000 and env.retries == 2  # task.ts:16,20
    assert env.headers == {"User-Agent": "etl"}


def test_environment_requires_rss_url():
    with pytest.raises(ValueError):
        Environment.from_env({})


def test_environment_schema_document():
    schema = Environment.schema()
    assert schema["required"] == ["RSS_URL"]
    assert schema["properties"]["Timeout"]["default"] == 30000


def test_permissive_read_isolates_corrupt_records(spark, tmp_path):
    p = tmp_path / "alerts.json"
    p.write_text(
        '{"identifier": "A", "sender": "s"}\n'
        "THIS IS NOT JSON\n"
        '{"identifier": "B", "sender": "s"}\n'
    )
    df = read_alerts_permissive(
        spark,
        str(p),
        "identifier string, sender string, _corrupt_record string",
    )
    ids = sorted(r["identifier"] for r in df.collect())
    assert ids == ["A", "B"]  # bad record dropped, batch survives


class TestFeedLinks:
    def _links(self, spark, body):
        df = spark.createDataFrame([(body,)], "body string")
        return sorted(r["link"] for r in extract_feed_links(df).collect())

    def test_rss_and_atom_union_dedup(self, spark):
        body = (
            "<link>https://x.nz/cap/1.xml</link>"
            "<link>https://x.nz/cap/1.xml</link>"  # duplicate
            '<link rel="alt" href="https://x.nz/atom/alert-2"/>'
            "<link>https://x.nz/news/3</link>"  # not a CAP link
        )
        assert self._links(spark, body) == [
            "https://x.nz/atom/alert-2",
            "https://x.nz/cap/1.xml",
        ]

    def test_link_over_1000_chars_not_matched(self, spark):
        # ReDoS length bound is observable semantics (task.ts:563)
        long_link = "https://x.nz/cap/" + "a" * 1000
        assert self._links(spark, f"<link>{long_link}</link>") == []

    def test_trim_and_alert_substring(self, spark):
        body = "<link>  https://x.nz/warnings/alert-weather  </link>"
        assert self._links(spark, body) == [
            "https://x.nz/warnings/alert-weather"
        ]
