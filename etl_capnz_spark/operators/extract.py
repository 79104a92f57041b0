"""Feed-text extraction and record filters T1-T8 (SURVEY.md §2.2).

All pure Catalyst expressions; the regex length bounds ``{1,1000}`` from the
reference (ReDoS guards, task.ts:563/572) are kept verbatim — they are part
of the observable semantics (an oversize link is simply not matched).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RSS_LINK_RE = "<link>([^<]{1,1000})</link>"  # task.ts:563
ATOM_LINK_RE = "<link[^>]+href=[\"']([^\"']{1,1000})[\"'][^>]*>"  # task.ts:572


def is_cap_alert_link(link: Column) -> Column:
    """T3 (task.ts:555-557)."""
    return link.contains("/cap/") | link.contains("alert")


def extract_feed_links(df: DataFrame, body_col: str = "body") -> DataFrame:
    """T1+T2+T3+T4: feed body text → one row per distinct CAP alert URL.

    RSS matches and Atom matches are concatenated (array concat ==
    UNION ALL), trimmed, filtered by the CAP-link predicate, then
    deduplicated. The reference preserves first-seen order via a JS Set
    (task.ts:580); order is semantically irrelevant downstream (each URL is
    fetched independently), so the engine uses an unordered ``distinct`` —
    a partial+final hash aggregate, shuffle only on the (tiny) link column.
    """
    body = F.col(body_col)
    links = F.concat(
        F.regexp_extract_all(body, F.lit(RSS_LINK_RE), 1),
        F.regexp_extract_all(body, F.lit(ATOM_LINK_RE), 1),
    )
    exploded = df.select(F.explode(links).alias("link")).select(
        F.trim(F.col("link")).alias("link")
    )
    return exploded.filter(is_cap_alert_link(F.col("link"))).distinct()


def required_filter(df: DataFrame) -> DataFrame:
    """T5: drop alerts missing info / identifier / sender / sent.

    The reference returns null from parseXML when ``<info>`` is absent or
    identifier/sender/sent are empty (task.ts:427-434) and the caller skips
    (task.ts:632-634). On the flattened alert table: ``has_info`` boolean +
    non-empty required strings. Runs as a pushed-down predicate.
    """
    cond = (
        (F.col("identifier") != "")
        & (F.col("sender") != "")
        & F.col("sent_ts").isNotNull()
    )
    if "has_info" in df.columns:
        cond = F.col("has_info") & cond
    return df.filter(cond)


def active_filter(df: DataFrame, now: str | Column) -> DataFrame:
    """T6: drop expired alerts (task.ts:636-639).

    ``expires_ts`` NULL (absent/unparseable — JS NaN compares false) → kept.
    ``now`` is injected for determinism; production passes
    ``F.current_timestamp()``.
    """
    now_col = F.lit(now).cast("timestamp") if isinstance(now, str) else now
    return df.filter(
        F.col("expires_ts").isNull() | (F.col("expires_ts") >= now_col)
    )


def with_defaults(df: DataFrame, cols: list[str]) -> DataFrame:
    """T7: coalesce every CAP string field to '' (task.ts:420-448)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    return out


def read_alerts_permissive(spark, path: str, schema) -> DataFrame:
    """T8: PERMISSIVE parse with corrupt-record isolation.

    One bad record never kills the batch (task.ts:549-552, 876-878): parse
    errors land in ``_corrupt_record`` and are filtered out, mirroring the
    reference's try/catch-and-continue.
    """
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if "_corrupt_record" in df.columns:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df
