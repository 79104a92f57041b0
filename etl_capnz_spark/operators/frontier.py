"""Crawl-frontier selection with per-host politeness (north-star
extension, SURVEY.md §2.12 — VERDICT r3 item 2).

The missing operator between the link graph (operators/html.py
``extract_links``) and the streaming ingest
(streaming/stream.py ``crawl_ingest_stream``): given the candidate URLs
discovered so far, decide WHAT to fetch next without hammering any one
host. The reference's own fetch loop is the semantic ancestor — it
fetches its feed list sequentially, one request at a time
(``/root/reference`` ``task.ts:626-630``); at 50 B documents that
per-host courtesy becomes this operator.

Semantics per scheduling round:

* candidates are ranked within each host by (priority DESC, url ASC) —
  priority is typically the inlink count from the link graph;
* at most ``k_per_host`` URLs per host are selected (the politeness
  budget for the round);
* each selected URL gets ``fetch_rank`` (1-based within its host) and
  ``not_before_ms = (fetch_rank - 1) * delay_ms`` — the earliest fetch
  offset from the round's start, so requests to one host are spaced
  ``delay_ms`` apart while different hosts proceed in parallel.

Scale shape: ONE shuffle on host (the window partition key). Politeness
is per-host state, so host-partitioning is the natural layout — the
same partitioning a fetch executor wants. A pathological host with
hundreds of millions of discovered URLs would make that window's sort a
straggler; ``pre_salt`` bounds it with the standard two-phase top-k:
rank within (host, salt) first, keep k per sub-group, then rank the
≤ k·pre_salt survivors per host. Both phases are rank-filters, so the
result is identical to the single-phase form (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_capnz_spark.operators.urls import _HOSTPORT_RE


def url_host(col: Column) -> Column:
    """Lowercased host[:port] of an absolute URL — the politeness key.
    Port kept: crawl etiquette is per-authority, and two ports on one
    box are rare enough that merging them would only over-throttle."""
    return F.lower(F.regexp_extract(col, _HOSTPORT_RE, 1))


def frontier_select(
    frontier: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    priority_col: str = "priority",
    k_per_host: int = 10,
    delay_ms: int = 1000,
    pre_salt: int | None = None,
) -> DataFrame:
    """Politeness-capped frontier selection for one scheduling round.

    Returns (host, url, priority, fetch_rank, not_before_ms) — at most
    ``k_per_host`` rows per host, ranked by (priority DESC, url ASC),
    with per-host request spacing of ``delay_ms``.

    ``pre_salt=N`` enables the two-phase top-k for hot hosts (see module
    doc): identical output, bounded per-task sort size.
    """
    order = [F.desc(priority_col), F.asc(url_col)]
    base = frontier.select(host_col, url_col, priority_col)
    if pre_salt is not None:
        sub = Window.partitionBy(
            host_col,
            F.crc32(F.col(url_col).cast("string")) % pre_salt,
        ).orderBy(*order)
        base = (
            base.withColumn("_sub_rank", F.row_number().over(sub))
            .filter(F.col("_sub_rank") <= k_per_host)
            .drop("_sub_rank")
        )
    w = Window.partitionBy(host_col).orderBy(*order)
    return (
        base.withColumn("fetch_rank", F.row_number().over(w))
        .filter(F.col("fetch_rank") <= k_per_host)
        .withColumn(
            "not_before_ms",
            ((F.col("fetch_rank") - 1) * delay_ms).cast("bigint"),
        )
    )


def build_frontier(
    outlinks: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Candidate URLs for the next round: normalize (operators/urls),
    drop everything already crawled (left-anti on the normalized form —
    syntactic variants of a fetched page must not re-enter), and score
    priority = number of distinct LINKING PAGES (not raw anchor count:
    one page linking 50× is one vote). Emits (url, host, priority).

    ``outlinks``: (src, url) — one row per anchor, absolute URLs.
    ``crawled``: one column of already-fetched URLs (any syntax).

    Shape: normalize is map-only; the anti-join and the count agg both
    hash on the normalized url. The crawled side at 50 B pages is the
    big side — keep it as the build side of neither: this is a shuffle
    join on purpose (both sides huge), bucketable on url at rest.
    """
    from etl_capnz_spark.operators.urls import normalize_url

    src_col = [c for c in outlinks.columns if c != url_col][0]
    cand = outlinks.select(
        F.col(src_col).alias("_src"),
        normalize_url(F.col(url_col)).alias("_u"),
    ).filter(F.col("_u").isNotNull())
    seen = crawled.select(
        normalize_url(F.col(crawled.columns[0])).alias("_u")
    ).filter(F.col("_u").isNotNull())
    return (
        cand.join(seen, "_u", "left_anti")
        .groupBy("_u")
        .agg(F.count_distinct("_src").alias("priority"))
        .select(
            F.col("_u").alias("url"),
            url_host(F.col("_u")).alias("host"),
            "priority",
        )
    )
