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


def robots_rules(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """Parse fetched ``robots.txt`` bodies into per-host rules for the
    universal agent (``User-agent: *`` groups only — a production crawler
    matches its own token first; same plan shape).

    Output: (host, rule, path_prefix) with rule ∈ {'allow','disallow'},
    one row per directive; empty-path ``Disallow:`` lines (meaning
    "allow all") are dropped. Pure split/explode/regex — map-only.

    The grouping rule follows the robots exclusion protocol: directives
    apply to the most recent ``User-agent`` line(s) above them. We track
    group membership with a running count of user-agent lines
    (a window over line position per host — the only non-map step, and
    it partitions by host, the same key everything else uses).
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias(
            "line_no", "line"
        ),
    ).select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_replace("line", r"#.*$", ""))).alias("l"),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = lines.withColumn(
        "_grp",
        F.sum(
            F.when(F.col("l").rlike(r"^user-agent\s*:"), 1).otherwise(0)
        ).over(w),
    )
    star_groups = (
        grouped.filter(F.col("l").rlike(r"^user-agent\s*:\s*\*$"))
        .select("host", "_grp")
        .distinct()
    )
    directives = grouped.filter(
        F.col("l").rlike(r"^(allow|disallow)\s*:")
    ).select(
        "host",
        "_grp",
        F.regexp_extract("l", r"^(allow|disallow)\s*:", 1).alias("rule"),
        F.trim(F.regexp_extract("l", r"^(?:allow|disallow)\s*:(.*)$", 1))
        .alias("path_prefix"),
    )
    return (
        directives.join(star_groups, ["host", "_grp"])
        .filter(F.col("path_prefix") != "")
        .select("host", "rule", "path_prefix")
    )


def robots_filter(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop frontier URLs a host's robots rules disallow.

    Longest-match semantics (the modern interpretation, per Google's
    robots.txt spec): among all rules whose path_prefix is a prefix of
    the URL's path, the LONGEST wins; 'allow' wins ties. No matching
    rule → allowed.

    Shape: rules join on host (rules are tiny per host — broadcast), a
    prefix test per (url, rule) pair, then one max_by per url. The
    frontier is never shuffled when the rules side broadcasts.
    """
    path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    fr = frontier.withColumn("_path", path)
    matched = fr.join(F.broadcast(rules), host_col, "left").withColumn(
        "_hit",
        F.col("path_prefix").isNotNull()
        & F.col("_path").startswith(F.col("path_prefix")),
    )
    # winner per url: longest matching prefix, allow beating disallow on
    # equal length (struct max: (len, is_allow))
    verdict = (
        matched.groupBy(host_col, url_col, "_path")
        .agg(
            F.max(
                F.when(
                    F.col("_hit"),
                    F.struct(
                        F.length("path_prefix").alias("l"),
                        (F.col("rule") == "allow").cast("int").alias("a"),
                    ),
                )
            ).alias("_win"),
        )
        .filter(
            F.col("_win").isNull()  # no rule matched -> allowed
            | (F.col("_win.a") == 1)  # winner is an allow
        )
        .select(host_col, url_col)
    )
    return frontier.join(verdict, [host_col, url_col], "left_semi")


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
