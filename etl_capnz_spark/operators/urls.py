"""URL canonicalization (north-star extension, SURVEY.md §2.12).

The crawl-hygiene twin of operators/html.py: before URL-level dedup or
frontier scheduling, syntactically-different URLs naming the same
resource must collapse — ``HTTP://Example.com:80/a?b=2&a=1#frag`` and
``http://example.com/a?a=1&b=2`` are one page. Without this, a crawl
frontier re-fetches duplicates and URL-keyed dedup undercounts.

Rules (the conservative, loss-free subset of RFC 3986 normalization):

* scheme and host lowercased (case-insensitive by spec),
* default ports dropped (``:80`` for http, ``:443`` for https),
* empty path → ``/``,
* query parameters sorted bytewise (``&``-split; empty params dropped),
* fragment removed (never sent to the server).

Pure regex/split/sort expressions — portable to the DuckDB oracle
(regexp_extract + list_sort), map-only at any scale, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
# anchored before any '#': a '?' that first appears inside the fragment
# is fragment content, not a query (ADVICE r3 — '/p#sec?x=1' has no query)
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def normalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL column; null for
    strings that don't parse as ``scheme://host...``."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: p != F.lit(""))
    )
    qs = F.array_join(params, "&")
    normalized = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (hostport != ""), normalized)
