"""Scaling probe for the crawl-ingest stages added in round 3:
HTML main-text extraction → link extraction → URL normalization →
token-window chunking. All four are map-only regexp/HOF pipelines, so
the probe's claim is linear scaling with RISING throughput (amortized
JIT/scan overheads), the same evidence shape as scale_probe.py.

Each factor unions N shifted copies of documents wrapped in the same
synthetic crawl-page template the contract queries use. Usage:

    python tools/crawl_scale_probe.py [factors ...]   # default 1 4 16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from etl_capnz_spark.operators.html import (  # noqa: E402
    extract_links,
    extract_main_text,
)
from etl_capnz_spark.operators.text import chunk_tokens  # noqa: E402
from etl_capnz_spark.operators.urls import normalize_url  # noqa: E402
from etl_capnz_spark.session import get_session, read_table  # noqa: E402


def wrap(docs):
    d = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><style>b{}</style></head><body>"),
        F.lit('<nav><a href="/">Home</a> | <a href="/x">X</a></nav>'),
        F.lit('<header><h1>Site</h1></header><div><p>'),
        F.col("text"),
        F.lit('</p><p>See <a href="HTTP://Example.com:80/doc/'),
        d,
        F.lit('?b=2&a=1#f">link</a> for details and more words here</p>'),
        F.lit("</div><script>var x=1;</script><footer>(c)</footer>"),
        F.lit("</body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


def blow_up(docs, n: int):
    parts = [
        docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
        )
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("crawl-scale-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(32)
        .cache()
    )
    base.count()

    def run(docs):
        pages = wrap(docs)
        extracted = extract_main_text(pages, "html", "text")
        n_lines = extracted.agg(F.sum("n_lines_kept")).collect()[0][0]
        links = pages.select(
            F.explode(extract_links(F.col("html"))).alias("url")
        ).select(normalize_url(F.col("url")).alias("u"))
        n_urls = links.filter(F.col("u").isNotNull()).distinct().count()
        chunks = chunk_tokens(extracted, "text", "doc_id", 128, 64)
        n_chunks = chunks.count()
        return n_lines, n_urls, n_chunks

    for n in factors:
        docs = blow_up(base, n).cache()
        n_docs = docs.count()
        run(docs)  # warmup
        t0 = time.time()
        n_lines, n_urls, n_chunks = run(docs)
        dt = time.time() - t0
        print(
            f"factor={n} docs={n_docs} lines={n_lines} urls={n_urls} "
            f"chunks={n_chunks} seconds={dt:.2f} "
            f"docs_per_sec={n_docs / dt:.0f}",
            flush=True,
        )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
