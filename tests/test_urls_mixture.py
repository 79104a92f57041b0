"""Edge pins for URL canonicalization and temperature mixture sampling."""

from pyspark.sql import functions as F

from etl_capnz_spark.operators.sampling import temperature_mixture
from etl_capnz_spark.operators.urls import normalize_url


def _norm(spark, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(normalize_url(F.col("url")).alias("n"))
        .collect()[0]["n"]
    )


def test_normalize_url_cases(spark):
    cases = {
        # case + default port + fragment + unsorted params
        "HTTP://Example.COM:80/a/b?z=9&a=1#frag":
            "http://example.com/a/b?a=1&z=9",
        # https default port, empty path
        "https://CDN.Net:443": "https://cdn.net/",
        # trailing & produces an empty param that must drop
        "http://x.org/p?b=2&a=1&": "http://x.org/p?a=1&b=2",
        # non-default port kept; non-http scheme keeps ANY port
        "http://x.org:8080/p": "http://x.org:8080/p",
        "ftp://files.org:21/x": "ftp://files.org:21/x",
        # already canonical: fixpoint
        "http://example.com/a/b?a=1&z=9": "http://example.com/a/b?a=1&z=9",
        # no query, no port
        "https://a.b/c": "https://a.b/c",
        # '?' INSIDE the fragment is fragment content, not a query
        # (ADVICE r3: must not resurrect as '?x=1')
        "http://h.com/p#sec?x=1": "http://h.com/p",
        # real query + a fragment that also contains '?'
        "http://h.com/p?b=2&a=1#sec?x=9": "http://h.com/p?a=1&b=2",
    }
    for raw, want in cases.items():
        assert _norm(spark, raw) == want, raw
    # non-URL strings → null
    assert _norm(spark, "not a url") is None
    assert _norm(spark, "/relative/path") is None


def test_normalize_url_idempotent(spark):
    df = spark.createDataFrame(
        [("HTTP://A.COM:80/x?b=2&a=1#f",), ("https://B.net:443",)],
        "url string",
    )
    once = df.select(normalize_url(F.col("url")).alias("url"))
    twice = once.select(normalize_url(F.col("url")).alias("url"))
    assert once.collect() == twice.collect()


def test_temperature_mixture_shape(spark, sf_dir):
    from etl_capnz_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = temperature_mixture(docs, "doc_id", "source", target_rows=100)
    rows = out.collect()
    # roughly the target (hash sampling is binomial around the rate)
    assert 50 <= len(rows) <= 200
    # temperature weighting: every source with >= a handful of docs is
    # represented (sqrt up-weights the small ones)
    n_sources = docs.select("source").distinct().count()
    got_sources = {r["source"] for r in rows}
    assert len(got_sources) == n_sources
    # deterministic: same salt, same sample
    again = temperature_mixture(docs, "doc_id", "source", target_rows=100)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in rows
    )
    # small sources keep a HIGHER fraction than large ones
    frac = {
        r["source"]: r["kept"] / r["n"]
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"))
        .join(
            out.groupBy("source").agg(F.count("*").alias("kept")), "source"
        )
        .collect()
    }
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    smallest = min(sizes, key=sizes.get)
    largest = max(sizes, key=sizes.get)
    if sizes[smallest] * 4 <= sizes[largest]:  # only when sizes differ enough
        assert frac[smallest] > frac[largest]


def test_bigram_perplexity_flags_gibberish(spark):
    """A doc of corpus-typical bigrams scores LOWER perplexity than a
    doc of transitions never seen in training — the quality-gate
    property (CCNet-style LM filtering)."""
    from pyspark.sql import functions as F  # noqa: F401

    from etl_capnz_spark.operators.text import bigram_lm_perplexity

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the dog sat on the mat"),
        # gibberish: words exist, transitions don't
        (4, "mat the on sat cat the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in bigram_lm_perplexity(df, "text", "doc_id").collect()
    }
    assert got[1]["n_bigrams"] == 5
    assert got[4]["perplexity"] > got[1]["perplexity"] * 1.3
    assert got[1]["perplexity"] > 0


def test_bigram_perplexity_drops_sub_two_token_docs(spark):
    from etl_capnz_spark.operators.text import bigram_lm_perplexity

    df = spark.createDataFrame(
        [(1, "hello world again"), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    got = bigram_lm_perplexity(df, "text", "doc_id").collect()
    assert {r["doc_id"] for r in got} == {1}


def test_bm25_matches_pure_python_reference(spark):
    """BM25 scores pinned EXACTLY (to the 6dp the operator publishes)
    against a from-scratch pure-Python Okapi implementation on a tiny
    corpus — formula, idf variant, length normalization, and top-k
    tie-break all verified independently of SQL."""
    import math

    from etl_capnz_spark.operators.text import bm25_search

    corpus = {
        1: "red fox jumps",
        2: "red red dog",
        3: "blue fox sleeps all day long",
        4: "cat",
    }
    k1, b = 1.2, 0.75
    docs_tok = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in docs_tok.values()) / n

    def ref_scores(query):
        out = {}
        for d, toks in docs_tok.items():
            s = 0.0
            for term in set(query.split()):
                tf = toks.count(term)
                if not tf:
                    continue
                df = sum(term in t for t in docs_tok.values())
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
            if s:
                out[d] = round(s, 6)
        return out

    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id int, text string"
    )
    queries = spark.createDataFrame(
        [(1, "red fox"), (2, "cat day")], "query_id int, query string"
    )
    got = {}
    for r in bm25_search(
        docs, "text", "doc_id", queries, k1=k1, b=b, top_k=10
    ).collect():
        got.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    assert got[1] == ref_scores("red fox")
    assert got[2] == ref_scores("cat day")
    # doc 2 (tf=2 for 'red') must outrank doc 1 (tf=1) on query 1? No —
    # saturation + shorter-doc norm decide; just pin the ranking order
    # emitted equals the reference's sort.
    ranked = sorted(
        ref_scores("red fox").items(), key=lambda kv: (-kv[1], kv[0])
    )
    got_ranked = [
        (r["doc_id"], r["score"])
        for r in sorted(
            bm25_search(
                docs, "text", "doc_id", queries, k1=k1, b=b, top_k=10
            )
            .filter("query_id = 1")
            .collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got_ranked == ranked
