"""Golden tests for HTML main-text extraction (operators/html.py):
hand-built pages with nav/footer chrome, scripts, comments, entities,
and nested markup — the adversarial shapes the line-density rule and
block-drop regexes must survive (VERDICT r2 item 3)."""

from pyspark.sql import functions as F

from etl_capnz_spark.operators.html import (
    decode_entities,
    extract_main_text,
    main_text,
    strip_tags,
)

PAGE = """<html><head>
<title>My Page</title>
<style>
body { color: red; }
</style>
<script src="a.js"></script>
</head>
<body>
<nav class="top"><a href="/">Home</a> | <a href="/x">Products</a></nav>
<header><h1>Welcome</h1></header>
<!-- analytics
tracking comment -->
<div id="main">
<p>This is the first real paragraph of body content here.</p>
<p>The second paragraph has <b>nested <i>inline</i> markup</b> and keeps going with more words.</p>
<p>Short teaser</p>
<ul><li>One</li><li>Two</li></ul>
<p>Entities: &amp; &lt;x&gt; &quot;q&quot; &#39;s&#39; and several more words follow here.</p>
</div>
<script>
var x = "<p>not content</p>";
</script>
<aside>Related links sidebar</aside>
<footer>(c) 2026 Corp | Privacy | Terms</footer>
</body></html>"""


def _one(spark, col_expr, value):
    return spark.createDataFrame([(value,)], "html string").select(
        col_expr.alias("out")
    ).collect()[0]["out"]


def test_main_text_keeps_prose_drops_chrome(spark):
    out = _one(spark, main_text(F.col("html")), PAGE)
    lines = out.split("\n")
    assert lines[0] == "This is the first real paragraph of body content here."
    assert (
        lines[1]
        == "The second paragraph has nested inline markup and keeps going"
        " with more words."
    )
    assert lines[2] == 'Entities: & <x> "q" \'s\' and several more words follow here.'
    assert len(lines) == 3
    # chrome and non-text payloads are gone entirely
    for bad in ("Home", "Welcome", "var x", "color: red", "Privacy",
                "Related links", "tracking", "Short teaser", "One"):
        assert bad not in out


def test_strip_tags_block_boundaries_become_newlines(spark):
    out = _one(
        spark,
        strip_tags(F.col("html")),
        "<div><p>alpha beta</p><p>gamma</p></div>",
    )
    assert [l.strip() for l in out.split("\n") if l.strip()] == [
        "alpha beta",
        "gamma",
    ]


def test_entity_decode_amp_last(spark):
    # &amp;lt; must become the literal text "&lt;", never "<"
    out = _one(spark, decode_entities(F.col("html")), "a &amp;lt; b &lt; c")
    assert out == "a &lt; b < c"


def test_unclosed_script_drops_remainder_not_crash(spark):
    # a script block with no closing tag: the block-drop regex cannot
    # match (non-greedy needs the terminator), so the tag strip handles
    # the tags and the inline payload stays subject to the line gate
    html = "<p>good line with at least five words</p><script>var a=1;"
    out = _one(spark, main_text(F.col("html")), html)
    assert out == "good line with at least five words"


def test_extract_main_text_audit_columns(spark):
    df = spark.createDataFrame([(1, PAGE), (2, "<nav>Home | About</nav>")],
                               "doc_id int, html string")
    out = {r["doc_id"]: r for r in
           extract_main_text(df, "html", "text").collect()}
    assert out[1]["n_lines_kept"] == 3
    assert 0 < out[1]["extract_ratio"] < 1
    # chrome-only page: empty text, zero lines, ratio 0
    assert out[2]["text"] == ""
    assert out[2]["n_lines_kept"] == 0
    assert out[2]["extract_ratio"] == 0.0


def test_extraction_is_map_only(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id int, html string")
    plan = (
        extract_main_text(df, "html", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_extract_links_order_and_attrs(spark):
    from etl_capnz_spark.operators.html import extract_links

    html = ('<a href="/a">1</a> <a class="z" href="/b">2</a>'
            " <a name=x>no href</a> <ahref='/bogus'>")
    out = _one(spark, extract_links(F.col("html")), html)
    assert list(out) == ["/a", "/b"]


def test_chunk_tokens_overlap_and_tail(spark):
    from etl_capnz_spark.operators.text import chunk_tokens

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "   "), (4, "x")],
        "doc_id int, text string",
    )
    rows = sorted(
        chunk_tokens(df, "text", "doc_id", window=4, stride=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    got = [
        (r["doc_id"], r["chunk_idx"], r["start"], r["chunk_text"],
         r["n_chunk_tokens"])
        for r in rows
    ]
    assert got == [
        (1, 0, 0, "a b c d", 4),
        (1, 1, 2, "c d e f", 4),
        (1, 2, 4, "e f g", 3),    # final partial kept
        (1, 3, 6, "g", 1),
        (4, 0, 0, "x", 1),        # single-token doc -> one chunk
    ]  # empty/whitespace docs produce zero chunks


def test_chunk_tokens_rejects_bad_params(spark):
    import pytest

    from etl_capnz_spark.operators.text import chunk_tokens

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_tokens(df, "text", "doc_id", window=0, stride=2)
    with pytest.raises(ValueError):
        chunk_tokens(df, "text", "doc_id", window=4, stride=0)


def test_line_trim_never_eats_index_digits(spark):
    """sf1.0 sweep catch (round 9): F.transform(lines, F.trim) bound
    the ARITY-2 form trim(element, index) — each kept line had its own
    line-INDEX digits trimmed off its edges (latent through seven
    rounds because no sf0.01 line ever started/ended with its own
    index digit; a replica-suffixed doc text ending 'r2' on line index
    2 surfaced it at sf1.0). Pin: edge digits that EQUAL the line
    index must survive."""
    from etl_capnz_spark.operators.html import extract_main_text

    # line index 2 of the stripped text is the doc paragraph; make it
    # END with '2' and START with '2' — both edges must survive
    html = (
        "<html><body><nav><a href='/'>x</a></nav>"
        "<p>2 quick brown foxes jumped over row key r2</p>"
        "<p>another line with at least five words here</p>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = extract_main_text(df, "html", "text", min_words=5).collect()[0]
    lines = out["text"].split("\n")
    assert lines[0] == "2 quick brown foxes jumped over row key r2"
