"""Sources: HTTP fetch retry contract (S1/S2) + CAP XML parse (X1)."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from etl_capnz_spark.sources.http import fetch_one, fetch_urls
from etl_capnz_spark.sources.xml import parse_cap_xml


@pytest.fixture(scope="module")
def http_server():
    """Loopback server: /ok → 200 body; /flaky → 500,500,200; /fail → 500."""
    hits: dict[str, int] = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            hits[self.path] = hits.get(self.path, 0) + 1
            if self.path == "/ok":
                body = b"<alert>ok</alert>"
                self.send_response(200)
            elif self.path == "/flaky" and hits[self.path] >= 3:
                body = b"finally"
                self.send_response(200)
            else:
                body = b"boom"
                self.send_response(500)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", hits
    srv.shutdown()


def test_fetch_ok(http_server):
    base, _ = http_server
    status, body, err = fetch_one(f"{base}/ok", sleep=lambda s: None)
    assert (status, body, err) == (200, "<alert>ok</alert>", None)


def test_fetch_retries_with_linear_backoff(http_server):
    base, hits = http_server
    sleeps: list[float] = []
    status, body, err = fetch_one(
        f"{base}/flaky", retries=2, sleep=sleeps.append
    )
    assert status == 200 and body == "finally" and err is None
    assert hits["/flaky"] == 3  # 2 failures + success
    assert sleeps == [1.0, 2.0]  # 1000*(attempt+1) ms, task.ts:401


def test_fetch_exhausted_reports_error(http_server):
    base, hits = http_server
    status, body, err = fetch_one(f"{base}/fail", retries=1, sleep=lambda s: None)
    assert status == -1 and body is None and "HTTPError" in err
    assert hits["/fail"] == 2


def test_fetch_urls_distributed(spark, http_server):
    base, _ = http_server
    urls = spark.createDataFrame(
        [(f"{base}/ok",), (f"{base}/missing-404ish",)], "url string"
    )
    rows = {r["url"]: r for r in fetch_urls(urls, retries=0).collect()}
    assert rows[f"{base}/ok"]["body"] == "<alert>ok</alert>"
    assert rows[f"{base}/missing-404ish"]["error"] is not None


def test_http_data_source(spark, http_server):
    """Spark 4 Python Data Source: one partition per URL, reference retry
    contract inside each partition read."""
    from etl_capnz_spark.sources import http_source

    base, _ = http_server
    http_source.register(spark)
    df = (
        spark.read.format("capnz_http")
        .option("urls", f"{base}/ok,{base}/nope")
        .option("retries", "0")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    rows = {r["url"]: r for r in df.collect()}
    assert rows[f"{base}/ok"]["body"] == "<alert>ok</alert>"
    assert rows[f"{base}/ok"]["status"] == 200
    assert rows[f"{base}/nope"]["error"] is not None


CAP_XML = """<alert xmlns="urn:oasis:names:tc:emergency:cap:1.2">
<identifier>A-1</identifier><sender>met.nz</sender>
<sent>2026-08-01T00:00:00+00:00</sent><status>Actual</status>
<msgType>Alert</msgType><scope>Public</scope>
<info><category>Met</category><event>strongWind</event>
<urgency>Expected</urgency><severity>Severe</severity>
<certainty>Likely</certainty><headline>Wind Watch</headline>
<description>desc</description>
<area><areaDesc>Z1</areaDesc><polygon>0,10 1,10 1,11</polygon>
<circle>-41,174 20</circle></area>
<parameter><valueName>ColourCode</valueName><value>Red</value></parameter>
</info>
<Signature><KeyInfo><X509Data><X509Certificate>QUJD</X509Certificate></X509Data></KeyInfo></Signature>
</alert>"""

BROKEN_XML = "<alert><identifier>oops"  # unparseable
NO_INFO_XML = "<alert><identifier>B</identifier><sender>s</sender><sent>t</sent></alert>"


@pytest.mark.parametrize("fallback", [False, True])
def test_parse_cap_xml_both_paths(spark, fallback):
    df = spark.createDataFrame(
        [(CAP_XML,), (BROKEN_XML,), (NO_INFO_XML,)], "xml string"
    )
    rows = parse_cap_xml(df, "xml", force_fallback=fallback).collect()
    # broken + info-less records are dropped (task.ts:427-434, 549-552)
    assert len(rows) == 1
    a = rows[0]
    assert a["identifier"] == "A-1"
    assert a["msg_type"] == "Alert"
    assert a["polygons"] == ["0,10 1,10 1,11"]
    assert a["circle"] == "-41,174 20"
    assert a["parameters"] == [("ColourCode", "Red")]
    assert a["x509_certificate"] == "QUJD"
    assert a["instruction"] == ""  # missing → '' (task.ts:444)


def test_parse_cap_xml_multi_polygon(spark):
    xml = CAP_XML.replace(
        "<circle>-41,174 20</circle>",
        "<polygon>5,20 6,20 6,21</polygon>",
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    rows = parse_cap_xml(df, "xml").collect()
    assert rows[0]["polygons"] == ["0,10 1,10 1,11", "5,20 6,20 6,21"]


def test_parse_cap_xml_pruned_fields_match_full(spark):
    """Projection pushdown into from_xml (fields=) must change ONLY the
    set of output columns: values and drop semantics identical to the
    full parse (broken + info-less docs still dropped)."""
    df = spark.createDataFrame(
        [(CAP_XML,), (BROKEN_XML,), (NO_INFO_XML,)], "xml string"
    )
    want = ["identifier", "category", "polygons", "parameters"]
    pruned = parse_cap_xml(df, "xml", fields=want).collect()
    full = parse_cap_xml(df, "xml").collect()
    assert len(pruned) == len(full) == 1
    assert set(pruned[0].asDict()) == {"xml", *want}
    for c in want:
        assert pruned[0][c] == full[0][c]


def test_parse_cap_xml_unknown_field_rejected(spark):
    df = spark.createDataFrame([(CAP_XML,)], "xml string")
    with pytest.raises(ValueError):
        parse_cap_xml(df, "xml", fields=["identifier", "nope"])


def test_variant_open_schema_extraction_semantics(spark):
    """Spark 4 VARIANT (events_props_variant entry): one parse_json
    encode, typed path extraction with NULL-on-missing/unparseable
    (never an error), nested paths and array indexing — the
    open-schema twin of the declared-schema from_json path."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ('{"k": 7, "b": {"c": "x"}, "arr": [10, 20]}',),
            ('{"k": 2.5}',),
            ("not json",),
            (None,),
        ],
        "props string",
    )
    out = df.select(
        F.try_parse_json("props").alias("v")
    ).select(
        F.try_variant_get("v", "$.k", "double").alias("k"),
        F.try_variant_get("v", "$.b.c", "string").alias("c"),
        F.try_variant_get("v", "$.arr[1]", "int").alias("arr1"),
        F.try_variant_get("v", "$.missing", "string").alias("missing"),
        F.col("v").isNull().alias("bad"),
    ).collect()
    assert (out[0]["k"], out[0]["c"], out[0]["arr1"]) == (7.0, "x", 20)
    assert out[0]["missing"] is None and out[0]["bad"] is False
    assert out[1]["k"] == 2.5 and out[1]["c"] is None
    # unparseable and NULL inputs isolate to NULL variants, no error
    assert out[2]["bad"] is True and out[3]["bad"] is True
    assert all(r["k"] is None for r in out[2:])
