"""Golden fixtures for the feature fan-out quirks (SURVEY.md §5.2 item 2,
§7 'hard parts'): C6 stripped blank line + kept 'Description: ' line, C8
opacity asymmetry, F1 id suffixing, F3 parse-failure fallthrough, loop
abort after first poisoned polygon."""

import pytest
from pyspark.sql import functions as F

from etl_capnz_spark.operators.features import build_features

ALERT_SCHEMA = (
    "identifier string, sender string, sent_ts timestamp, status string,"
    "msg_type string, scope string, category string, event string,"
    "urgency string, severity string, certainty string, sender_name string,"
    "headline string, description string, instruction string,"
    "response_type string, onset_ts timestamp, expires_ts timestamp,"
    "web string, area_desc string, polygons array<string>, circle string,"
    "parameters array<struct<value_name:string,value:string>>,"
    "x509_certificate string"
)

BASE = dict(
    identifier="ID1",
    sender="met",
    sent_ts="2026-08-01 00:00:00",
    status="Actual",
    msg_type="Alert",
    scope="Public",
    category="Met",
    event="strongWind",
    urgency="",
    severity="Severe",
    certainty="Likely",
    sender_name="MetService",
    headline="Strong Wind Watch",
    description="",
    instruction="",
    response_type="",
    onset_ts=None,
    expires_ts=None,
    web="",
    area_desc="Zone",
    polygons=[],
    circle="",
    parameters=[],
    x509_certificate=None,
)


def _features(spark, **overrides):
    import datetime

    row = {**BASE, **overrides}
    for ts in ("sent_ts", "onset_ts", "expires_ts"):
        if isinstance(row[ts], str):
            row[ts] = datetime.datetime.fromisoformat(row[ts])
    df = spark.createDataFrame([tuple(row.values())], ALERT_SCHEMA)
    return {r["feature_id"]: r for r in build_features(df).collect()}


def test_remarks_quirks(spark):
    out = _features(spark)
    remarks = out["ID1"]["remarks"]
    lines = remarks.split("\n")
    # empty description still yields its prefix line WITH trailing space
    assert lines[0] == "Description: "
    assert lines[1] == "Instruction: "
    # Unknown fallbacks for empty urgency/response
    assert "Urgency: Unknown" in lines
    assert "Response: Unknown" in lines
    # category/event resolved through C1/C2 maps
    assert "Category: Meteorological (including flood)" in lines
    assert "Event: Strong Wind" in lines


def test_signature_block_has_no_blank_separator(spark):
    import base64

    cert = base64.b64encode(
        b"SEQ CN=TestCA, O=TestOrg, C=NZ 240101000000Z 270101000000Z"
    ).decode()
    out = _features(spark, x509_certificate=cert)
    remarks = out["ID1"]["remarks"]
    # the built '' separator is stripped by the trim-filter (task.ts:706/713)
    assert "\n\n" not in remarks
    assert "Digital Signature\nName: TestOrg\nIssuer: TestCA" in remarks
    assert "Valid Until: 2027-01-01" in remarks


def test_multi_polygon_ids_and_centers(spark):
    out = _features(
        spark, polygons=["0,10 1,10 1,11 0,11", "5,20 6,20 6,21 5,21"]
    )
    assert set(out) == {"ID1-0", "ID1-0-center", "ID1-1", "ID1-1-center"}
    assert out["ID1-0"]["geom_type"] == "Polygon"
    assert out["ID1-0-center"]["is_center"] is True
    c = out["ID1-0-center"]
    assert (c["lon"], c["lat"]) == (10.5, 0.5)


def test_single_polygon_no_suffix(spark):
    out = _features(spark, polygons=["0,10 1,10 1,11 0,11"])
    assert set(out) == {"ID1", "ID1-center"}


def test_loop_abort_then_fallback(spark):
    # valid polygon emits, then the poisoned one aborts → NZ fallback point
    # with the SAME id as the alert (task.ts:776-796)
    out = _features(
        spark, polygons=["0,10 1,10 1,11 0,11", "91,0 0,10 1,11"]
    )
    assert set(out) == {"ID1-0", "ID1-0-center", "ID1"}
    fb = out["ID1"]
    assert (fb["lon"], fb["lat"]) == (174.0, -41.0)


def test_poisoned_first_polygon_suppresses_rest(spark):
    out = _features(
        spark, polygons=["91,0 0,10 1,11", "0,10 1,10 1,11 0,11"]
    )
    # loop aborts on index 0 → nothing but the fallback point
    assert set(out) == {"ID1"}


def test_circle_and_fallback_points(spark):
    out = _features(spark, circle="-41.5,174.5 30")
    assert out["ID1"]["geom_type"] == "Point"
    assert (out["ID1"]["lon"], out["ID1"]["lat"]) == (174.5, -41.5)
    out2 = _features(spark, circle="-41.5,174.5 -1")  # invalid radius
    assert (out2["ID1"]["lon"], out2["ID1"]["lat"]) == (174.0, -41.0)


def test_style_asymmetry(spark):
    params = [("ColourCodeHex", "#336699")]
    poly = _features(
        spark, polygons=["0,10 1,10 1,11 0,11"], parameters=params
    )
    p, c = poly["ID1"], poly["ID1-center"]
    assert (p["stroke_opacity"], p["fill_opacity"]) == (0.5, 0.4)
    assert p["icon"] is None
    # centroid feature: icon but NO style at all
    assert c["stroke"] is None and c["stroke_opacity"] is None
    assert c["icon"] is not None
    pt = _features(spark, circle="-41,174 5", parameters=params)["ID1"]
    assert pt["stroke_opacity"] == pytest.approx(0.5019607843137255)
    assert pt["fill_opacity"] == pytest.approx(0.5019607843137255)


def test_ring_under_4_points_emits_nothing(spark):
    # pre-closed 3-point ring stays length 3 (<4) → silently skipped,
    # no fallback (task.ts:656: no throw, no feature)
    out = _features(spark, polygons=["0,10 0,11 0,10"])
    assert set(out) == set()


def test_undecodable_cert_takes_catch_defaults(spark):
    """atob failure path (task.ts:507-515): issuer 'cap.metservice.com',
    fingerprint 'Unknown' — but the signature block still renders."""
    out = _features(spark, x509_certificate="!!!not-base64-at-all!!!")
    remarks = out["ID1"]["remarks"]
    assert "Issuer: cap.metservice.com" in remarks
    assert "Fingerprint: Unknown" in remarks
    assert "Name: METEOROLOGICAL SERVICE OF NEW ZEALAND LIMITED" in remarks


def test_unparseable_sent_drops_alert(spark):
    """A non-empty but unparseable <sent> passes parseXML but throws in
    new Date().toISOString() during feature build → the per-alert catch
    skips the whole alert (task.ts:670, 876-878). Engine equivalent:
    to_timestamp null → required filter drops it."""
    from etl_capnz_spark.config import Environment
    from etl_capnz_spark.plans.pipeline import CapPipeline
    from tests.test_sources import CAP_XML

    bad = CAP_XML.replace(
        "<sent>2026-08-01T00:00:00+00:00</sent>", "<sent>not a date</sent>"
    )
    docs = spark.createDataFrame([(bad,)], "xml string")
    pipe = CapPipeline(spark, Environment(rss_url="x"))
    feats = pipe.features_from_xml(docs, now="2026-08-13 00:00:00")
    assert feats.count() == 0


def test_callsign_fallback_and_links(spark):
    out = _features(spark, headline="", web="https://x.nz/a.xml")
    f = out["ID1"]
    assert f["callsign"] == "CAP Alert"
    assert f["link_uid"] == "ID1" and f["link_url"] == "https://x.nz/a.xml"
