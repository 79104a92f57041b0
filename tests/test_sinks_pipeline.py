"""S4/S5 sinks + the end-to-end batch pipeline (SURVEY.md §3.3)."""

import json
import os

from pyspark.sql import functions as F

from etl_capnz_spark.config import Environment
from etl_capnz_spark.plans.pipeline import CapPipeline, run_batch
from etl_capnz_spark.sinks.geojson import (
    counted,
    feature_collection_json,
    feature_json,
)
from tests.test_sources import CAP_XML

NOW = "2026-08-13 00:00:00"
ENV = Environment(rss_url="https://example.nz/feed")


def _features(spark):
    xml_docs = spark.createDataFrame([(CAP_XML,)], "xml string")
    return CapPipeline(spark, ENV).features_from_xml(xml_docs, now=NOW)


def test_feature_json_shape(spark):
    rows = {r["feature_id"]: r for r in feature_json(_features(spark)).collect()}
    # polygon "0,10 1,10 1,11" closes to 4 points → polygon + center
    doc = json.loads(rows["A-1"]["feature"])
    assert doc["type"] == "Feature" and doc["id"] == "A-1"
    assert doc["geometry"]["type"] == "Polygon"
    assert doc["geometry"]["coordinates"][0][0] == [10.0, 0.0]
    props = doc["properties"]
    assert props["type"] == "a-f-X-i" and props["archived"] is False
    # ColourCode Red → #FF0000 flat props on the polygon feature
    assert props["stroke"] == "#FF0000" and props["fill-opacity"] == 0.4
    assert "links" not in props  # no web → conditional key absent
    center = json.loads(rows["A-1-center"]["feature"])
    assert center["geometry"]["type"] == "Point"
    assert "stroke" not in center["properties"]
    assert center["properties"]["icon"].startswith("bb4df0a6")


METADATA_KEYS = [
    "sender", "sent", "status", "msgType", "scope", "category", "event",
    "urgency", "severity", "certainty", "senderName", "headline",
    "description", "instruction", "responseType", "onset", "expires",
    "web", "areaDesc",
]  # task.ts:673-693 spread order

STYLE_KEYS = [
    "stroke", "stroke-opacity", "stroke-width", "stroke-style",
    "fill-opacity", "fill",
]  # task.ts:862-868 (same flat order for polygons, task.ts:723-730)


def _docs_by_id(spark, **overrides):
    import datetime
    import importlib

    golden = importlib.import_module("tests.test_features_golden")
    from etl_capnz_spark.operators.features import build_features

    row = {**golden.BASE, **overrides}
    for ts in ("sent_ts", "onset_ts", "expires_ts"):
        if isinstance(row[ts], str):
            row[ts] = datetime.datetime.fromisoformat(row[ts])
    df = spark.createDataFrame([tuple(row.values())], golden.ALERT_SCHEMA)
    return {
        r["feature_id"]: json.loads(r["feature"])
        for r in feature_json(build_features(df)).collect()
    }


def test_polygon_document_shape_golden(spark):
    """Byte-level shape parity for the polygon + centroid documents
    (task.ts:664-773): key ORDER is asserted, not just presence."""
    out = _docs_by_id(
        spark,
        polygons=["0,10 1,10 1,11 0,11"],
        parameters=[("ColourCodeHex", "#336699")],
        expires_ts="2026-09-01 00:00:00",
    )
    p = out["ID1"]["properties"]
    assert list(p.keys()) == [
        "callsign", "type", "time", "start", "stale", "metadata",
        "remarks", *STYLE_KEYS, "archived",
    ]  # flat styling, fill-opacity BEFORE fill; no icon, no style object
    assert list(p["metadata"].keys()) == METADATA_KEYS  # no isCenter
    assert p["metadata"] == {
        "sender": "met", "sent": "2026-08-01T00:00:00.000Z",
        "status": "Actual", "msgType": "Alert", "scope": "Public",
        "category": "Met", "event": "strongWind", "urgency": "",
        "severity": "Severe", "certainty": "Likely",
        "senderName": "MetService", "headline": "Strong Wind Watch",
        "description": "", "instruction": "", "responseType": "",
        "onset": "", "expires": "2026-09-01T00:00:00.000Z", "web": "",
        "areaDesc": "Zone",
    }
    assert [p[k] for k in STYLE_KEYS] == ["#336699", 0.5, 3, "solid", 0.4, "#336699"]
    c = out["ID1-center"]["properties"]
    assert list(c.keys()) == [
        "callsign", "type", "time", "start", "stale", "icon", "metadata",
        "remarks", "archived",
    ]  # centroid: icon, NO style in any form (task.ts:744-772)
    assert list(c["metadata"].keys()) == [*METADATA_KEYS, "isCenter"]
    assert c["metadata"]["isCenter"] is True


def test_point_document_nested_style_golden(spark):
    """Point-branch features nest styling under properties.style with the
    128/255 opacities (task.ts:860-868); the key is ALWAYS present —
    {} when no colour (style: baseStyle with baseStyle = {})."""
    colored = _docs_by_id(
        spark, circle="-41.5,174.5 30",
        parameters=[("ColourCodeHex", "#336699")],
    )["ID1"]["properties"]
    assert list(colored.keys()) == [
        "callsign", "type", "time", "start", "icon", "metadata", "remarks",
        "style", "archived",
    ]  # no flat stroke/fill keys on point features
    assert list(colored["style"].keys()) == STYLE_KEYS
    assert colored["style"] == {
        "stroke": "#336699", "stroke-opacity": 0.5019607843137255,
        "stroke-width": 3, "stroke-style": "solid",
        "fill-opacity": 0.5019607843137255, "fill": "#336699",
    }
    plain = _docs_by_id(spark, circle="-41.5,174.5 30")["ID1"]["properties"]
    assert plain["style"] == {}


def test_feature_collection_and_metrics(spark):
    feats = _features(spark)
    fc = json.loads(feature_collection_json(feats))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
    observed, obs = counted(feats)
    assert observed.count() == 2
    assert obs.get["n_features"] == 2


def test_run_batch_end_to_end(spark, tmp_path):
    snap = tmp_path / "snapshots"
    snap.mkdir()
    # one XML document per file (landed snapshot layout)
    (snap / "a1.xml").write_text(CAP_XML.replace("\n", " "))
    (snap / "bad.xml").write_text("<alert>broken")
    out = tmp_path / "out"
    run_batch(spark, ENV, str(snap), str(out), now=NOW)
    lines = []
    for name in os.listdir(out):
        if name.startswith("part-"):
            with open(out / name) as fh:
                lines += [json.loads(line) for line in fh if line.strip()]
    ids = {d["id"] for d in lines}
    assert ids == {"A-1", "A-1-center"}
