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
