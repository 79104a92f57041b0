"""Fluent Pipeline API (etl_capnz_spark/pipeline.py) — SURVEY §3.3
entry point (c): the chain must be lazy (one plan, no action until a
sink), immutable, and value-identical to the underlying operators."""

import json

from etl_capnz_spark.pipeline import Pipeline
from tests.test_sources import BROKEN_XML, CAP_XML, NO_INFO_XML

NOW = "2026-08-14 00:00:00"


def _land(tmp_path):
    d = tmp_path / "xml"
    d.mkdir()
    (d / "snap.txt").write_text(
        "\n".join(
            x.replace("\n", " ") for x in (CAP_XML, BROKEN_XML, NO_INFO_XML)
        )
    )
    return str(d)


def test_feed_to_feature_collection(spark, tmp_path):
    fc = json.loads(
        Pipeline.from_feed(spark, _land(tmp_path))
        .active(NOW)
        .to_features()
        .to_feature_collection()
    )
    assert fc["type"] == "FeatureCollection"
    assert {f["properties"]["callsign"] for f in fc["features"]} == {
        "Wind Watch"
    }


def test_chain_is_lazy_and_immutable(spark, tmp_path):
    p1 = Pipeline.from_feed(spark, _land(tmp_path))
    p2 = p1.active(NOW)
    p3 = p2.to_features()
    # distinct wrappers, distinct plans
    assert p1 is not p2 and p2 is not p3
    assert p1.df is not p2.df
    # lazy: building the chain ran no job; the full chain is ONE plan
    plan = p3.df._jdf.queryExecution().executedPlan().toString()
    assert "Scan" in plan


def test_from_alerts_matches_entry_flagship(spark):
    import __spark_entry__ as entrymod

    alerts = entrymod._active(spark, "/root/testdata/sf0.001")
    via_api = (
        Pipeline.from_alerts(alerts).deduplicated(0.85).to_features().df
    )
    assert via_api.count() == entrymod.entry(spark).count()


def test_submit_raises_on_unreachable(spark, tmp_path):
    import pytest

    p = Pipeline.from_feed(spark, _land(tmp_path)).active(NOW).to_features()
    with pytest.raises(RuntimeError, match="submit failed"):
        p.submit("http://127.0.0.1:9/nope", retries=1)


def test_deduplicated_removes_planted_near_dups(spark):
    """The flagship dedup stage must actually REMOVE duplicates: plant
    clusters of alerts with identical text under different ids (the
    re-fetched-feed shape) plus distinct alerts, and verify one
    representative (the min id, via connected components) survives per
    cluster while distinct alerts all survive. (Alert texts here are
    only 7-11 words, so a single-token edit legitimately falls BELOW
    the 0.85 Jaccard bar — the verify stage keeping such pairs apart
    is the point of the threshold; exact copies are the unambiguous
    planted signal.)"""
    import __spark_entry__ as entrymod

    base = entrymod._active(spark, "/root/testdata/sf0.001").limit(6)
    rows = base.collect()
    planted = []
    for ci, r in enumerate(rows[:2]):
        for j in range(3):
            d = r.asDict()
            d["k"] = 1_000_000 + ci * 10 + j
            planted.append(d)
    for r in rows[2:]:
        planted.append(r.asDict())
    alerts = spark.createDataFrame(planted, base.schema)

    from etl_capnz_spark.pipeline import Pipeline

    kept = (
        Pipeline.from_alerts(alerts)
        .deduplicated(0.85)
        .df.select("k")
        .collect()
    )
    kept_ks = sorted(r["k"] for r in kept)
    distinct_ks = sorted(r["k"] for r in rows[2:])
    # each planted cluster collapses to its min id
    assert 1_000_000 in kept_ks and 1_000_010 in kept_ks
    for gone in (1_000_001, 1_000_002, 1_000_011, 1_000_012):
        assert gone not in kept_ks
    # distinct alerts untouched
    for k in distinct_ks:
        assert k in kept_ks
    assert len(kept_ks) == 2 + len(distinct_ks)
