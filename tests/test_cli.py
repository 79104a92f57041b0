"""End-to-end CLI test (etl_capnz_spark/__main__.py) — the engine twin
of the reference's local dev runner: landed CAP XML dir → parse →
filters → features → FeatureCollection document / NDJSON sink, plus
the ad-hoc `query` subcommand. Runs main() in-process with the shared
test session (no second JVM)."""

import json

from etl_capnz_spark.__main__ import main
from tests.test_sources import BROKEN_XML, CAP_XML, NO_INFO_XML


def _land(tmp_path):
    d = tmp_path / "xml"
    d.mkdir()
    # one-line-per-document text source: strip newlines inside each doc
    (d / "snap.txt").write_text(
        "\n".join(
            x.replace("\n", " ") for x in (CAP_XML, BROKEN_XML, NO_INFO_XML)
        )
    )
    return str(d)


def test_cli_run_featurecollection(spark, tmp_path):
    out = tmp_path / "fc.geojson"
    rc = main(
        [
            "run",
            _land(tmp_path),
            "--out",
            str(out),
            "--now",
            "2026-08-14 00:00:00",
        ],
        spark=spark,
    )
    assert rc == 0
    fc = json.loads(out.read_text())
    assert fc["type"] == "FeatureCollection"
    # 1 valid alert: polygon + centroid + circle-point features
    ids = [f["id"] for f in fc["features"]]
    assert any(i.startswith("A-1") for i in ids)
    assert len(fc["features"]) >= 2
    # broken + no-info docs were error-isolated, not fatal
    callsigns = {f["properties"]["callsign"] for f in fc["features"]}
    assert callsigns == {"Wind Watch"}


def test_cli_run_ndjson_dir(spark, tmp_path):
    outdir = tmp_path / "nd"
    rc = main(
        [
            "run",
            _land(tmp_path),
            "--out-dir",
            str(outdir),
            "--now",
            "2026-08-14 00:00:00",
        ],
        spark=spark,
    )
    assert rc == 0
    docs = [
        json.loads(line)
        for r in spark.read.text(str(outdir)).collect()
        for line in [r["value"]]
        if line.strip()
    ]
    assert docs and all(d["type"] == "Feature" for d in docs)


def test_cli_query_subcommand(spark, capsys):
    rc = main(
        ["query", "tpch_q1", "--sf-dir", "/root/testdata/sf0.001"],
        spark=spark,
    )
    assert rc == 0
    assert "l_returnflag" in capsys.readouterr().out
    rc = main(["query", "no_such_query"], spark=spark)
    assert rc == 2
