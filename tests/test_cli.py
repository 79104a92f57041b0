"""End-to-end CLI test (etl_capnz_spark/__main__.py) — the engine twin
of the reference's local dev runner: landed CAP XML dir → parse →
filters → features → FeatureCollection document / NDJSON sink, plus
the ad-hoc `query` subcommand. Runs main() in-process with the shared
test session (no second JVM)."""

import json

from etl_capnz_spark.__main__ import main
from tests.test_sources import BROKEN_XML, CAP_XML, NO_INFO_XML


def _land(tmp_path):
    """Default layout: one multi-line CAP XML document per FILE — the
    shape a real snapshot dir has (ADVICE r3: line-based reading of these
    silently yielded zero features)."""
    d = tmp_path / "xml"
    d.mkdir()
    for i, x in enumerate((CAP_XML, BROKEN_XML, NO_INFO_XML)):
        (d / f"snap{i}.xml").write_text(x)
    return str(d)


def _land_per_line(tmp_path):
    """Compact landing: one document per LINE (the --per-line layout)."""
    d = tmp_path / "xml_lines"
    d.mkdir()
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


def test_cli_run_per_line_layout(spark, tmp_path):
    """--per-line reads the compact one-document-per-line landing and
    produces the same features as the per-file default."""
    out = tmp_path / "fc_lines.geojson"
    rc = main(
        [
            "run",
            _land_per_line(tmp_path),
            "--per-line",
            "--out",
            str(out),
            "--now",
            "2026-08-14 00:00:00",
        ],
        spark=spark,
    )
    assert rc == 0
    fc = json.loads(out.read_text())
    assert any(f["id"].startswith("A-1") for f in fc["features"])
    assert len(fc["features"]) >= 2
