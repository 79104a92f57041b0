"""Driver-environment robustness: the round driver may hand queries() a
SparkSession built with BARE defaults (no engine builder). Every entry
point re-asserts its runtime confs (session.ensure_session_confs) and
read_table normalizes physical-type drift (TIMESTAMP(NANOS) → bigint,
naive micros → TIMESTAMP_NTZ). This test runs the historically
type-sensitive queries in a subprocess whose session sets NONE of the
engine confs — exactly the failure mode that broke events_range_join when
the testdata generator switched events.ts to naive timestamp[us]."""

import os
import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("bare")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as mod

sf = {sf!r}
for name in ["events_range_join", "events_asof", "events_tumbling",
             "cap_timestamps", "cap_nz_local"]:
    n = mod.queries()[name](spark, sf).count()
    assert n > 0, name
print("BARE_OK")
"""


def test_sensitive_queries_survive_bare_session(sf_dir):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = SCRIPT.format(repo=repo, sf=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BARE_OK" in proc.stdout
