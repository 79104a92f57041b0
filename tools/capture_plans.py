"""Capture .explain('formatted') for headline queries into plans/$PLANS_ROUND
(default r10).

Usage: python tools/capture_plans.py before|after [query ...]
Analysis-only (no execution) — safe to run alongside other work.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import __spark_entry__ as mod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r10"),
)
os.makedirs(out_dir, exist_ok=True)

spark = get_session("capture-plans", master="local[4]", shuffle_partitions=8)
qs = mod.queries()
names = only or [n for n in HEADLINE if n in qs]
for name in names:
    df = qs[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"{name}: {path} ({plan.count('Exchange')} Exchange refs)")
spark.stop()
