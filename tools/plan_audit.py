"""Physical-plan audit over EVERY contract entry: flags the two
plan-level scale-killers the repo bans globally — CartesianProduct
(all-pairs joins; broadcast 1-row totals plan as
BroadcastNestedLoopJoin and are allowed) and BatchEvalPython
(row-at-a-time Python UDFs; Arrow kernels plan as
ArrowEvalPython/MapInPandas/FlatMapGroupsInPandas and are allowed).
test_plans.py pins ~30 entries by hand; this sweeps all of them and
records plan_audit.json (exchange counts included as the shuffle
budget readout).

    python tools/plan_audit.py            # all entries, sf0.01
    python tools/plan_audit.py name ...   # subset
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import __spark_entry__ as entrymod  # noqa: E402
from etl_capnz_spark.session import get_session  # noqa: E402


def main() -> None:
    spark = get_session("plan-audit", master="local[8]", shuffle_partitions=8)
    sf = os.environ.get("SPARK_GRAFT_CONTRACT_SF_DIR", "/root/testdata/sf0.01")
    qs = entrymod.queries()
    only = set(sys.argv[1:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    out = {"sf": sf, "entries": {}, "flagged": []}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # planning failure is itself a finding
            out["entries"][name] = {"error": str(e)[:200]}
            out["flagged"].append(name)
            print(f"  {name}: PLAN-ERROR {str(e)[:120]}", flush=True)
            continue
        cart = plan.count("CartesianProduct")
        # BatchEvalPythonUDTF is the sanctioned polymorphic-UDTF
        # surface (SURVEY 2.11); only the scalar row-at-a-time node
        # (plain BatchEvalPython) is banned
        rowudf = len(re.findall(r"BatchEvalPython(?!UDTF)", plan))
        exch = plan.count("Exchange ")
        rec = {"cartesian": cart, "row_python_udf": rowudf, "exchanges": exch}
        out["entries"][name] = rec
        if cart or rowudf:
            out["flagged"].append(name)
            print(f"  {name}: ** FLAGGED ** {rec}", flush=True)
    out["n_entries"] = len(out["entries"])
    out["n_flagged"] = len(out["flagged"])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "plan_audit.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"PLAN AUDIT: {out['n_entries']} entries, "
        f"{out['n_flagged']} flagged -> plan_audit.json"
    )
    spark.stop()
    sys.exit(1 if out["flagged"] else 0)


if __name__ == "__main__":
    main()
