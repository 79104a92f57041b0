"""Plan-audit regression net (round-8 continuation): the recorded
sweep artifact (plan_audit.json, tools/plan_audit.py) must cover EVERY
contract entry with zero flags — a new entry forces a re-run because
the count pins — and a live sample re-audits representative entries
each suite run so the two banned plan shapes (CartesianProduct,
row-at-a-time BatchEvalPython) cannot creep back between sweeps."""
import json
import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_recorded_plan_audit_is_complete_and_clean():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "se", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(ROOT, "plan_audit.json")) as f:
        audit = json.load(f)
    assert audit["n_flagged"] == 0, audit["flagged"]
    missing = set(mod.queries()) - set(audit["entries"])
    assert not missing, (
        f"entries missing from plan_audit.json (re-run "
        f"tools/plan_audit.py): {sorted(missing)}"
    )


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q9",
        "dedup_minhash",
        "dedup_lsh_capped",
        "knn_srp",
        "entity_golden",
        "ml_ndcg",
        "ml_auc_exact",
        "text_bm25",
        "graph_walks",
        "events_decayed_counts",
        "privacy_randomized_response",
        "token_oov_rate",
    ],
)
def test_live_plan_audit_sample(spark, sf_dir, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "se", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert not re.findall(r"BatchEvalPython(?!UDTF)", plan), name
