"""Merge two bench.py JSON outputs (sf0.1 and sf1.0, same host, run
back-to-back) into BENCH_sf1.json with per-query scaling exponents
(VERDICT r7 item 2).

exponent = log(t_hi / t_lo) / log(sf_hi / sf_lo); 1.0 = linear in data
volume, ~0 = domain-bound (fixed-size group/dimension work dominates),
>1 flagged super-linear for triage. Iteration-fixed-cost queries
(graph rounds, LR epochs) legitimately sit between 0 and 1 at this
scale because JVM/stage fixed overhead still dominates at sf0.1.

Usage: python tools/scale_report.py <lo.json> <hi.json> [out.json]
"""
from __future__ import annotations

import json
import math
import sys


def main(lo_path: str, hi_path: str, out_path: str) -> None:
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    ratio_sf = hi["sf"] / lo["sf"]
    qexp = {}
    for q, t_hi in hi["queries"].items():
        t_lo = lo["queries"].get(q)
        if not t_lo:
            continue
        exp = math.log(t_hi / t_lo) / math.log(ratio_sf)
        qexp[q] = {
            "sec_lo": t_lo,
            "sec_hi": t_hi,
            "ratio": round(t_hi / t_lo, 3),
            "exponent": round(exp, 3),
        }
    superlinear = sorted(
        (q for q, v in qexp.items() if v["exponent"] > 1.1),
        key=lambda q: -qexp[q]["exponent"],
    )
    out = {
        "metric": "scale_evidence",
        "sf_lo": lo["sf"],
        "sf_hi": hi["sf"],
        "total_sec_lo": lo["value"],
        "total_sec_hi": hi["value"],
        "total_exponent": round(
            math.log(hi["value"] / lo["value"]) / math.log(ratio_sf), 3
        ),
        "host_factor_lo": lo.get("host_factor"),
        "host_factor_hi": hi.get("host_factor"),
        "queries": qexp,
        "superlinear": superlinear,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in (
        "total_sec_lo", "total_sec_hi", "total_exponent", "superlinear"
    )}))


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json",
    )
