"""FULL-contract sf1.0 sweep (VERDICT r8 next-round #4): promote the
round-8 45-entry scale sample to the standing net — every contract
entry runs Spark-vs-DuckDB at 10× bench scale (the q9 catch proved
small-sf green is not scale green).

Orchestration: entries run in CHUNKED drive_contract subprocesses
(one Spark JVM per chunk, amortized startup) with a wall-clock budget
per chunk; a chunk that exceeds its budget is killed and its
unreported entries re-run INDIVIDUALLY with a per-entry budget, so one
runaway DuckDB oracle can never eat the sweep. Entries whose oracle is
known single-node-infeasible at sf1.0 are skipped with their triage
note carried into the artifact (the oracle ENGINE is the bottleneck,
not the Spark plan — each is MATCH at sf0.01).

    python tools/scale_contract_sweep.py [--resume] [--chunk 12]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.path.join(ROOT, ".scale", "sf1.0")
OUT = os.path.join(ROOT, "SCALE_SF1_CONTRACT.json")

# oracle-side single-node exclusions, each MATCH at sf0.01 (triage
# notes preserved verbatim in the artifact)
EXCLUSIONS = {
    "dedup_lsh_capped": (
        "DuckDB oracle side exceeded 60 min (banded candidate volume "
        "on the single-node oracle engine); MATCH at sf0.01"
    ),
    "graph_clustering_coeff": (
        "DuckDB oracle spilled >80 GB temp / timed out (triangle "
        "enumeration on the single-node oracle); MATCH at sf0.01 — "
        "the oracle engine, not the Spark plan, is the single-node "
        "bottleneck at this scale"
    ),
}

# known-heavy entries run ALONE with a larger budget so a slow-but-
# finishing entry neither blocks a chunk nor gets a false timeout
HEAVY = {
    "dedup_minhash": 1800,
    "cap_features": 1200,
    "cap_polygon_simplify": 1200,
    "dedup_cross": 1800,
    "dedup_jaccard": 1800,
    "dedup_setsim": 1800,
    "dedup_containment": 1800,
    "dedup_winnow_pairs": 1800,
    "dedup_snm": 1800,
    "entity_golden": 1800,
    "graph_triangles": 1800,
    "knn_srp": 1800,
    "knn_pq": 2400,
    "knn_ivfpq": 2400,
    "knn_pq_indexed": 1800,
    "knn_ivfpq_indexed": 1800,
    "knn_kmeans_cells": 1200,
    "dedup_semantic": 1800,
    "knn_ivf": 1200,
    "knn_brute": 1800,
    "text_winnow": 1200,
    "decontaminate": 1200,
    "quality_lr_pipeline": 1800,
    "text_lr_train": 1200,
    "graph_walks": 1200,
}

LINE = re.compile(
    r"^\s*(\w+): (MATCH|MISMATCH|rows-only)"
    r"(?: rows=(\d+))?(?: n=(\d+))?(?: hash=([0-9a-f]+))?"
    r" \(([\d.]+)s\)"
)


def parse_lines(text: str) -> dict:
    got = {}
    for raw in text.replace("\r", "\n").splitlines():
        m = LINE.match(raw)
        if m:
            name, status, rows, n, h, sec = m.groups()
            got[name] = {
                "status": status if status != "rows-only" else "ROWS_ONLY",
                "rows": int(rows or n or 0),
                "hash": h,
                "sec": float(sec),
            }
    return got


def run_chunk(names: list[str], budget: int) -> tuple[dict, bool]:
    env = dict(
        os.environ,
        SPARK_GRAFT_CONTRACT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS="8",
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "drive_contract.py"), *names],
            capture_output=True,
            text=True,
            timeout=budget,
            env=env,
            cwd=ROOT,
        )
        return parse_lines(proc.stdout + proc.stderr), False
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"")
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return parse_lines(out), True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=12)
    ap.add_argument("--chunk-budget", type=int, default=2400)
    ap.add_argument("--entry-budget", type=int, default=900)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--workers", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as mod

    all_names = list(mod.queries())
    prior = {}
    if args.resume and os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f).get("entries", {})

    entries: dict = dict(prior)
    todo = [
        n
        for n in all_names
        if n not in EXCLUSIONS and entries.get(n, {}).get("status")
        not in ("MATCH", "ROWS_ONLY")
    ]
    heavy = [n for n in todo if n in HEAVY]
    light = [n for n in todo if n not in HEAVY]

    def record(got: dict) -> None:
        entries.update(got)
        flush()

    def flush() -> None:
        n_match = sum(
            1 for v in entries.values() if v.get("status") == "MATCH"
        )
        n_rows = sum(
            1 for v in entries.values() if v.get("status") == "ROWS_ONLY"
        )
        n_bad = sum(
            1
            for v in entries.values()
            if v.get("status") not in ("MATCH", "ROWS_ONLY")
        )
        art = {
            "sf_dir": SF_DIR
            + " (exact 10x key-strided replication of sf0.1; tools/gen_scale.py)",
            "scope": "FULL contract sweep (round 9); prior rounds sampled 45",
            "n_entries_total": len(all_names),
            "n_match": n_match,
            "n_rows_only": n_rows,
            "n_mismatch_or_timeout": n_bad,
            "oracle_infeasible_at_sf1": EXCLUSIONS,
            "entries": entries,
        }
        with open(OUT, "w") as f:
            json.dump(art, f, indent=1)

    # chunks run CONCURRENTLY (each is its own local[8] JVM; the
    # 32-cpu host takes `--workers` of them side by side — a serial
    # sweep at sf1.0 costs 3-4 h of wall, mostly single-chunk idle)
    import threading
    from concurrent.futures import ThreadPoolExecutor

    lock = threading.Lock()

    def record_locked(got: dict) -> None:
        with lock:
            record(got)

    t0 = time.time()

    def do_light_chunk(i: int) -> None:
        chunk = light[i : i + args.chunk]
        got, timed_out = run_chunk(chunk, args.chunk_budget)
        record_locked(got)
        missing = [n for n in chunk if n not in got]
        if missing:
            print(
                f"chunk[{i}] {'TIMEOUT' if timed_out else 'incomplete'}: "
                f"re-running {len(missing)} individually",
                flush=True,
            )
            for n in missing:
                g, to = run_chunk([n], args.entry_budget)
                if n not in g:
                    g = {
                        n: {
                            "status": "TIMEOUT" if to else "ERROR",
                            "sec": float(args.entry_budget),
                        }
                    }
                record_locked(g)
        with lock:
            done = sum(
                1
                for v in entries.values()
                if v.get("status") in ("MATCH", "ROWS_ONLY")
            )
        print(
            f"[{time.time()-t0:.0f}s] {done}/{len(all_names)} green",
            flush=True,
        )

    def do_heavy(n: str) -> None:
        g, to = run_chunk([n], HEAVY[n])
        if n not in g:
            g = {
                n: {
                    "status": "TIMEOUT" if to else "ERROR",
                    "sec": float(HEAVY[n]),
                }
            }
        record_locked(g)
        print(
            f"[{time.time()-t0:.0f}s] heavy {n}: {g[n]['status']}",
            flush=True,
        )

    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        futs = [
            pool.submit(do_light_chunk, i)
            for i in range(0, len(light), args.chunk)
        ]
        futs += [pool.submit(do_heavy, n) for n in heavy]
        for f in futs:
            f.result()
    flush()
    bad = {
        k: v
        for k, v in entries.items()
        if v.get("status") not in ("MATCH", "ROWS_ONLY")
    }
    print(f"SWEEP DONE in {time.time()-t0:.0f}s; non-green: {bad}")


if __name__ == "__main__":
    main()
