"""Generate sf1.0 scale-evidence data (VERDICT r7 item 2).

The driver ships sf0.001/0.01/0.1 only; the 100 TB story needs at least
one measured 10x step beyond bench scale. This script builds
``/root/repo/.scale/sf1.0`` (git-ignored) as an EXACT 10x replication of
the driver's sf0.1 tables with disjoint key strides, so every
distribution, selectivity, group cardinality and skew profile is
preserved by construction — each replica i shifts every KEY column by
``i * stride`` where stride is a power of ten above that key's max:

* region/nation: fixed dimensions, copied once (the real generator
  keeps them constant across sf too).
* customer/supplier/part/orders/lineitem: all keys shifted
  consistently, so FK joins land exactly as in sf0.1 (10 disjoint
  sub-stars; join fan-outs and group sizes identical per replica).
* events: event_id/user_id shifted (user domain grows 10x, per-user
  history shape unchanged); ts kept — event volume densifies the same
  time window, which is how stream volume actually grows.
* documents: doc_id shifted; replica i>0 gets a ``' r<i>'`` text suffix
  so cross-replica EXACT duplicates aren't minted (the planted
  duplicate structure within each replica is preserved; the dedup
  families scale 10x like-for-like).
* embeddings: vec_id shifted; replica i>0 perturbs coordinate 0 by
  i*1e-3 to avoid 10-way exact-tie degeneracy in top-k.

Schema-driven: non-key columns pass through by name, so the script
tracks the driver's actual (TPC-H-ish, slimmed) schemas.

Usage: python tools/gen_scale.py [out_dir] [src_dir] [factor]
"""
from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# key column -> the table whose stride governs it (FK consistency)
KEY_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
FIXED = {"region", "nation"}


def _stride(con, path: str, col: str) -> int:
    mx = con.execute(
        f"SELECT max({col}) FROM read_parquet('{path}')"
    ).fetchone()[0]
    if mx is None:  # empty source table: any stride works (0 rows copied)
        return 10
    s = 10
    while s <= mx:
        s *= 10
    return s


def generate(out_dir: str, src: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    paths = {t: f"{src}/{t}.parquet" for t in TABLES}

    strides: dict[tuple[str, str], int] = {}
    for owner, col in set(KEY_OWNER.values()):
        strides[(owner, col)] = _stride(con, paths[owner], col)

    rep = f"(SELECT unnest(range({factor})) AS _i)"
    for t in TABLES:
        out = f"{out_dir}/{t}.parquet"
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{paths[t]}')"
            ).fetchall()
        ]
        if t in FIXED:
            q = f"SELECT * FROM read_parquet('{paths[t]}')"
        else:
            sel = []
            for c in cols:
                if c in KEY_OWNER:
                    s = strides[KEY_OWNER[c]]
                    sel.append(f"{c} + _i * {s} AS {c}")
                elif t == "documents" and c == "text":
                    sel.append(
                        "CASE WHEN _i = 0 THEN text "
                        "ELSE text || ' r' || _i END AS text"
                    )
                elif t == "documents" and c == "n_chars":
                    sel.append(
                        "CASE WHEN _i = 0 THEN n_chars "
                        "ELSE n_chars + 2 + length(_i::VARCHAR) "
                        "END AS n_chars"
                    )
                elif t == "embeddings" and c == "embedding":
                    sel.append(
                        "CASE WHEN _i = 0 THEN embedding "
                        "ELSE list_concat("
                        "[(embedding[1] + _i * 0.001)::FLOAT], "
                        "embedding[2:]) END AS embedding"
                    )
                else:
                    sel.append(c)
            q = (
                f"SELECT {', '.join(sel)} "
                f"FROM read_parquet('{paths[t]}'), {rep}"
            )
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {out}", flush=True)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1.0"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(out, src, factor)
