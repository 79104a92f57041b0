"""Driver simulation: exercises __spark_entry__ exactly as the round driver does."""
import os, sys, time, hashlib, datetime
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('SPARK_GRAFT_CPUS','8')
import duckdb
import __spark_entry__ as mod
from etl_capnz_spark.session import get_session

spark = get_session('driver-sim', master='local[8]', shuffle_partitions=8)

# t1 smoke: entry at sf0.001, rows >= 0, stable schema
t0=time.time()
df = mod.entry(spark)
n = df.count()
schema1 = df.schema.json()
df2 = mod.entry(spark)
assert df2.schema.json() == schema1, 'schema unstable across calls'
print(f'T1 SMOKE: entry rows={n} stable-schema=True elapsed={time.time()-t0:.1f}s')

# t2 correctness at sf0.01 vs duckdb oracle (override dir with
# SPARK_GRAFT_CONTRACT_SF_DIR for scale passes, e.g. .scale/sf1.0)
sf = os.environ.get('SPARK_GRAFT_CONTRACT_SF_DIR', '/root/testdata/sf0.01')
con = duckdb.connect()
for t in 'region nation customer supplier part orders lineitem events documents embeddings'.split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(v):
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    if hasattr(v, 'asDict'): return tuple(norm(x) for x in v)
    if isinstance(v, dict): return tuple(norm(x) for x in v.values())
    if isinstance(v, list): return tuple(norm(x) for x in v)
    if isinstance(v, float): return round(v, 9)
    return v

qs, os_ = mod.queries(), mod.oracle_sql()
only = set(sys.argv[1:])
if only:
    unknown = only - set(qs)
    assert not unknown, f'unknown query names: {sorted(unknown)}'
    qs = {k: v for k, v in qs.items() if k in only}
fails = 0
for name, fn in qs.items():
    t0=time.time()
    qdf = fn(spark, sf)
    cols = sorted(qdf.columns)
    raw = qdf.collect()
    # Faithful driver-canonicalizer probe: the round driver does
    # pandas.sort_values over every output column before hashing; a
    # list/dict cell raises "unhashable type" there (CORRECTNESS_r02,
    # tpch_order_lines). Reproduce that exact path on the raw values.
    try:
        import pandas as _pd
        _pdf = _pd.DataFrame([[r[c] for c in cols] for r in raw], columns=cols)
        if len(_pdf):
            _pdf.sort_values(by=cols)
    except Exception as e:
        print(f'  {name}: ** CANONICALIZER-UNSAFE ** {type(e).__name__}: {e}')
        fails += 1
        continue
    srows = sorted([tuple(norm(r[c]) for c in cols) for r in raw], key=repr)
    if name not in os_:
        print(f'  {name}: rows-only n={len(srows)} ({time.time()-t0:.1f}s)'); continue
    res = con.execute(os_[name]); dcols = [d[0] for d in res.description]
    idx = [dcols.index(c) for c in cols]
    drows = sorted([tuple(norm(row[i]) for i in idx) for row in res.fetchall()], key=repr)
    ok = (sorted(dcols) == cols) and (srows == drows)
    h = hashlib.md5(repr(srows).encode()).hexdigest()[:8]
    print(f'  {name}: {"MATCH" if ok else "** MISMATCH **"} rows={len(srows)} hash={h} ({time.time()-t0:.1f}s)')
    if not ok:
        fails += 1
        for s,d in zip(srows, drows):
            if s != d: print('   spark:', repr(s)[:160], '\n   duck :', repr(d)[:160]); break
print(f'T2 CORRECTNESS: {len(qs)-fails}/{len(qs)} match')
spark.stop()
sys.exit(1 if fails else 0)
