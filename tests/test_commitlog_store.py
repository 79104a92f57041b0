"""PointerStore seam (round 9, pre-landing VERDICT r8's round-10 (e)):
the commit objects (version pointer / epoch ledger / manifest / lease /
schema history) resolve through a pluggable store, and the SAME sink
disciplines run on S3 semantics — atomic whole-object PUT,
if-none-match create, etag-conditional delete, NO rename — via
MemoryObjectStore. Three layers of evidence:

1. store-contract tests over BOTH backends (round-trip, etag churn,
   if-none-match, conditional delete exact/stale);
2. lease correctness on the object backend: single winner under thread
   contention, expiry break, and the CAS property the file backend can
   only approximate — a stale-etag break can never kill a FRESH lease;
3. a crash-matrix sample (snapshot × all four ordering points, ledger,
   manifest) running end-to-end with DEFAULT_STORE swapped to
   MemoryObjectStore — reader isolation + replay convergence hold with
   no rename primitive anywhere in the commit path.
"""

import threading
import time

import pytest

#: slow tier (pytest.ini): object-store crash matrix (~2 min)
pytestmark = pytest.mark.slow

from etl_capnz_spark.streaming import commitlog
from etl_capnz_spark.streaming.commitlog import (
    FilePointerStore,
    ManifestLog,
    MemoryObjectStore,
)

from tests.test_commitlog_matrix import (
    SINKS,
    _arm,
    _land,
    _run,
    _run_expect_crash,
)


@pytest.fixture(params=["file", "memory"])
def store(request, tmp_path):
    if request.param == "file":
        return FilePointerStore(), str(tmp_path / "obj")
    return MemoryObjectStore(), str(tmp_path / "obj")


# --- 1. store contract -------------------------------------------------------


def test_get_absent_is_none(store):
    s, root = store
    assert s.get(f"{root}/missing.json") is None


def test_put_get_roundtrip_and_etag_churn(store):
    s, root = store
    p = f"{root}/ptr.json"
    s.put(p, {"version": 1})
    obj1, etag1 = s.get(p)
    assert obj1 == {"version": 1}
    s.put(p, {"version": 2})
    obj2, etag2 = s.get(p)
    assert obj2 == {"version": 2}
    assert etag1 != etag2


def test_put_if_absent(store):
    s, root = store
    p = f"{root}/lease.json"
    assert s.put_if_absent(p, {"owner": "a"}) is True
    assert s.put_if_absent(p, {"owner": "b"}) is False
    assert s.get(p)[0] == {"owner": "a"}


def test_compare_and_delete_exact(store):
    s, root = store
    p = f"{root}/lease.json"
    s.put(p, {"owner": "a"})
    _, etag = s.get(p)
    assert s.compare_and_delete(p, etag) is True
    assert s.get(p) is None
    # absent now: a second delete with any etag reports failure
    assert s.compare_and_delete(p, etag) is False


def test_compare_and_delete_stale_etag_preserves_object(store):
    s, root = store
    p = f"{root}/lease.json"
    s.put(p, {"owner": "a"})
    _, stale = s.get(p)
    s.put(p, {"owner": "b"})  # object replaced; `stale` no longer matches
    assert s.compare_and_delete(p, stale) is False
    got = s.get(p)
    assert got is not None and got[0] == {"owner": "b"}


def test_file_store_corrupt_object_raises(tmp_path):
    """A corrupt pointer must fail LOUDLY, never read as absent (absent
    would silently reset a sink to first-batch state)."""
    s = FilePointerStore()
    p = str(tmp_path / "ptr.json")
    with open(p, "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError):
        s.get(p)


# --- 2. lease on object-store semantics --------------------------------------


def test_lease_single_winner_under_contention(tmp_path):
    s = MemoryObjectStore()
    log = ManifestLog(str(tmp_path / "idx"), store=s)
    inside = []
    overlap = []
    lock = threading.Lock()

    def worker(i: int) -> None:
        log.acquire_lease(f"w{i}", ttl_sec=30.0, timeout_sec=60.0)
        with lock:
            if inside:
                overlap.append(i)
            inside.append(i)
        time.sleep(0.01)
        with lock:
            inside.remove(i)
        log.release_lease(f"w{i}")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert overlap == [], f"two lease holders at once: {overlap}"


def test_lease_expiry_break(tmp_path):
    s = MemoryObjectStore()
    log = ManifestLog(str(tmp_path / "idx"), store=s)
    log.acquire_lease("dead", ttl_sec=0.05, timeout_sec=5.0)
    time.sleep(0.06)  # the holder crashed; its lease expires
    log.acquire_lease("heir", ttl_sec=30.0, timeout_sec=5.0)
    got = s.get(f"{tmp_path}/idx/{ManifestLog.LEASE}")
    assert got is not None and got[0]["owner"] == "heir"


def test_stale_break_cannot_kill_fresh_lease(tmp_path):
    """The CAS property the object backend makes EXACT: a breaker that
    read an expired lease, then lost the race to a break+reacquire,
    holds a stale etag — its conditional delete fails and the fresh
    holder keeps its critical section (the file backend's replace-aside
    only approximates this with best-effort restore)."""
    s = MemoryObjectStore()
    idx = str(tmp_path / "idx")
    lease_path = f"{idx}/{ManifestLog.LEASE}"
    s.put(lease_path, {"owner": "dead", "expires": time.time() - 1})
    _, stale_etag = s.get(lease_path)
    # another contender breaks and reacquires first
    assert s.compare_and_delete(lease_path, stale_etag) is True
    assert s.put_if_absent(
        lease_path, {"owner": "fresh", "expires": time.time() + 60}
    )
    # the slow breaker fires with its stale etag: must be a no-op
    assert s.compare_and_delete(lease_path, stale_etag) is False
    assert s.get(lease_path)[0]["owner"] == "fresh"


def test_release_is_conditional_on_owner(tmp_path):
    s = MemoryObjectStore()
    log = ManifestLog(str(tmp_path / "idx"), store=s)
    log.acquire_lease("a", ttl_sec=30.0, timeout_sec=5.0)
    log.release_lease("b")  # not the holder: must not unlock
    got = s.get(f"{tmp_path}/idx/{ManifestLog.LEASE}")
    assert got is not None and got[0]["owner"] == "a"
    log.release_lease("a")
    assert s.get(f"{tmp_path}/idx/{ManifestLog.LEASE}") is None


# --- 3. crash-matrix sample on MemoryObjectStore -----------------------------

# one snapshot-pointer sink across every ordering point, one ledger
# sink, and the manifest+ledger dedup sink — the three commit shapes;
# the full per-sink sweep stays in test_commitlog_matrix (file backend)
OBJECT_STORE_CASES = [
    ("kmv", "snapshot.write", "prefix"),
    ("kmv", "snapshot.committed", "prefix"),
    ("kmv", "pointer.commit", "prefix"),
    ("kmv", "snapshot.cleanup", "full"),
    ("cms", "ledger.append", "prefix"),
    ("dedup", "manifest.commit", "prefix"),
    ("neardup", "ledger.append", "prefix"),
    ("frontier", "ledger.append", "prefix"),
]


@pytest.fixture()
def object_store_default():
    prev = commitlog.DEFAULT_STORE
    commitlog.DEFAULT_STORE = MemoryObjectStore()
    yield
    commitlog.DEFAULT_STORE = prev


@pytest.mark.parametrize("sink,point,visibility", OBJECT_STORE_CASES)
def test_crash_matrix_on_object_store(
    spark, tmp_path, object_store_default, sink, point, visibility
):
    driver = SINKS[sink]

    ref_land = tmp_path / "ref_land"
    ref_land.mkdir()
    ref_sink, ref_read, mk_batch = driver(
        spark, ref_land, str(tmp_path / "ref")
    )
    _land(ref_land, 0, mk_batch(0))
    _run(ref_sink)
    _land(ref_land, 1, mk_batch(1))
    _run(ref_sink)
    expected_full = ref_read()

    land = tmp_path / "land"
    land.mkdir()
    mk_sink, read, _ = driver(spark, land, str(tmp_path / "run"))
    _land(land, 0, mk_batch(0))
    _run(mk_sink)
    expected_prefix = read()

    _land(land, 1, mk_batch(1))
    _arm(point)
    try:
        _run_expect_crash(mk_sink)
    finally:
        commitlog.CRASH_HOOK = None

    seen = read()
    assert seen == (
        expected_prefix if visibility == "prefix" else expected_full
    ), f"{sink} @ {point} on object store: reader saw a torn state"

    _run(mk_sink)
    assert read() == expected_full, (
        f"{sink} @ {point} on object store: replay diverged"
    )
