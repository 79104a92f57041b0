"""ONE commit-log discipline for every accumulating sink (round 9).

Through round 8, streaming/stream.py carried FIVE parallel
implementations of "atomic commit + idempotent replay + reader
isolation": the versioned ``_v_<n>`` pointer (sketch state), the
committed-epoch ``_committed.json`` ledger (CMS/MG/dedup output), the
index manifest + lease/CAS (dedup index), the frontier rounds-ledger,
and the SCD2 version pointer. Each was individually tested, and each
round's code review found a fresh crash/race bug written in the gaps
BETWEEN them (six in round 8 alone) — the historical evidence that the
next bug would be too. This module is the consolidation: the three
orthogonal primitives those five disciplines compose —

* :class:`SnapshotLog` — full-state snapshots in versioned dirs behind
  one atomic pointer file (``_version.json``). Commit = write the new
  snapshot dir, THEN advance the pointer (``os.replace``), then sweep
  stale versions. Serves the sketch sinks (hidden ``_v_<n>`` dirs,
  legacy flat-layout migration, epoch keys capped at 64), scd2_sink
  and cusum_sink (visible ``v_<n>`` dirs, unbounded epoch keys — the
  alarm reader derives the committed set from them).
* :class:`EpochLedger` — an append-only committed-epoch pointer
  (``_committed.json``) for sinks whose state is per-epoch DELTA dirs
  folded at read time (CMS/MG partials, dedup output, frontier
  rounds). An epoch is committed strictly AFTER its data lands; readers
  resolve the ledger first, so a half-written epoch is invisible.
* :class:`ManifestLog` — a generation/file manifest with a
  single-writer lease + commit-time CAS (the dedup hash index's
  transaction-log stand-in).

plus :class:`SchemaLog` (the output-schema history the dedup sink
records for schema-evolution-aware reads) and the shared atomics
(:func:`atomic_json_write`, :func:`read_state_parquet`,
:func:`run_tag`).

Every mutation passes a named :func:`crash_point` — a test-only hook
the crash-matrix pytest (tests/test_commitlog_matrix.py) arms to
simulate a crash at EXACTLY that ordering point, for every sink, in one
parameterized table: crash point × sink, assert (a) a racing reader
sees only committed state, (b) the replay converges to the crash-free
result. What a table format's log provides natively, tested the way a
table format tests it.

Semantics are bit-for-bit those of the round-8 per-sink disciplines
(hashes unchanged); the round-8 ADVICE fixes (full-floor stale sweep,
pre-ledger sentinel run_tag) are inherited by every user instead of the
one sink they were written for.

The commit OBJECTS (pointer / ledger / manifest / lease / schema
history) resolve through a pluggable :class:`FilePointerStore` /
:class:`MemoryObjectStore` seam (``DEFAULT_STORE``): the file backend
keeps today's POSIX rename semantics, the object backend proves the
same disciplines run on S3 semantics (atomic whole-object PUT,
if-none-match create, etag-conditional delete — NO rename), matrix-
tested in tests/test_commitlog_store.py. Data dirs stay plain parquet
written by Spark; only the commit objects ever needed atomicity.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.errors import AnalysisException


# test-only crash injection: the crash-matrix pytest swaps in a callable
# that raises at a chosen (point, occurrence); production never sets it
CRASH_HOOK = None


def crash_point(name: str) -> None:
    if CRASH_HOOK is not None:
        CRASH_HOOK(name)


# --- shared atomics ---------------------------------------------------------


def atomic_json_write(path: str, obj: dict) -> None:
    """tmp-write + ``os.replace``: readers see the old or the new file,
    never a torn one — the single primitive every pointer/ledger/
    manifest commit here reduces to."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def read_json(path: str, default=None):
    if not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)


def _tid() -> int:
    import threading

    return threading.get_ident()


# --- pointer stores ----------------------------------------------------------
#
# The commit OBJECTS (version pointer, epoch ledger, manifest, lease,
# schema history) are the only pieces of the discipline that need
# rename / compare-and-swap atomicity; the DATA dirs are plain parquet
# written by Spark and never mutated after their commit object names
# them. Abstracting the objects behind a PointerStore makes the sinks
# object-store-portable: S3-class stores have no rename, but they do
# have atomic whole-object PUT, if-none-match create, and etag-
# conditional delete — exactly the three primitives below. The default
# FilePointerStore keeps today's POSIX semantics bit-for-bit;
# MemoryObjectStore implements the S3 semantics (NO rename anywhere)
# and the crash matrix passes on it unchanged, which is the evidence
# the disciplines never silently depended on rename.


class FilePointerStore:
    """POSIX backend (the default): atomic replace for PUT,
    ``os.link`` for if-none-match create, replace-aside for
    conditional delete. ETags are md5 of the object bytes.

    ``compare_and_delete`` is approximate here: POSIX has no atomic
    compare-and-delete, so the breaker moves the file aside atomically
    (exactly one of N concurrent breakers wins the rename), THEN checks
    the etag — on a mismatch (the object changed between read and
    break) it best-effort restores via ``os.link`` and reports failure.
    The residual TOCTOU window (restore loses to a concurrent create)
    is the same one today's lease breaker carries, and the same
    commit-time CAS backstops it. MemoryObjectStore's version is exact.
    """

    def get(self, path: str):
        """Return ``(obj, etag)`` or None when the object is absent.
        Invalid JSON RAISES (ValueError) rather than reading as
        absent: a corrupt version pointer must fail loudly, never
        silently reset a sink to first-batch state. The lease acquire
        loop — the one caller that legitimately races a mid-create
        object — catches it and re-contends."""
        try:
            with open(path, "rb") as f:
                raw = f.read()
            return json.loads(raw), hashlib.md5(raw).hexdigest()
        except FileNotFoundError:
            return None

    def put(self, path: str, obj: dict) -> None:
        atomic_json_write(path, obj)

    def put_if_absent(self, path: str, obj: dict) -> bool:
        """Atomic if-none-match create with COMPLETE content: write a
        private tmp, then ``os.link`` it to the target (atomic, fails
        if the target exists) — a reader can never observe a torn
        half-written object, unlike a direct O_EXCL+write."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.new.{os.getpid()}.{_tid()}"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def compare_and_delete(self, path: str, etag: str) -> bool:
        aside = f"{path}.broken.{os.getpid()}.{_tid()}"
        try:
            os.replace(path, aside)
        except FileNotFoundError:
            return False
        try:
            with open(aside, "rb") as f:
                raw = f.read()
            ok = hashlib.md5(raw).hexdigest() == etag
        except OSError:
            ok = False
        if not ok:
            # moved aside somebody ELSE's fresh object: best-effort
            # restore (lost only to a concurrent create — the
            # documented residual window, CAS-backstopped)
            try:
                os.link(aside, path)
            except (FileExistsError, FileNotFoundError):
                pass
        try:
            os.remove(aside)
        except FileNotFoundError:
            pass
        return ok


class MemoryObjectStore:
    """S3-semantics backend: whole-object atomic PUT, if-none-match
    create, exact etag-conditional delete — and NO rename primitive at
    all. In-process (a dict under a lock): the test double that proves
    the commit disciplines run on object-store semantics, and the
    template a real S3 client implementation follows call-for-call
    (PUT / PUT If-None-Match / DELETE If-Match)."""

    def __init__(self) -> None:
        import threading

        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    @staticmethod
    def _encode(obj: dict) -> bytes:
        return json.dumps(obj).encode()

    def get(self, path: str):
        with self._lock:
            raw = self._objects.get(path)
        if raw is None:
            return None
        return json.loads(raw), hashlib.md5(raw).hexdigest()

    def put(self, path: str, obj: dict) -> None:
        raw = self._encode(obj)
        with self._lock:
            self._objects[path] = raw

    def put_if_absent(self, path: str, obj: dict) -> bool:
        raw = self._encode(obj)
        with self._lock:
            if path in self._objects:
                return False
            self._objects[path] = raw
            return True

    def compare_and_delete(self, path: str, etag: str) -> bool:
        with self._lock:
            raw = self._objects.get(path)
            if raw is None or hashlib.md5(raw).hexdigest() != etag:
                return False
            del self._objects[path]
            return True


# the process-wide default; swap to a MemoryObjectStore (or a real
# object-store client with the same four methods) to run every sink's
# commit objects on S3 semantics — resolved at CALL time, so existing
# sink instances follow a swap
DEFAULT_STORE = FilePointerStore()


def _store(explicit):
    return explicit if explicit is not None else DEFAULT_STORE


def run_tag(checkpoint: str) -> str:
    """The run-identity tag every epoch-keyed sink derives from its
    checkpoint path: replay-dedup keys are scoped per checkpoint
    LINEAGE, so two sinks sharing a state dir but not a checkpoint
    never mistake each other's epochs for replays. One definition —
    a drift in any copy would silently change replay-dedup keys."""
    return hashlib.md5(os.path.abspath(checkpoint).encode()).hexdigest()[:8]


def read_state_parquet(sess, path: str):
    """Read a sink's persisted state dir, or None iff it doesn't exist
    yet.

    ONLY the path-missing case (first batch ever) maps to None; any
    other read failure — corruption, transient IO, permission —
    propagates and fails the batch, because the callers' next step is
    an overwrite of ``path``: swallowing a real read error would
    silently reset all accumulated state to just the current batch
    (ADVICE r7).
    """
    try:
        return sess.read.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        if "UNABLE_TO_INFER_SCHEMA" in msg:
            # dir EXISTS but holds no parquet footers: the signature of
            # a crash-interrupted state overwrite (files deleted, new
            # ones not yet written) — treating it as first-batch would
            # silently reset accumulated state (code-review r8). Fail
            # loudly; the operator must decide. Pointer-resolved sinks
            # no longer hit either window — this guards the remaining
            # flat-layout callers and legacy pre-versioned dirs.
            raise RuntimeError(
                f"state dir {path} exists but contains no readable "
                "parquet (crash-interrupted overwrite?) — refusing to "
                "treat as first batch; delete the dir to reset state "
                "deliberately"
            ) from e
        raise


# --- versioned snapshots behind one atomic pointer --------------------------


class SnapshotLog:
    """Full-state snapshots in ``<prefix><n>`` dirs behind the atomic
    ``_version.json`` pointer {version, epochs}.

    Crash orderings (the property a table format's log provides):

    * crash during/after the snapshot write but before the pointer
      commit → readers keep resolving version ``n``; the replayed epoch
      recomputes from ``n`` and overwrites ``<prefix><n+1>``;
    * crash after the pointer commit → the epoch key is recorded, the
      replay is an outright no-op;
    * the committed version dir is NEVER deleted while the pointer
      names it, so no ordering can reset accumulated state (the
      pre-round-8 in-place overwrite's delete-phase window).

    Two configurations exist in the tree:

    * sketch sinks — ``dir_prefix="_v_"`` (underscore-HIDDEN: Spark's
      file listing skips ``_``/``.`` children, so a legacy flat read
      can't ingest an in-flight version dir), ``epoch_cap=64`` (Spark
      replays at most the trailing uncommitted batches),
      ``legacy_sweep=True`` (first commit migrates a pre-versioned
      flat-layout dir);
    * scd2/cusum — ``dir_prefix="v_"`` (visible; these dirs ARE the
      product), ``epoch_cap=None`` (cusum's alarm reader derives the
      committed set from the full epoch-key list).
    """

    POINTER = "_version.json"

    def __init__(
        self,
        state_path: str,
        dir_prefix: str = "_v_",
        keep_versions: int = 3,
        epoch_cap: int | None = 64,
        legacy_sweep: bool = True,
        store=None,
    ) -> None:
        self.state_path = state_path
        self.dir_prefix = dir_prefix
        self.keep_versions = keep_versions
        self.epoch_cap = epoch_cap
        self.legacy_sweep = legacy_sweep
        self.store = store

    # -- pointer --

    def pointer(self) -> dict:
        got = _store(self.store).get(
            os.path.join(self.state_path, self.POINTER)
        )
        return {"version": 0, "epochs": []} if got is None else got[0]

    def write_pointer(self, pointer: dict) -> None:
        crash_point("pointer.commit")
        _store(self.store).put(
            os.path.join(self.state_path, self.POINTER), pointer
        )

    def snapshot_path(self, version: int) -> str:
        return os.path.join(
            self.state_path, f"{self.dir_prefix}{version}"
        )

    # -- read --

    def read(self, sess):
        """Resolve the committed state: pointer first, then the version
        dir it names — never a half-written snapshot. No pointer yet
        means first batch ever (None) or, for the hidden-``_v_``
        configuration, a LEGACY flat-layout dir (visible part files) —
        read as-is and migrated by the next commit. Returns
        ``(state_or_None, pointer)``."""
        pointer = self.pointer()
        if pointer["version"] > 0:
            return (
                sess.read.parquet(self.snapshot_path(pointer["version"])),
                pointer,
            )
        if not os.path.isdir(self.state_path):
            return None, pointer
        visible = [
            e
            for e in os.listdir(self.state_path)
            if not e.startswith(("_", "."))
        ]
        if not visible:
            return None, pointer
        return read_state_parquet(sess, self.state_path), pointer

    def read_committed(self, sess, version: int | None = None):
        """Committed snapshot or raise — the external-reader surface
        (read_sketch_state / read_scd2_state semantics). ``version``
        time-travels within the kept window; versions ABOVE the pointer
        are refused even if their dir exists on disk (an uncommitted
        ``<prefix><n+1>`` left by a crash must stay invisible)."""
        pointer = self.pointer()
        if pointer["version"] == 0:
            # legacy flat layout (pre-versioned sink): read as-is. ONLY
            # valid for the hidden-prefix config — with visible version
            # dirs (scd2/cusum) an uncommitted <prefix>1 left by a
            # crashed first commit would be swept into the read,
            # breaking exactly the isolation the pointer provides.
            if self.dir_prefix.startswith(("_", ".")):
                state, _ = self.read(sess)
                if state is not None:
                    return state
            raise FileNotFoundError(
                f"no committed state at {self.state_path}"
            )
        if version is None:
            version = pointer["version"]
        if version > pointer["version"]:
            raise ValueError(
                f"version {version} is not committed (pointer is at "
                f"{pointer['version']}); refusing to read an "
                "uncommitted snapshot"
            )
        vdir = self.snapshot_path(version)
        if not os.path.isdir(vdir):
            plen = len(self.dir_prefix)
            kept = sorted(
                int(d[plen:])
                for d in os.listdir(self.state_path)
                if d.startswith(self.dir_prefix)
                and d[plen:].isdigit()
                and int(d[plen:]) <= pointer["version"]
            )
            raise FileNotFoundError(
                f"version {version} was pruned; kept versions: {kept}"
            )
        return sess.read.parquet(vdir)

    # -- commit --

    def _record_epoch(self, pointer: dict, epoch_key: str) -> list:
        epochs = pointer["epochs"] + [epoch_key]
        return epochs[-self.epoch_cap:] if self.epoch_cap else epochs

    def commit_epoch_only(self, pointer: dict, epoch_key: str) -> None:
        """Record an epoch WITHOUT a new snapshot (empty batch: state
        unchanged, but the replay key must still be durable)."""
        self.write_pointer(
            {
                "version": pointer["version"],
                "epochs": self._record_epoch(pointer, epoch_key),
            }
        )

    def commit(self, merged, pointer: dict, epoch_key: str) -> None:
        """Write ``<prefix><n+1>``, THEN advance the pointer (atomic),
        then clean up: legacy flat files swept on EVERY commit (visible
        entries can only be pre-versioned leftovers; self-healing beats
        one-shot — code-review r8), and EVERY version at or below the
        retention floor pruned, not just one index (a crash between
        pointer write and prune must not orphan a dir forever —
        ADVICE r8)."""
        n = pointer["version"]
        crash_point("snapshot.write")
        merged.write.mode("overwrite").parquet(self.snapshot_path(n + 1))
        crash_point("snapshot.committed")
        self.write_pointer(
            {
                "version": n + 1,
                "epochs": self._record_epoch(pointer, epoch_key),
            }
        )
        crash_point("snapshot.cleanup")
        if self.legacy_sweep:
            for e in os.listdir(self.state_path):
                if e.startswith(("_", ".")) or e.startswith(
                    self.dir_prefix
                ):
                    continue
                p = os.path.join(self.state_path, e)
                (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
        floor = n + 1 - self.keep_versions
        if floor >= 1:
            plen = len(self.dir_prefix)
            for e in os.listdir(self.state_path):
                if not e.startswith(self.dir_prefix):
                    continue
                suffix = e[plen:]
                if not suffix.isdigit():
                    continue
                if int(suffix) <= floor:
                    old = os.path.join(self.state_path, e)
                    if os.path.isdir(old):
                        shutil.rmtree(old)


# --- committed-epoch ledger for delta-dir sinks ------------------------------


class EpochLedger:
    """Append-only committed-epoch pointer (``_committed.json``) over a
    directory of per-epoch delta dirs. An epoch dir lands first (mode=
    overwrite into a deterministic name, so a crash-replay rewrites the
    same bytes); the ledger append happens strictly AFTER — readers
    resolve the ledger first, so a half-written epoch is invisible and
    a crash in the final window is repaired by the replay's
    early-return re-append."""

    FILE = "_committed.json"

    def __init__(
        self,
        out_path: str,
        prefix: str = "epoch_",
        run_tag: str | None = None,
        store=None,
    ) -> None:
        self.out_path = out_path
        self.prefix = prefix
        self.run_tag = run_tag
        self.store = store

    def read(self) -> dict | None:
        got = _store(self.store).get(
            os.path.join(self.out_path, self.FILE)
        )
        return None if got is None else got[0]

    def epochs(self) -> list[str] | None:
        ledger = self.read()
        return None if ledger is None else ledger["epochs"]

    def _existing_dirs(self) -> list[str]:
        return sorted(
            d
            for d in (
                os.listdir(self.out_path)
                if os.path.isdir(self.out_path)
                else []
            )
            if d.startswith(self.prefix)
            and os.path.isdir(os.path.join(self.out_path, d))
        )

    def ensure(self) -> None:
        """Create the ledger at SINK CONSTRUCTION time when it doesn't
        exist yet (backfilling any pre-ledger epoch dirs, which were
        visible under the old regime). Without this, a brand-new sink's
        FIRST epoch had no ledger while mid-write, so the reader's
        'no ledger = read unrestricted' legacy fallback re-opened
        exactly the half-written-epoch race the ledger exists to close
        (code-review r8). After construction the ledger always exists:
        an empty one makes readers raise no-committed-epochs instead of
        ingesting a torn first epoch.

        When a ``run_tag`` is tracked and backfilled epochs exist, the
        ledger is stamped with the ``__pre_ledger__`` SENTINEL, not the
        new tag: pre-ledger dirs' checkpoint lineage is unknowable, and
        stamping the new tag would let a fresh checkpoint's batch ids
        0..N early-return as "committed replays" — output silently
        never written (ADVICE r8). The sentinel makes
        :meth:`check_lineage` fail loudly instead.
        """
        p = os.path.join(self.out_path, self.FILE)
        if _store(self.store).get(p) is not None:
            return
        epochs = self._existing_dirs()
        ledger: dict = {"epochs": epochs}
        if self.run_tag is not None:
            ledger["run_tag"] = (
                "__pre_ledger__" if epochs else self.run_tag
            )
        os.makedirs(self.out_path, exist_ok=True)
        _store(self.store).put(p, ledger)

    def check_lineage(self) -> list[str] | None:
        """The frontier guard: epochs when the ledger belongs to this
        run's checkpoint lineage (or no ledger / untagged), RuntimeError
        otherwise — batch ids restart on a fresh checkpoint, so
        continuing would silently skip epochs."""
        ledger = self.read()
        if ledger is None:
            return None
        tag = ledger.get("run_tag")
        if tag in (None, self.run_tag):
            return ledger["epochs"]
        if tag == "__pre_ledger__":
            raise RuntimeError(
                f"dir {self.out_path} holds {self.prefix}* dirs that "
                "predate the committed-epochs ledger, so their "
                "checkpoint lineage is unknowable. Continuing could "
                "silently skip epochs (a fresh checkpoint restarts "
                "batch ids inside the backfilled range) — clear the "
                "sink dirs together with the checkpoint and re-run."
            )
        raise RuntimeError(
            f"dir {self.out_path} belongs to a different checkpoint "
            f"lineage (ledger run_tag {tag!r} != {self.run_tag!r}). "
            "Batch ids restart on a fresh checkpoint, so continuing "
            "would silently skip epochs / re-process committed ones — "
            "clear the sink dirs together with the checkpoint, or "
            "resume with the original checkpoint."
        )

    def append(self, epoch_name: str) -> None:
        """Atomically append one committed epoch. Called AFTER the
        epoch's data commit — and again from the replay early-return
        path, which repairs a crash that landed between the data commit
        and this write (the epoch stays invisible to readers until that
        repair; never visible BEFORE its commit).

        First-pointer BACKFILL (code-review r8): when the ledger file
        does not exist yet but the dir already holds epoch dirs (a sink
        that ran before the ledger upgrade), those epochs were
        committed under the old regime and readers could see them —
        seed the ledger with every existing ``prefix``-named dir so the
        FIRST post-upgrade commit doesn't hide all previously
        accumulated output."""
        ledger = self.read()
        if ledger is not None and epoch_name in ledger["epochs"]:
            return  # already durably recorded
        if ledger is None:
            # backfill may already list epoch_name (its dir lands
            # before the commit) — the ledger FILE must still be
            # created, so only the already-recorded case above may
            # early-return
            epochs = self._existing_dirs()
            if epoch_name not in epochs:
                epochs.append(epoch_name)
            ledger = {"epochs": epochs}
        else:
            ledger = dict(ledger)
            ledger["epochs"] = ledger["epochs"] + [epoch_name]
        crash_point("ledger.append")
        _store(self.store).put(
            os.path.join(self.out_path, self.FILE), ledger
        )

    def committed_paths(self) -> list[str] | None:
        """Committed epoch dirs (None = pre-ledger output, read
        unrestricted — the dirs were visible under the old regime).
        Raises when the ledger exists but nothing is committed yet."""
        committed = self.epochs()
        if committed is None:
            return None
        if not committed:
            raise FileNotFoundError(
                f"no committed epochs at {self.out_path}"
            )
        return [os.path.join(self.out_path, e) for e in committed]


# --- generation/file manifest with single-writer lease -----------------------


class ManifestLog:
    """The dedup hash index's transaction-log stand-in: a
    generation/files/epochs manifest committed by atomic replace,
    serialized across writers by a lease FILE + commit-time CAS."""

    FILE = "_manifest.json"
    LEASE = "_lease.json"

    def __init__(self, index_path: str, store=None) -> None:
        self.index_path = index_path
        self.store = store

    def read(self) -> dict:
        got = _store(self.store).get(
            os.path.join(self.index_path, self.FILE)
        )
        if got is None:
            return {"epochs": [], "files": [], "generation": 0}
        return got[0]

    def write(self, manifest: dict) -> None:
        crash_point("manifest.commit")
        os.makedirs(self.index_path, exist_ok=True)
        _store(self.store).put(
            os.path.join(self.index_path, self.FILE), manifest
        )

    def acquire_lease(
        self,
        owner: str,
        ttl_sec: float = 120.0,
        timeout_sec: float = 300.0,
    ) -> None:
        """Single-writer lease over the manifest (VERDICT r6 item 7):
        the whole read-index → anti-join → write-epoch →
        commit-manifest sequence must be serial per index, or two
        writers interleave read-modify-write on the manifest and the
        loser's epoch silently vanishes from the committed file list.

        Mechanics — a lease FILE, not a lock: created with
        ``O_CREAT|O_EXCL`` (atomic on POSIX and on object stores with
        if-none-match semantics) carrying (owner, expiry). A contender
        polls; a lease past its expiry is BROKEN by atomically renaming
        it aside (exactly one of N concurrent breakers wins the rename,
        the rest see FileNotFoundError and re-contend), so a crashed
        holder stalls the table for at most ``ttl_sec``. The standard
        lease caveat is backstopped by the caller's commit-time CAS:
        a merge that outlives its ttl raises instead of silently
        clobbering (split-brain is a loud error, never a lost epoch).
        """
        os.makedirs(self.index_path, exist_ok=True)
        store = _store(self.store)
        lock = os.path.join(self.index_path, self.LEASE)
        deadline = time.time() + timeout_sec
        while True:
            if store.put_if_absent(
                lock, {"owner": owner, "expires": time.time() + ttl_sec}
            ):
                return
            try:
                got = store.get(lock)
            except ValueError:
                continue  # holder mid-create on a torn backend: re-contend
            if got is None:
                continue  # holder released between contend and read
            cur, etag = got
            if cur.get("expires", 0) < time.time():
                # stale: conditional delete of EXACTLY the lease we
                # read — on an object store this is if-match DELETE
                # (exact: a concurrent fresh lease survives); the file
                # backend approximates with replace-aside + restore
                store.compare_and_delete(lock, etag)
                continue
            if time.time() > deadline:
                raise TimeoutError(
                    f"manifest lease at {lock} held by "
                    f"{cur.get('owner')!r} past {timeout_sec}s"
                )
            time.sleep(0.05)

    def release_lease(self, owner: str) -> None:
        """Release only a lease this owner still holds (an expired-and-
        broken lease now belongs to someone else — removing it would
        unlock THEIR critical section). Conditional on the exact lease
        read: an unconditional remove could race a break+reacquire."""
        store = _store(self.store)
        lock = os.path.join(self.index_path, self.LEASE)
        try:
            got = store.get(lock)
        except ValueError:
            return
        if got is None:
            return
        cur, etag = got
        if cur.get("owner") == owner:
            store.compare_and_delete(lock, etag)


# --- output-schema history ----------------------------------------------------


class SchemaLog:
    """Distinct output schemas with the epochs each covers
    (``_schemas.json``) — the manifest-log stand-in for a table
    format's schema log; read_incremental_output groups epochs by
    recorded schema and unions with allowMissingColumns."""

    FILE = "_schemas.json"

    def __init__(self, out_path: str, store=None) -> None:
        self.out_path = out_path
        self.store = store

    def read(self) -> dict:
        got = _store(self.store).get(
            os.path.join(self.out_path, self.FILE)
        )
        return {"versions": []} if got is None else got[0]

    def write(self, schemas: dict) -> None:
        os.makedirs(self.out_path, exist_ok=True)
        _store(self.store).put(
            os.path.join(self.out_path, self.FILE), schemas
        )

    def record(self, schema_json: str, epoch_name: str) -> None:
        """Idempotently record (schema, epoch) — written BEFORE the
        data commit, so a crash in between leaves only a harmless extra
        entry that the replay re-records."""
        schemas = self.read()
        ver = next(
            (
                v
                for v in schemas["versions"]
                if v["schema"] == schema_json
            ),
            None,
        )
        if ver is None:
            ver = {
                "version": len(schemas["versions"]) + 1,
                "schema": schema_json,
                "epochs": [],
            }
            schemas["versions"].append(ver)
        if epoch_name not in ver["epochs"]:
            ver["epochs"].append(epoch_name)
        self.write(schemas)
