"""Pluggable ANN metadata-plane arbiters (VERDICT r12 #6).

The lifecycle's crash-safety and concurrency guarantees reduce to a
small set of primitives over small metadata files (store meta,
tombstone sets, locks, the CURRENT pointer). r10 pinned the contract
as "POSIX only, refuse URI schemes loudly" (`require_local_
metadata_path`); this module makes the seam PLUGGABLE without moving
it: a path resolves to an arbiter that owns those primitives —

- ``PosixArbiter``: today's exact primitives (``O_EXCL`` exclusive
  create, ``tmp + os.replace`` atomic publish) for every local-FS /
  POSIX-mount path. The default; behavior is byte-identical to the
  pre-seam code.
- ``LocalCasArbiter``: the CONDITIONAL-PUT shape object stores
  expose (S3 2024+ ``If-None-Match:*`` / ``If-Match:<etag>``
  conditional writes, GCS preconditions, Azure ETags), implemented
  as a local-dir simulator. It proves the wired call sites need
  ONLY conditional-put semantics — no rename, no ``O_EXCL``, no
  hard links — so a production adapter is a thin HTTP client behind
  the same five methods. The simulator serializes with an
  in-process mutex (it models one bucket's linearizable
  conditional-PUT, which the store provides server-side); it is a
  CONTRACT vehicle for tests, not a production S3 client.

An UNREGISTERED scheme refuses exactly like r10 — same message, same
exception — so partially-wired deployments degrade loudly, never
silently. Wired through the seam: the serving + takedown surface
(store stamp, tombstone takedown set, applied history, CURRENT
resolve) AND — r12b — the whole rebuild deployment loop: model
save/load, store build/read (data plane addressed via
``data_path``), `pq.rebuild_ann`'s conditional-put publish protocol
(claim marker -> build in place -> commit marker -> monotone
pointer CAS; the "build under the final prefix, CAS the pointer"
shape SCALING.md named), and `pq.prune_ann_versions` with
committed-vs-claim-residue semantics. The incremental maintenance
rungs (merge journal moves, gc, compact, retune) keep the POSIX
refusal BY DESIGN: their arbiters are directory renames and hard
links — O(files) data-movement tricks object stores fundamentally
lack — so their object-store remedy is the rebuild loop itself.

Reference posture: the reference keeps all such state in one
transactional Postgres (src/etl/load/postgis.py:69-94); this seam is
the Spark-first equivalent — the arbiter is wherever the deployment
can get compare-and-swap.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import threading

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]+)://")


class MetadataArbiter:
    """The five primitives the wired lifecycle call sites use. All
    paths are the caller's strings (local paths for POSIX, full
    ``scheme://...`` URIs for adapters); values are bytes of SMALL
    metadata files (KBs) — never data-plane parquet.

    - ``read``: full contents or None when absent (atomic with any
      concurrent ``put`` — a reader never sees a torn file).
    - ``read_versioned``: contents plus a CAS token for
      ``put_if_match``.
    - ``put``: atomic full replace, no precondition (callers use it
      only while HOLDING an exclusive arbiter they acquired with
      ``put_if_absent``, or for first-write-wins-irrelevant files).
    - ``put_if_absent``: succeed iff the path does not exist — THE
      single-writer arbiter (lock files, journal acquire).
    - ``put_if_match``: succeed iff the path's current token equals
      the one read — the lock-free pointer-flip shape.
    - ``delete`` / ``exists``: unlink and existence probe.
    """

    def read(self, path: str) -> bytes | None:
        raise NotImplementedError

    def read_versioned(self, path: str) -> tuple[bytes | None, object]:
        raise NotImplementedError

    def put(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def put_if_absent(self, path: str, data: bytes) -> bool:
        raise NotImplementedError

    def put_if_match(self, path: str, data: bytes, token) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        """Store-dir existence probe (delete_from_ann_store's 'not a
        store dir' refusal). Object stores have prefixes, not dirs;
        adapters answer 'is there anything under this prefix'."""
        raise NotImplementedError

    # --- r12b: the version-lifecycle primitives -------------------
    # Three more calls let the REBUILD deployment loop (rebuild ->
    # publish -> resolve -> serve -> prune) run on a conditional-put
    # store; all map to first-class object-store APIs (LIST with
    # delimiter, batched DELETE, and the data-plane addressing rule).

    #: True when the backend has an atomic directory rename (POSIX).
    #: Rename-capable arbiters keep the staging+rename WAP publish;
    #: CAS arbiters get the claim -> build-in-place -> commit-marker
    #: -> pointer-CAS protocol instead (`pq.rebuild_ann`). The
    #: incremental maintenance rungs (merge journal moves, gc,
    #: compact, retune hard-links) REQUIRE rename/link and stay
    #: refused on CAS arbiters — their object-store remedy is the
    #: rebuild loop this flag enables.
    native_rename: bool = False

    def list_prefix(self, path: str) -> list[str]:
        """Immediate child names under a dir/prefix (S3 LIST with
        ``/`` delimiter), [] when nothing is there. Names only, no
        paths — callers re-join."""
        raise NotImplementedError

    def delete_prefix(self, path: str) -> None:
        """Recursively remove everything under a dir/prefix (S3
        list+batch-DELETE). Removing a missing prefix is a no-op —
        object-store deletes are idempotent and prune's crash-rerun
        depends on that."""
        raise NotImplementedError

    def data_path(self, path: str) -> str:
        """The address SPARK should use for the same location — the
        data-plane face of a metadata key. POSIX: identity. A real
        S3 adapter: ``s3://b/k`` -> ``s3a://b/k`` (or identity). The
        local CAS simulator: its mapped filesystem root, which is
        what makes an end-to-end rebuild-on-CAS test runnable with a
        local Spark."""
        raise NotImplementedError


class PosixArbiter(MetadataArbiter):
    """Today's primitives, unchanged: O_EXCL for exclusivity,
    tmp + os.replace for atomic publish. ``put_if_match`` is
    emulated with an O_EXCL sidecar lock + content compare (only
    CAS-shaped callers use it; the POSIX lifecycle flows acquire
    with ``put_if_absent`` and publish with ``put``)."""

    def read(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def read_versioned(self, path: str) -> tuple[bytes | None, object]:
        data = self.read(path)
        # content-addressed token: equal bytes = equal token, which
        # is exactly the compare put_if_match's sidecar lock performs
        tok = None if data is None else hashlib.sha256(data).hexdigest()
        return data, tok

    def put(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = f"{path}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
        finally:
            os.close(fd)
        return True

    #: a .cas-lock older than this is crash residue, not contention:
    #: the gated section is a KB-scale read+write (milliseconds), so
    #: a gate surviving 30 s means its holder died between acquire
    #: and the finally-unlink. Without reclaim, every later
    #: put_if_match on that path would spuriously fail FOREVER and a
    #: read->CAS retry loop would livelock (review r12).
    CAS_GATE_STALE_S = 30.0

    def put_if_match(self, path: str, data: bytes, token) -> bool:
        import time

        gate = f"{path}.cas-lock"
        if not self.put_if_absent(gate, b""):
            # contended: CAS semantics allow spurious failure (the
            # caller re-reads and retries) — UNLESS the gate is
            # crash residue, which must be reclaimed or the path is
            # dead. mtime ages it: a live holder's gate is
            # milliseconds old; unlink races between two reclaimers
            # are benign (missing_ok) and the re-acquire below still
            # admits exactly one writer
            try:
                stale = (
                    time.time() - os.path.getmtime(gate)
                    > self.CAS_GATE_STALE_S
                )
            except OSError:
                stale = False  # gone already: holder finished
            if stale:
                import contextlib

                with contextlib.suppress(OSError):
                    os.unlink(gate)
            if not self.put_if_absent(gate, b""):
                return False
        try:
            _, cur = self.read_versioned(path)
            if cur != token:
                return False
            self.put(path, data)
            return True
        finally:
            os.unlink(gate)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    native_rename = True

    def list_prefix(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def delete_prefix(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def data_path(self, path: str) -> str:
        return path


class LocalCasArbiter(MetadataArbiter):
    """Conditional-put reference adapter: every mutation is a
    conditional PUT against a per-key etag — the exact server-side
    semantics S3 conditional writes / GCS preconditions give — with
    NO rename, NO O_EXCL, NO links in the contract. Keys are
    ``<scheme>://<anything>`` URIs mapped under a local root for the
    simulator's storage; etags live in an in-process table guarded by
    one mutex (the store's linearization point, simulated)."""

    def __init__(self, scheme: str, root: str) -> None:
        self.scheme = scheme
        self.root = root
        self._etags: dict[str, int] = {}
        self._mu = threading.Lock()

    def _loc(self, path: str) -> str:
        m = _SCHEME_RE.match(path)
        if m is None or m.group(1) != self.scheme:
            raise ValueError(
                f"{path!r} is not a {self.scheme}:// key"
            )
        key = path[len(m.group(0)):]
        return os.path.join(
            self.root, *[p for p in key.split("/") if p]
        )

    def read(self, path: str) -> bytes | None:
        return self.read_versioned(path)[0]

    def read_versioned(self, path: str) -> tuple[bytes | None, object]:
        loc = self._loc(path)
        with self._mu:
            try:
                with open(loc, "rb") as f:
                    return f.read(), self._etags.get(path)
            except (FileNotFoundError, IsADirectoryError):
                return None, None

    def _put_locked(self, path: str, data: bytes) -> None:
        loc = self._loc(path)
        os.makedirs(os.path.dirname(loc), exist_ok=True)
        with open(loc, "wb") as f:
            f.write(data)
        self._etags[path] = self._etags.get(path, 0) + 1

    def put(self, path: str, data: bytes) -> None:
        with self._mu:
            self._put_locked(path, data)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        # PUT If-None-Match: *
        with self._mu:
            if os.path.exists(self._loc(path)):
                return False
            self._put_locked(path, data)
            return True

    def put_if_match(self, path: str, data: bytes, token) -> bool:
        # PUT If-Match: <etag>
        with self._mu:
            if not os.path.exists(self._loc(path)):
                return False
            if self._etags.get(path) != token:
                return False
            self._put_locked(path, data)
            return True

    def delete(self, path: str) -> None:
        with self._mu:
            os.unlink(self._loc(path))
            self._etags.pop(path, None)

    def exists(self, path: str) -> bool:
        with self._mu:
            return os.path.exists(self._loc(path))

    def isdir(self, path: str) -> bool:
        # prefix probe: anything stored under this key prefix?
        with self._mu:
            return os.path.isdir(self._loc(path))

    native_rename = False

    def list_prefix(self, path: str) -> list[str]:
        # LIST with '/' delimiter; includes data-plane objects Spark
        # wrote under the mapped root (no etag entry — they are not
        # metadata and never go through conditional PUT)
        with self._mu:
            try:
                return sorted(os.listdir(self._loc(path)))
            except FileNotFoundError:
                return []

    def delete_prefix(self, path: str) -> None:
        import shutil

        key_prefix = path.rstrip("/") + "/"
        with self._mu:
            shutil.rmtree(self._loc(path), ignore_errors=True)
            for k in [k for k in self._etags if k.startswith(key_prefix)]:
                del self._etags[k]
            self._etags.pop(path.rstrip("/"), None)

    def data_path(self, path: str) -> str:
        # the simulator's mapped filesystem location — a local Spark
        # reads/writes parquet there while metadata rides the
        # conditional-put table, the exact two-plane split a real
        # adapter gets with s3a:// vs the S3 HTTP API
        return self._loc(path)


_POSIX = PosixArbiter()
_ADAPTERS: dict[str, MetadataArbiter] = {}


def register_metadata_adapter(
    scheme: str, arbiter: MetadataArbiter
) -> None:
    """Attach an arbiter for ``scheme://`` metadata paths. Until a
    scheme is registered, its paths refuse exactly like r10 (the
    `require_local_metadata_path` message) — registration is the
    deployment's explicit opt-in that this scheme's arbiter really
    provides conditional-put semantics."""
    if not re.fullmatch(r"[A-Za-z][A-Za-z0-9+.\-]+", scheme):
        raise ValueError(f"not a URI scheme: {scheme!r}")
    _ADAPTERS[scheme] = arbiter


def unregister_metadata_adapter(scheme: str) -> None:
    _ADAPTERS.pop(scheme, None)


def load_metadata_adapter_spec(spec: str) -> str:
    """Register an arbiter from a ``scheme=module:factory`` spec —
    the deployment-config face of `register_metadata_adapter`, used
    by the CLI's ``--metadata-adapter`` flag and the
    ``SPARK_GRAFT_METADATA_ADAPTERS`` env var so shell-driven runs
    (crons, the pipeline faces) can opt an object-store scheme in
    without a Python wrapper. The factory is imported and called
    with the scheme string; it must return a `MetadataArbiter`
    (checked — a factory returning the wrong thing must fail at
    registration, not as a cryptic attribute error mid-lifecycle).
    Returns the scheme."""
    import importlib

    scheme, eq, target = spec.partition("=")
    module, colon, fn = target.partition(":")
    if not (scheme and eq and module and colon and fn):
        raise ValueError(
            f"adapter spec {spec!r} is not scheme=module:factory"
        )
    factory = getattr(importlib.import_module(module), fn)
    arb = factory(scheme)
    if not isinstance(arb, MetadataArbiter):
        raise TypeError(
            f"factory {target!r} returned {type(arb).__name__}, "
            "not a MetadataArbiter"
        )
    register_metadata_adapter(scheme, arb)
    return scheme


def resolve_metadata_arbiter(path: str, op: str) -> MetadataArbiter:
    """Path -> arbiter. Local paths get the POSIX arbiter; a
    registered scheme gets its adapter; an unregistered scheme
    refuses with the r10 contract message (loud, never silent).
    Import stays inside to avoid a pq<->metaplane cycle."""
    m = _SCHEME_RE.match(str(path))
    if m is None:
        return _POSIX
    arb = _ADAPTERS.get(m.group(1))
    if arb is not None:
        return arb
    from .pq import require_local_metadata_path

    require_local_metadata_path(path, op)  # raises
    raise AssertionError("unreachable")  # pragma: no cover


def join(path: str, *parts: str) -> str:
    """Scheme-preserving key join (os.path.join already leaves a
    leading ``scheme://`` prefix intact for relative tails; this
    names the intent and normalizes doubled slashes in the tail)."""
    out = path.rstrip("/")
    for p in parts:
        out = f"{out}/{p.strip('/')}"
    return out


def read_json(arb: MetadataArbiter, path: str):
    """None when absent, parsed JSON otherwise (metadata files are
    all JSON; a torn file cannot exist under either arbiter's atomic
    put, so a parse error is real corruption and propagates)."""
    raw = arb.read(path)
    return None if raw is None else json.loads(raw.decode("utf-8"))


def put_json(arb: MetadataArbiter, path: str, obj) -> None:
    arb.put(path, json.dumps(obj).encode("utf-8"))
