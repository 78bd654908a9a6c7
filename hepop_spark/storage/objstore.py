"""Object-store I/O seam for the CAS-published metadata stores.

Why (r11 verdict item 5): SCALE.md names object storage as the
deployment target for the sidecar/manifest stores — their design already
assumes it (immutable uniquely-named objects, versioned heads, a
put-if-absent commit point, no in-place mutation) — but the code bound
those assumptions to POSIX primitives (`os.link` for the conditional
put, tmp+`os.rename` for atomic object writes, `os.listdir`). This
module makes the narrow I/O contract explicit and swappable:

    list(dir)                    -> names       (LIST)
    get(path)                    -> bytes|None  (GET)
    put(path, data)              -> None        (PUT, unconditional)
    put_if_absent(path, data)    -> bool        (PUT + If-None-Match: *)
    delete(path)                 -> None        (DELETE, idempotent)
    mtime(path)                  -> float|None  (HEAD: Last-Modified)

Two backends:

- ``LocalFsBackend`` (default): today's exact behavior — tmp+rename for
  `put` (crash-atomic), tmp+`os.link` for `put_if_absent` (atomic
  create-if-absent on POSIX).
- ``FakeObjectStore``: the emulation harness. Its API surface is
  exactly the six verbs above — the protocol code running over it can
  not rename, link, or partially rewrite anything, which is the proof
  obligation: every store protocol that passes its soak over this
  backend ports to S3/GCS/ABFS verbatim. (S3 has supported
  `If-None-Match: *` conditional PUT since late 2024 and etag
  `If-Match` writes since 2025; GCS has `ifGenerationMatch`; ABFS has
  etag preconditions — `put_if_absent` maps to each directly.)
  Internally it persists objects as files 1:1 under the SAME paths (so
  a tree written through the fake reads identically through the local
  backend and vice versa — two processes can soak one tree with mixed
  backends), and implements the conditional put with a tmp+link that is
  an EMULATION DETAIL behind the verb, not part of the surface. It also
  counts verbs, so tests can assert a protocol run used nothing else.

The protocols only need put-if-absent CAS on versioned keys plus
unconditional puts of uniquely-named immutable objects: `put_if_match`
(etag CAS) is provided for completeness but nothing requires it — a
weaker store without read-modify-write conditionals still hosts these
stores safely.
"""

from __future__ import annotations

import hashlib
import os
import uuid


class PreconditionFailed(Exception):
    """Conditional put lost: the key already exists (If-None-Match) or
    the etag moved (If-Match)."""


class LocalFsBackend:
    """POSIX primitives, bit-identical to the pre-seam behavior."""

    name = "local"

    def list(self, d: str) -> list[str]:
        try:
            return os.listdir(d)
        except OSError:
            return []

    def get(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as fh:
                return fh.read()
        except OSError:
            return None

    def put(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = os.path.join(os.path.dirname(path),
                           f".put.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.rename(tmp, path)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = os.path.join(os.path.dirname(path),
                           f".cas.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, path)  # atomic create-if-absent: the commit point
            return True
        except FileExistsError:
            return False
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except OSError:
            pass

    def mtime(self, path: str) -> float | None:
        try:
            return os.stat(path).st_mtime
        except OSError:
            return None


class FakeObjectStore:
    """Object-store semantics over a local tree — see module docstring.

    `counts` tallies every verb; `renames_forbidden` is definitional:
    the class simply has no rename/move/append verb to call."""

    name = "fake-objstore"

    def __init__(self) -> None:
        self.counts = {"list": 0, "get": 0, "put": 0,
                       "put_if_absent": 0, "put_if_match": 0,
                       "delete": 0, "mtime": 0}

    # -- verbs ---------------------------------------------------------
    def list(self, d: str) -> list[str]:
        self.counts["list"] += 1
        try:
            # objects only — an object store has no directories; local
            # subdirs (objs/) surface as prefixes, which listdir models
            return os.listdir(d)
        except OSError:
            return []

    def get(self, path: str) -> bytes | None:
        self.counts["get"] += 1
        try:
            with open(path, "rb") as fh:
                return fh.read()
        except OSError:
            return None

    def put(self, path: str, data: bytes) -> None:
        # unconditional PUT: last write wins, atomic visibility — the
        # tmp+rename below is the local EMULATION of a PUT's atomicity,
        # not a verb the protocol can reach
        self.counts["put"] += 1
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = os.path.join(os.path.dirname(path),
                           f".obj.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.rename(tmp, path)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        # PUT + If-None-Match: * — succeeds iff the key did not exist
        self.counts["put_if_absent"] += 1
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = os.path.join(os.path.dirname(path),
                           f".cas.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass

    def put_if_match(self, path: str, data: bytes, etag: str) -> str:
        """PUT + If-Match: etag CAS — provided for completeness; the
        sidecar/manifest protocols never need it (their keys are
        immutable once created). NOT race-free cross-process in this
        emulation (read-compare-swap without a lock) — exists to pin
        the API shape, raises PreconditionFailed on a stale etag."""
        self.counts["put_if_match"] += 1
        cur = self.get(path)
        if cur is None or self.etag(cur) != etag:
            raise PreconditionFailed(path)
        self.put(path, data)
        return self.etag(data)

    def delete(self, path: str) -> None:
        self.counts["delete"] += 1
        try:
            os.remove(path)
        except OSError:
            pass

    def mtime(self, path: str) -> float | None:
        self.counts["mtime"] += 1
        try:
            return os.stat(path).st_mtime
        except OSError:
            return None

    @staticmethod
    def etag(data: bytes) -> str:
        return hashlib.md5(data).hexdigest()


_BACKEND = LocalFsBackend()


def backend():
    """The active I/O backend. Default LocalFsBackend; tests and soaks
    install a FakeObjectStore via set_backend() or the
    HEPOP_OBJSTORE=fake environment variable (read once, at import, so
    a child soak process picks it up without code changes)."""
    return _BACKEND


def set_backend(b) -> None:
    global _BACKEND
    _BACKEND = b


if os.environ.get("HEPOP_OBJSTORE") == "fake":
    set_backend(FakeObjectStore())
