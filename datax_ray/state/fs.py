"""Lake filesystem abstraction — the object-store-safe storage contract.

The round-3 review named the lake's POSIX primitives (os.replace publish,
os.link exclusive commit, hardlink clones) as the single biggest gap
between "correct on tmpfs" and "deployable on S3/GCS/HDFS at 100 TB":
object stores have NO rename, NO hardlink, NO append. This module narrows
every lake I/O to the contract a real object store actually offers:

    get / open_input          read a whole immutable object
    put                       full-object write with ATOMIC VISIBILITY
                              (S3 PUT: readers see old bytes or new bytes,
                              never a torn object)
    put_if_absent             ATOMIC CONDITIONAL CREATE (S3 `If-None-Match:
                              *`, GCS `ifGenerationMatch=0`, ABS lease) —
                              the lake's ONLY exclusivity primitive
    exists / list_prefix / delete / size
    copy                      server-side copy (S3 CopyObject, HDFS cp) —
                              no data bytes through the client

Everything else in the engine (manifest 2PC, WAP, clone, vacuum, fsck,
dead-letter, feed, replicate) is expressed over these eight operations.
Content-hash fragment names make `put` retries idempotent; the manifest's
epoch object is the exactly-once commit point via `put_if_absent`.

Three backends, chosen by path scheme:

  * plain path      -> LocalFS: the POSIX fast path. `put` = tmp +
                       os.replace, `put_if_absent` = tmp + os.link,
                       `open_input` = mmap (zero-copy reads). Identical
                       behavior to the pre-abstraction engine.
  * obj://<path>    -> ObjStoreFS: a STRICT object-store emulator backed
                       by the local directory <path>. Engine code holding
                       `obj://...` strings CANNOT bypass the contract —
                       `open()` / `glob` / `pq.read_table` on such a
                       string fails (no such literal file), so the pytest
                       suite running the full lake lifecycle on an obj://
                       lake proves no engine module outside this file
                       relies on rename/link/in-place mutation. The
                       emulator's *internals* use tmp+replace / tmp+link
                       to stand in for the store's SERVER-SIDE atomic PUT
                       and conditional create, exactly as minio/moto do;
                       the client-visible API is the eight ops above.
  * <scheme>://     -> FsspecFS: deployment shim routing any other URL
                       (s3://, gcs://, hdfs://...) through fsspec when
                       installed. `put_if_absent` is fsspec's ATOMIC
                       `pipe_file(mode="create")` — s3fs backs it with
                       S3 `If-None-Match: *`, gcsfs with
                       `ifGenerationMatch=0`; only backends predating
                       the `mode` parameter fall back to exists-then-put
                       (documented on the method).

All functions are module-level and stateless so they ship into Ray tasks
as plain code — no filesystem handles cross process boundaries.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid

import pyarrow as pa

_OBJ = "obj://"


def _scheme(path: str) -> str | None:
    i = path.find("://")
    # a scheme is a short leading token with no separators before "://"
    if i <= 0 or os.sep in path[:i]:
        return None
    return path[:i]


def is_remote(path: str) -> bool:
    """True when `path` carries a URL scheme (any non-local backend)."""
    return _scheme(path) is not None


def canon_path(path: str) -> str:
    """Canonical identity for provenance checks (clone/mergeback): abspath
    for local paths, identity for scheme'd paths (os.path.abspath would
    mangle `obj://...` into a cwd-relative monster)."""
    return path if _scheme(path) else os.path.abspath(path)


def _obj_local(path: str) -> str:
    """obj://<abs-path> -> the emulator's backing path. Internal ONLY."""
    return path[len(_OBJ):]


class LocalFS:
    """POSIX backend — plain paths, the engine's original primitives."""

    @staticmethod
    def get(path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    @staticmethod
    def open_input(path: str) -> pa.NativeFile:
        return pa.memory_map(path, "r")

    @staticmethod
    def put(path: str, data) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    @staticmethod
    def put_if_absent(path: str, data) -> bool:
        """tmp + os.link: atomic AND exclusive on POSIX (EEXIST loses)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(path)

    @staticmethod
    def list_prefix(prefix: str) -> list[str]:
        """All file paths under directory `prefix`, recursive, sorted.
        Object-store LIST semantics: missing prefix lists empty."""
        out = []
        for root, _, names in os.walk(prefix):
            out.extend(os.path.join(root, n) for n in names)
        return sorted(out)

    @staticmethod
    def delete(path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass  # object-store DELETE is idempotent

    @staticmethod
    def size(path: str) -> int:
        return os.path.getsize(path)

    @staticmethod
    def copy(src: str, dst: str) -> str:
        """Hardlink when possible (CoW zero-copy), else byte copy."""
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
            return "linked"
        except OSError:
            shutil.copy2(src, dst)
            return "copied"


class ObjStoreFS:
    """Strict object-store emulator over `obj://<local-dir>` paths.

    Client contract only: the engine never sees the backing paths, so any
    direct POSIX access to an obj:// string fails loudly. The tmp+replace
    and tmp+link calls below EMULATE the store's server-side atomic PUT /
    conditional create (`If-None-Match: *`) — they are the store's
    internals, not part of the client protocol (what minio does for S3)."""

    @staticmethod
    def get(path: str) -> bytes:
        with open(_obj_local(path), "rb") as f:
            return f.read()

    @staticmethod
    def open_input(path: str) -> pa.NativeFile:
        # committed objects are immutable (content-hash / epoch named),
        # so mmap of the backing file is safe and zero-copy
        return pa.memory_map(_obj_local(path), "r")

    @staticmethod
    def put(path: str, data) -> None:
        local = _obj_local(path)
        os.makedirs(os.path.dirname(local), exist_ok=True)
        tmp = f"{local}.srv.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, local)  # server-side: atomic PUT visibility

    @staticmethod
    def put_if_absent(path: str, data) -> bool:
        local = _obj_local(path)
        os.makedirs(os.path.dirname(local), exist_ok=True)
        tmp = f"{local}.srv.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, local)  # server-side: conditional create
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(_obj_local(path))

    @staticmethod
    def list_prefix(prefix: str) -> list[str]:
        local = _obj_local(prefix)
        out = []
        for root, _, names in os.walk(local):
            out.extend(os.path.join(root, n) for n in names)
        return sorted(_OBJ + p for p in out)

    @staticmethod
    def delete(path: str) -> None:
        try:
            os.remove(_obj_local(path))
        except FileNotFoundError:
            pass

    @staticmethod
    def size(path: str) -> int:
        return os.path.getsize(_obj_local(path))

    @staticmethod
    def copy(src: str, dst: str) -> str:
        """Server-side copy (S3 CopyObject): no bytes through the client.
        Emulated as a hardlink — CoW at file granularity, exactly the
        sharing the clone protocol wants; engine rewrites are new objects
        so the shared bytes can never be mutated through either name."""
        s, d = _obj_local(src), _obj_local(dst)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        try:
            os.link(s, d)
            return "linked"
        except OSError:
            shutil.copy2(s, d)
            return "copied"


class FsspecFS:
    """Deployment shim: any other `scheme://` URL via fsspec (s3, gcs,
    hdfs, ...). Untested against network stores in this sandbox, but the
    call surface is the same eight ops the emulator proves sufficient."""

    def __init__(self, scheme: str):
        import fsspec

        self._fs = fsspec.filesystem(scheme)

    def get(self, path: str) -> bytes:
        return self._fs.cat_file(path)

    def open_input(self, path: str) -> pa.NativeFile:
        return pa.PythonFile(self._fs.open(path, "rb"), mode="r")

    def put(self, path: str, data) -> None:
        # object stores have no directories (makedirs is a no-op there);
        # fsspec's local backend needs the parent created first
        self._fs.makedirs(self._fs._parent(path), exist_ok=True)
        with self._fs.open(path, "wb") as f:
            f.write(bytes(data))

    def put_if_absent(self, path: str, data) -> bool:
        """ATOMIC conditional create via fsspec's portable API:
        `pipe_file(path, value, mode="create")` raises FileExistsError
        when the object already exists. Object-store backends implement
        it with the store's native conditional-write header — s3fs sends
        S3 `If-None-Match: *`, gcsfs sends `ifGenerationMatch=0` — so
        the lake's exclusivity primitive is a single server-side
        compare-and-create, never exists-then-put. Only a backend that
        predates the `mode` parameter (TypeError below) degrades to the
        racy exists-then-put fallback, and such a store should not host
        a multi-writer lake."""
        self._fs.makedirs(self._fs._parent(path), exist_ok=True)
        try:
            self._fs.pipe_file(path, bytes(data), mode="create")
            return True
        except FileExistsError:
            return False
        except TypeError:
            # pre-`mode` backend: documented non-atomic fallback
            if self._fs.exists(path):
                return False
            self.put(path, data)
            return True

    def exists(self, path: str) -> bool:
        return self._fs.exists(path)

    def list_prefix(self, prefix: str) -> list[str]:
        if not self._fs.exists(prefix):
            return []
        sch = _scheme(prefix)
        out = self._fs.find(prefix)
        return sorted(
            p if "://" in p else f"{sch}://{p.lstrip('/') if sch != 'file' else p}"
            for p in out
        )

    def delete(self, path: str) -> None:
        try:
            self._fs.rm_file(path)
        except FileNotFoundError:
            pass

    def size(self, path: str) -> int:
        return self._fs.size(path)

    def copy(self, src: str, dst: str) -> str:
        self._fs.copy(src, dst)
        return "copied"


_LOCAL = LocalFS()
_OBJFS = ObjStoreFS()
_fsspec_cache: dict[str, FsspecFS] = {}


def fs_for(path: str):
    """Backend for `path`, by scheme. Stateless singletons — safe to call
    inside any Ray task; nothing filesystem-shaped crosses processes."""
    sch = _scheme(path)
    if sch is None:
        return _LOCAL
    if sch == "obj":
        return _OBJFS
    if sch not in _fsspec_cache:
        _fsspec_cache[sch] = FsspecFS(sch)
    return _fsspec_cache[sch]


# ---------------------------------------------------------- conveniences --


def read_json(path: str) -> dict:
    return json.loads(fs_for(path).get(path))


def put_json(path: str, obj) -> bytes:
    data = json.dumps(obj, indent=1, sort_keys=True).encode()
    fs_for(path).put(path, data)
    return data


def json_bytes(obj) -> bytes:
    return json.dumps(obj, indent=1, sort_keys=True).encode()


def put_parquet(table, path: str, **write_kw) -> int:
    """Serialize + atomic-put one parquet object; returns byte size.
    The artifact-file analog of stages/delta.py's fragment write."""
    import pyarrow.parquet as pq

    sink = pa.BufferOutputStream()
    pq.write_table(table, sink, **write_kw)
    buf = sink.getvalue()
    fs_for(path).put(path, buf)
    return len(buf)


def open_parquet(path: str):
    """pq.read_table-able handle through the storage contract."""
    return fs_for(path).open_input(path)


def read_parquet_dataset(files: list[str], empty_schema: "pa.Schema"):
    """A Dataset over parquet artifact files through the storage contract:
    ray.data.read_parquet on local paths (row-group splitting), a
    from_items→fs-read map chain on remote schemes."""
    import ray.data

    if not files:
        return ray.data.from_arrow(empty_schema.empty_table())
    if not is_remote(files[0]):
        return ray.data.read_parquet(files)

    def rd(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        return pa.concat_tables(
            [pq.read_table(fs_for(p).open_input(p))
             for p in t["path"].to_pylist()],
            promote_options="permissive",
        )

    return ray.data.from_items(
        [{"path": f} for f in files], override_num_blocks=len(files)
    ).map_batches(rd, batch_format="pyarrow", batch_size=None)
