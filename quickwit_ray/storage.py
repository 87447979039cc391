"""Split-artifact storage seam — quickwit's compute/storage separation.

The reference's primary deployment target is S3-class object storage
(`quickwit-storage/src/object_storage/s3_compatible_storage.rs`):
indexers build splits in LOCAL scratch space, the uploader PUTs the
immutable artifacts to object storage (`actors/uploader.rs:465-506`),
and searchers issue range reads against them. This module gives the
engine the same seam over ``pyarrow.fs``:

  * plain local paths -> os/builtins fast path (byte-identical to the
    pre-round-5 behavior — zero overhead, zero semantic change);
  * ``s3://...``      -> ``pyarrow.fs.S3FileSystem`` (same code path as
    the mock; needs credentials/endpoint via the usual AWS env vars);
  * ``mock-s3://...`` -> an object-store-SEMANTICS filesystem over a
    local directory used in tests: whole-object atomic PUT, NO rename,
    NO append, NO hardlinks, prefix listing. Running the engine's
    build/merge/search/resume suites over it proves nothing in the
    artifact path relies on POSIX rename/link/append.
  * any other scheme  -> ``pyarrow.fs.FileSystem.from_uri`` (GCS, HDFS,
    ...), or a factory installed with :func:`register_filesystem`.

Division of labor mirroring the reference architecture:

  * SPLIT ARTIFACTS (parquet/posting/docstore/blob/footer files) —
    object-store friendly: written once into local staging, uploaded,
    then only ever ranged-read or deleted. All reads/writes go through
    the helpers here.
  * METASTORE — on an object root the manifest uses whole-object PUTs
    of the full snapshot (S3 PUT is atomic: readers see old or new,
    never torn), single writer per index, exactly like the reference's
    file-backed metastore on S3 (`quickwit-metastore` file backend).
    Multi-writer deployments use the SQL metastore (sqlite/postgres)
    with only ARTIFACTS on the object store — the reference's
    PG-metastore + S3-storage layout.
  * WAL / ingest queues — node-local by design (the reference's
    ingester WAL is a local mrecordlog too); they stay on POSIX.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import threading
import uuid
from typing import Callable, Optional

import pyarrow as pa
import pyarrow.fs as pafs

# scheme -> factory(authority_and_path) -> (FileSystem, fs_internal_path)
_FACTORIES: dict[str, Callable[[str], tuple[pafs.FileSystem, str]]] = {}
_FS_CACHE: dict[str, tuple[pafs.FileSystem, str]] = {}
_CACHE_LOCK = threading.Lock()

#: local root backing ``mock-s3://`` buckets. Fixed (not per-process
#: random) so Ray worker processes on the same node resolve the same
#: objects with zero registration; tests isolate via unique bucket names.
MOCK_S3_ROOT = os.environ.get("QW_RAY_MOCK_S3_ROOT",
                              os.path.join(tempfile.gettempdir(),
                                           "qw_ray_mock_s3"))


def register_filesystem(scheme: str,
                        factory: Callable[[str], tuple[pafs.FileSystem, str]]
                        ) -> None:
    """Install a filesystem factory for a URI scheme. ``factory`` takes
    the URI remainder (``bucket/key...``) and returns
    ``(FileSystem, path_inside_fs)``."""
    _FACTORIES[scheme] = factory
    with _CACHE_LOCK:
        for k in [k for k in _FS_CACHE if k.startswith(scheme + "://")]:
            del _FS_CACHE[k]


def is_object_uri(path: str) -> bool:
    """True when ``path`` is a storage URI (``scheme://...``) rather than
    a local filesystem path. ``file://`` counts as local."""
    i = path.find("://")
    if i <= 0:
        return False
    scheme = path[:i]
    return scheme != "file" and scheme.isascii() and "/" not in scheme


def _strip_file_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path


def get_fs(path: str) -> tuple[pafs.FileSystem, str]:
    """Resolve a path/URI to ``(FileSystem, fs_internal_path)``."""
    path = _strip_file_scheme(path)
    if not is_object_uri(path):
        return pafs.LocalFileSystem(), path
    scheme, rest = path.split("://", 1)
    cache_key = scheme + "://" + rest.split("/", 1)[0]
    with _CACHE_LOCK:
        hit = _FS_CACHE.get(cache_key)
    if hit is not None:
        fs, _ = hit
        return fs, rest
    if scheme in _FACTORIES:
        fs, base = _FACTORIES[scheme](rest)
    elif scheme == "mock-s3":
        fs, base = _mock_s3_filesystem(), rest
    else:
        # s3:// and anything else pyarrow knows natively
        fs, base = pafs.FileSystem.from_uri(path)
        rest = base
    with _CACHE_LOCK:
        _FS_CACHE[cache_key] = (fs, "")
    return fs, rest


def join(base: str, *parts: str) -> str:
    """URI-safe path join (object URIs always use '/')."""
    if is_object_uri(base):
        out = base.rstrip("/")
        for p in parts:
            out += "/" + str(p).strip("/")
        return out
    return os.path.join(base, *parts)


def basename(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[-1]


# ---------------------------------------------------------------------------
# I/O helpers — local fast path first, pyarrow.fs otherwise
# ---------------------------------------------------------------------------

def exists(path: str) -> bool:
    if not is_object_uri(path):
        return os.path.exists(_strip_file_scheme(path))
    fs, p = get_fs(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def isdir(path: str) -> bool:
    if not is_object_uri(path):
        return os.path.isdir(_strip_file_scheme(path))
    fs, p = get_fs(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.Directory:
        return True
    if info.type != pafs.FileType.NotFound:
        return False
    # object stores have no real directories: a non-empty prefix IS a dir
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    return len(fs.get_file_info(sel)) > 0


def file_size(path: str) -> int:
    if not is_object_uri(path):
        return os.path.getsize(_strip_file_scheme(path))
    fs, p = get_fs(path)
    return fs.get_file_info(p).size or 0


def listdir(path: str) -> list[str]:
    """Child names (one level). Missing dir -> []."""
    if not is_object_uri(path):
        p = _strip_file_scheme(path)
        return sorted(os.listdir(p)) if os.path.isdir(p) else []
    fs, p = get_fs(path)
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    return sorted({i.path[len(p):].lstrip("/").split("/")[0]
                   for i in fs.get_file_info(sel)})


def list_files(path: str, suffix: str = "") -> list[str]:
    """Full paths of regular files directly under ``path`` (sorted)."""
    if not is_object_uri(path):
        p = _strip_file_scheme(path)
        if not os.path.isdir(p):
            return []
        return sorted(os.path.join(p, n) for n in os.listdir(p)
                      if n.endswith(suffix)
                      and os.path.isfile(os.path.join(p, n)))
    fs, p = get_fs(path)
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    scheme = path.split("://", 1)[0]
    return sorted(f"{scheme}://{i.path}" for i in fs.get_file_info(sel)
                  if i.type == pafs.FileType.File
                  and i.path.endswith(suffix))


def makedirs(path: str) -> None:
    if not is_object_uri(path):
        os.makedirs(_strip_file_scheme(path), exist_ok=True)
        return
    fs, p = get_fs(path)
    fs.create_dir(p, recursive=True)


def remove(path: str) -> None:
    if not is_object_uri(path):
        os.remove(_strip_file_scheme(path))
        return
    fs, p = get_fs(path)
    fs.delete_file(p)


def rmtree(path: str, ignore_errors: bool = False) -> None:
    if not is_object_uri(path):
        shutil.rmtree(_strip_file_scheme(path), ignore_errors=ignore_errors)
        return
    fs, p = get_fs(path)
    try:
        fs.delete_dir(p)
    except (FileNotFoundError, OSError):
        if not ignore_errors:
            raise


def getmtime(path: str) -> float:
    """Modification time (epoch seconds); 0.0 when the store has none."""
    if not is_object_uri(path):
        return os.path.getmtime(_strip_file_scheme(path))
    fs, p = get_fs(path)
    mt = fs.get_file_info(p).mtime
    return mt.timestamp() if mt is not None else 0.0


def read_bytes(path: str) -> bytes:
    if not is_object_uri(path):
        with open(_strip_file_scheme(path), "rb") as f:
            return f.read()
    fs, p = get_fs(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def write_bytes(path: str, data: bytes) -> None:
    """Atomic whole-object write: local = tmp file + rename; object
    store = one PUT (atomic by the store's contract — readers see the
    old object or the new one, never a torn one)."""
    if not is_object_uri(path):
        p = _strip_file_scheme(path)
        tmp = f"{p}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)
        return
    fs, p = get_fs(path)
    with fs.open_output_stream(p) as f:
        f.write(data)


def open_input(path: str) -> pa.NativeFile:
    """Random-access input handle (seek + read => object-store range
    reads). Local paths return a memory-mappable OSFile."""
    if not is_object_uri(path):
        return pa.OSFile(_strip_file_scheme(path), "rb")
    fs, p = get_fs(path)
    return fs.open_input_file(p)


def parquet_location(path: str):
    """``(path_for_pyarrow, filesystem_or_None)`` for
    ``pq.read_table(path, filesystem=fs)`` / ``pq.ParquetFile``.
    Local paths keep the plain-string fast path."""
    if not is_object_uri(path):
        return _strip_file_scheme(path), None
    fs, p = get_fs(path)
    return p, fs


def upload_file(local_src: str, dst: str) -> None:
    """PUT one local file to ``dst`` (local dst = copy)."""
    if not is_object_uri(dst):
        d = _strip_file_scheme(dst)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        shutil.copyfile(local_src, d)
        return
    fs, p = get_fs(dst)
    with open(local_src, "rb") as src, fs.open_output_stream(p) as out:
        shutil.copyfileobj(src, out, length=8 << 20)


def download_file(src: str, local_dst: str) -> None:
    """GET ``src`` into a local file (local src = copy)."""
    if not is_object_uri(src):
        shutil.copyfile(_strip_file_scheme(src), local_dst)
        return
    fs, p = get_fs(src)
    with fs.open_input_stream(p) as f, open(local_dst, "wb") as out:
        shutil.copyfileobj(f, out, length=8 << 20)


def upload_dir(local_dir: str, dst_dir: str) -> list[str]:
    """Upload every regular file in ``local_dir`` (flat — split dirs
    have no nesting) to ``dst_dir``; returns uploaded names."""
    names = sorted(n for n in os.listdir(local_dir)
                   if os.path.isfile(os.path.join(local_dir, n)))
    makedirs(dst_dir)
    for n in names:
        upload_file(os.path.join(local_dir, n), join(dst_dir, n))
    return names


# ---------------------------------------------------------------------------
# Staging: splits are BUILT locally, then finalized (rename locally /
# upload to object storage) — the reference's packager->uploader flow.
# ---------------------------------------------------------------------------

def staging_dir(final_dir: str, tag: str = "staged") -> str:
    """Local scratch dir where a split's artifacts are written before
    :func:`finalize_dir` makes them live at ``final_dir``."""
    if not is_object_uri(final_dir):
        return _strip_file_scheme(final_dir) + "." + tag
    spool = os.path.join(tempfile.gettempdir(), "qw_ray_spool")
    os.makedirs(spool, exist_ok=True)
    # deterministic per final_dir: a retried task reuses (and rebuilds)
    # the same staging dir instead of leaking one per attempt
    import hashlib
    h = hashlib.sha1(final_dir.encode()).hexdigest()[:16]
    return os.path.join(spool, f"{basename(final_dir)}.{h}.{tag}")


def finalize_dir(staging: str, final_dir: str) -> None:
    """Make a fully-written staging dir live at ``final_dir``.

    Local: atomic ``os.replace`` (the pre-round-5 behavior). Object
    store: upload every file, then drop the local staging copy. The
    upload is NOT atomic as a set — exactly like the reference, the
    split only becomes LIVE when the manifest publishes it afterwards;
    partially-uploaded dirs are invisible and garbage-collected."""
    if not is_object_uri(final_dir):
        f = _strip_file_scheme(final_dir)
        if os.path.isdir(f):
            shutil.rmtree(f)
        os.replace(staging, f)
        return
    if isdir(final_dir):  # retried task: clear the partial upload
        rmtree(final_dir, ignore_errors=True)
    upload_dir(staging, final_dir)
    shutil.rmtree(staging, ignore_errors=True)


def fetch_to_local(src: str, scratch_dir: str) -> str:
    """Return a LOCAL path for ``src``: the path itself when local, else
    a downloaded copy under ``scratch_dir`` (merge 'hardlink' fallback
    on object storage — a byte copy, like the reference's merge split
    downloader)."""
    if not is_object_uri(src):
        return _strip_file_scheme(src)
    os.makedirs(scratch_dir, exist_ok=True)
    dst = os.path.join(scratch_dir, basename(src))
    if not os.path.exists(dst):
        tmp = dst + f".dl.{uuid.uuid4().hex[:8]}"
        download_file(src, tmp)
        os.replace(tmp, dst)
    return dst


# ---------------------------------------------------------------------------
# mock-s3:// — object-store semantics over a local directory (tests)
# ---------------------------------------------------------------------------

class _AtomicPut:
    """File-like buffer that becomes visible ATOMICALLY at close —
    emulating the S3 whole-object PUT contract on a local backing dir."""

    def __init__(self, final_path: str):
        os.makedirs(os.path.dirname(final_path), exist_ok=True)
        self._final = final_path
        self._tmp = final_path + f".__put.{uuid.uuid4().hex[:8]}"
        self._f = open(self._tmp, "wb")
        self.closed = False

    def write(self, data) -> int:
        return self._f.write(data)

    def flush(self) -> None:
        self._f.flush()

    def readable(self) -> bool:
        return False

    def writable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    def tell(self) -> int:
        return self._f.tell()

    def close(self) -> None:
        if self.closed:
            return
        self._f.close()
        os.replace(self._tmp, self._final)
        self.closed = True


class MockS3Handler(pafs.FileSystemHandler):
    """Object-store-semantics ``pyarrow.fs`` handler over a local root.

    Enforces what S3 cannot do — ``move`` (rename) and
    ``open_append_stream`` raise — so the engine's build/merge/search
    suites running over it PROVE the artifact path never relies on
    POSIX rename/append/hardlinks. Counts GETs/PUTs for the
    read-amplification bench."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.get_count = 0
        self.put_count = 0
        self.bytes_read = 0

    # -- identity ---------------------------------------------------------
    def get_type_name(self) -> str:
        return "mock-s3"

    def normalize_path(self, path: str) -> str:
        return path.strip("/")

    def __eq__(self, other):
        return isinstance(other, MockS3Handler) and other.root == self.root

    def __ne__(self, other):
        return not self.__eq__(other)

    # -- helpers ------------------------------------------------------------
    def _local(self, path: str) -> str:
        p = os.path.normpath(os.path.join(self.root, path.strip("/")))
        if not p.startswith(os.path.abspath(self.root)):
            raise ValueError(f"path escapes mock-s3 root: {path!r}")
        return p

    def _info(self, path: str) -> pafs.FileInfo:
        lp = self._local(path)
        if os.path.isfile(lp):
            st = os.stat(lp)
            return pafs.FileInfo(path.strip("/"), pafs.FileType.File,
                                 size=st.st_size, mtime_ns=st.st_mtime_ns)
        if os.path.isdir(lp):
            # NO mtime, like real S3: a "directory" is only a key prefix
            # there — code that ages artifacts must use the contained
            # objects' mtimes (caught the GC grace hole in round 5)
            return pafs.FileInfo(path.strip("/"), pafs.FileType.Directory)
        return pafs.FileInfo(path.strip("/"), pafs.FileType.NotFound)

    # -- info ---------------------------------------------------------------
    def get_file_info(self, paths) -> list[pafs.FileInfo]:
        return [self._info(p) for p in paths]

    def get_file_info_selector(self, selector) -> list[pafs.FileInfo]:
        base = selector.base_dir.strip("/")
        lp = self._local(base)
        if not os.path.isdir(lp):
            if selector.allow_not_found:
                return []
            raise FileNotFoundError(base)
        out = []
        if selector.recursive:
            for dirpath, dirnames, filenames in os.walk(lp):
                rel = os.path.relpath(dirpath, lp)
                prefix = base if rel == "." else f"{base}/{rel}"
                out.extend(self._info(f"{prefix}/{d}") for d in dirnames)
                out.extend(self._info(f"{prefix}/{f}") for f in filenames)
        else:
            out.extend(self._info(f"{base}/{n}") for n in os.listdir(lp))
        return out

    # -- mutation -------------------------------------------------------------
    def create_dir(self, path: str, recursive: bool) -> None:
        # object stores have no directories; emulate so the local walk works
        os.makedirs(self._local(path), exist_ok=True)

    def delete_dir(self, path: str) -> None:
        shutil.rmtree(self._local(path))

    def delete_dir_contents(self, path: str, missing_dir_ok: bool = False
                            ) -> None:
        lp = self._local(path)
        if not os.path.isdir(lp):
            if missing_dir_ok:
                return
            raise FileNotFoundError(path)
        for n in os.listdir(lp):
            full = os.path.join(lp, n)
            shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)

    def delete_root_dir_contents(self) -> None:
        self.delete_dir_contents("")

    def delete_file(self, path: str) -> None:
        os.remove(self._local(path))

    def move(self, src: str, dest: str) -> None:
        raise NotImplementedError(
            "object stores cannot rename — mock-s3 forbids move() so the "
            "test suite proves the artifact path never relies on it")

    def copy_file(self, src: str, dest: str) -> None:
        # server-side copy is a real S3 capability
        d = self._local(dest)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        shutil.copyfile(self._local(src), d)

    # -- streams -----------------------------------------------------------
    def open_input_stream(self, path: str) -> pa.NativeFile:
        self.get_count += 1
        lp = self._local(path)
        if not os.path.isfile(lp):
            raise FileNotFoundError(path)
        self.bytes_read += os.path.getsize(lp)
        return pa.OSFile(lp, "rb")

    def open_input_file(self, path: str) -> pa.NativeFile:
        lp = self._local(path)
        if not os.path.isfile(lp):
            raise FileNotFoundError(path)
        return pa.PythonFile(_CountingReader(lp, self), mode="r")

    def open_output_stream(self, path: str, metadata) -> pa.NativeFile:
        self.put_count += 1
        return pa.PythonFile(_AtomicPut(self._local(path)), mode="w")

    def open_append_stream(self, path: str, metadata) -> pa.NativeFile:
        raise NotImplementedError(
            "object stores cannot append — mock-s3 forbids it so the test "
            "suite proves the artifact path never relies on it")


class _CountingReader:
    """Random-access reader that counts ranged GETs + bytes for the
    read-amplification bench: every ``read()`` models one ranged GET
    against the object (pyarrow coalesces adjacent ranges upstream)."""

    def __init__(self, local_path: str, handler: MockS3Handler):
        self._f = open(local_path, "rb")
        self._h = handler
        self._size = os.path.getsize(local_path)
        self.closed = False

    def read(self, nbytes: int = -1) -> bytes:
        self._h.get_count += 1
        data = self._f.read(nbytes)
        self._h.bytes_read += len(data)
        return data

    def seek(self, offset: int, whence: int = 0) -> int:
        return self._f.seek(offset, whence)

    def tell(self) -> int:
        return self._f.tell()

    def size(self) -> int:
        return self._size

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def seekable(self) -> bool:
        return True

    def flush(self) -> None:
        pass

    def close(self) -> None:
        if not self.closed:
            self._f.close()
            self.closed = True


def _mock_s3_filesystem() -> pafs.FileSystem:
    return pafs.PyFileSystem(MockS3Handler(MOCK_S3_ROOT))


def mock_s3_handler(path: str) -> Optional[MockS3Handler]:
    """The live MockS3Handler behind a mock-s3:// URI's cached
    filesystem (bench/test introspection: GET/PUT counters)."""
    if not path.startswith("mock-s3://"):
        return None
    fs, _ = get_fs(path)
    handler = getattr(fs, "handler", None)
    return handler if isinstance(handler, MockS3Handler) else None
