"""Object-store / filesystem abstraction for every index I/O path.

The analog of the reference's ``ObjectStore`` ABC + scheme factory
(``core/object_store/object_store.py:13-61``,
``core/object_store/object_store_factory.py:27-56``,
``core/object_store/s3/s3_object_store.py:216-359``): the index directory is a
URI, every byte of index state (docmeta, segments, postings, manifest, stats)
moves through a ``pyarrow.fs.FileSystem``, and build tasks / merge tasks /
searcher actors on ANY node resolve the same URI to the same store. Plain
paths resolve to the local filesystem (unchanged single-node behavior);
``s3://`` etc. resolve through ``pyarrow.fs.FileSystem.from_uri`` (multipart,
retries and parallel range reads are pyarrow/fsspec's job — the hand-rolled
boto3 chunking in the reference collapses into the filesystem layer);
``mock://`` resolves to a ``SubTreeFileSystem`` posing as a remote store, used
by the conformance suite to prove no code path touches ``os.*`` on index URIs.

Resolution is a pure function of the URI, so any Ray worker — driver, build
task, merge task, searcher actor — resolves identically with no shared state.
pyarrow filesystems also pickle cleanly into task closures.
"""

from __future__ import annotations

import json
import os
import posixpath

import pyarrow.fs as pafs

# Root directory backing the mock:// "remote object store" scheme.
MOCK_ROOT = "/tmp/graft_mockfs"


def resolve(uri: str) -> tuple[pafs.FileSystem, str]:
    """URI -> (filesystem, path-within-filesystem).

    - no scheme -> LocalFileSystem + the path unchanged
    - ``mock://<store>/<path>`` -> SubTreeFileSystem over MOCK_ROOT/<store>
      (a stand-in remote store: paths inside it are meaningless to ``os.*``)
    - anything else -> ``pyarrow.fs.FileSystem.from_uri`` (s3://, gs://, ...)
    """
    if "://" not in uri:
        return pafs.LocalFileSystem(), uri
    scheme, rest = uri.split("://", 1)
    if scheme == "mock":
        store, _, path = rest.partition("/")
        base = os.path.join(MOCK_ROOT, store)
        os.makedirs(base, exist_ok=True)
        return pafs.SubTreeFileSystem(base, pafs.LocalFileSystem()), path
    fs, path = pafs.FileSystem.from_uri(uri)
    return fs, path


def is_local(uri: str) -> bool:
    return "://" not in uri


def join(uri: str, *parts: str) -> str:
    """Join path components onto a URI (POSIX separators throughout)."""
    return posixpath.join(uri, *parts)


def exists(uri: str) -> bool:
    fs, path = resolve(uri)
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def file_size(uri: str) -> int:
    fs, path = resolve(uri)
    info = fs.get_file_info(path)
    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(uri)
    return int(info.size or 0)


def listdir(uri: str, recursive: bool = False, files_only: bool = False) -> list[str]:
    """Names (relative to ``uri``) of entries under a directory URI; [] if the
    directory does not exist. Sorted for determinism. ``files_only`` drops
    directory entries (a recursive listing includes them)."""
    fs, path = resolve(uri)
    try:
        infos = fs.get_file_info(pafs.FileSelector(path, recursive=recursive, allow_not_found=True))
    except FileNotFoundError:
        return []
    base = path.rstrip("/")
    out = []
    for info in infos:
        if files_only and info.type != pafs.FileType.File:
            continue
        rel = info.path[len(base) + 1 :] if info.path.startswith(base + "/") else info.path
        out.append(rel)
    return sorted(out)


def makedirs(uri: str) -> None:
    fs, path = resolve(uri)
    fs.create_dir(path, recursive=True)


def rm_tree(uri: str) -> None:
    fs, path = resolve(uri)
    try:
        fs.delete_dir(path)
    except (FileNotFoundError, OSError):
        pass


def open_input(uri: str):
    fs, path = resolve(uri)
    return fs.open_input_file(path)


def open_output(uri: str):
    fs, path = resolve(uri)
    return fs.open_output_stream(path)


def read_json(uri: str) -> dict:
    with open_input(uri) as f:
        return json.loads(f.read().decode())


def write_json_atomic(uri: str, data: dict) -> None:
    """Write JSON so a reader never sees a partial file.

    Local filesystems: write temp + atomic rename. Object stores: a single
    PUT is already atomic (the object appears whole or not at all) — write
    directly; there is no rename primitive to lean on.
    """
    payload = json.dumps(data, indent=1, default=str).encode()
    fs, path = resolve(uri)
    if isinstance(fs, pafs.LocalFileSystem):
        tmp = path + ".tmp"
        with fs.open_output_stream(tmp) as f:
            f.write(payload)
        os.replace(tmp, path)
    else:
        with fs.open_output_stream(path) as f:
            f.write(payload)


def move_dir(src_uri: str, dst_uri: str) -> None:
    """Move/rename a directory tree. Uses the filesystem's native move where
    supported (local: one rename); falls back to per-file copy + delete for
    object stores with no directory rename."""
    fs, src = resolve(src_uri)
    _, dst = resolve(dst_uri)
    try:
        fs.move(src, dst)
        return
    except Exception:  # noqa: BLE001 — no portable "move unsupported" error type
        pass
    # object-store fallback: copy file-by-file, then delete the source tree
    infos = fs.get_file_info(pafs.FileSelector(src, recursive=True))
    fs.create_dir(dst, recursive=True)
    for info in infos:
        rel = info.path[len(src.rstrip("/")) + 1 :]
        if info.type == pafs.FileType.Directory:
            fs.create_dir(posixpath.join(dst, rel), recursive=True)
        else:
            fs.copy_file(info.path, posixpath.join(dst, rel))
    fs.delete_dir(src)


def atomic_write_dir(write_fn, final_uri: str) -> None:
    """Run ``write_fn(tmp_uri)`` then commit by renaming to ``final_uri``.

    Idempotent checkpoint write: a crashed/retried attempt leaves only a tmp
    dir, never a partial final dir. (On object stores the final move is
    copy+delete — still safe because the manifest only records the partition
    AFTER the move completes; a crash mid-move re-runs the whole write.)
    """
    tmp = final_uri + ".tmp"
    rm_tree(tmp)
    makedirs(tmp)
    write_fn(tmp)
    rm_tree(final_uri)
    move_dir(tmp, final_uri)


# -- Ray Data / pyarrow adapters --------------------------------------------


def for_ray(uri: str) -> dict:
    """kwargs for ray.data.read_parquet / Dataset.write_parquet: resolved
    path + filesystem. For plain local paths returns the URI unchanged with
    no filesystem override (Ray's default fast path)."""
    if is_local(uri):
        return {"path": uri}
    fs, path = resolve(uri)
    return {"path": path, "filesystem": fs}


def for_ray_paths(paths: list[str]) -> dict:
    """kwargs for ray.data.read_parquet over a LIST of path URIs. All paths
    must share one scheme (one store per read — mixing stores in a single
    read is not supported)."""
    if all(is_local(p) for p in paths):
        return {"paths": list(paths)}
    resolved = [resolve(p) for p in paths]
    return {"paths": [p for _, p in resolved], "filesystem": resolved[0][0]}


def read_table(uri: str, **kwargs):
    import pyarrow.parquet as pq

    fs, path = resolve(uri)
    return pq.read_table(path, filesystem=fs, **kwargs)


def write_table(table, uri: str, **kwargs) -> None:
    import pyarrow.parquet as pq

    fs, path = resolve(uri)
    pq.write_table(table, path, filesystem=fs, **kwargs)
