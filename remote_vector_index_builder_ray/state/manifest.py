"""Job manifest: lineage, checkpoints, metrics.

The analog of the reference's job store + ``TaskResult``
(``app/storage/memory.py:22-57``, ``core/tasks.py:59-77``) — but durable on the
index's object store / filesystem, because our resume unit is the per-partition
segment (SURVEY.md section 4.2). A partition is "committed" when its output
dirs exist AND the manifest records it; all I/O goes through the
``state.fs`` URI layer so the manifest lives wherever the index lives
(local dir, ``mock://`` conformance store, ``s3://`` bucket).
"""

from __future__ import annotations

import time

from remote_vector_index_builder_ray.state import fs


class Manifest:
    FILENAME = "manifest.json"

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = fs.join(index_dir, self.FILENAME)
        self.data: dict = {
            "job_id": None,
            "config": {},
            "status": "RUNNING",
            "created_at": time.time(),
            "partitions": {},
            "stages": {},
            "stats": {},
            "postings_files": [],
            "error_message": None,
        }

    @classmethod
    def load(cls, index_dir: str) -> "Manifest | None":
        m = cls(index_dir)
        if fs.exists(m.path):
            m.data = fs.read_json(m.path)
            return m
        return None

    def save(self) -> None:
        fs.makedirs(self.index_dir)
        fs.write_json_atomic(self.path, self.data)

    # -- partition checkpoints ------------------------------------------------
    def partition_committed(self, pid: str) -> bool:
        p = self.data["partitions"].get(pid)
        return bool(p and p.get("committed"))

    def commit_partition(self, pid: str, lineage: dict) -> None:
        lineage = dict(lineage)
        lineage["committed"] = True
        lineage["committed_at"] = time.time()
        self.data["partitions"][pid] = lineage
        self.save()

    # -- stage checkpoints / metrics -----------------------------------------
    def stage_done(self, name: str) -> bool:
        s = self.data["stages"].get(name)
        return bool(s and s.get("done"))

    def commit_stage(self, name: str, metrics: dict) -> None:
        metrics = dict(metrics)
        metrics["done"] = True
        metrics["committed_at"] = time.time()
        self.data["stages"][name] = metrics
        self.save()

    def finalize(self, status: str = "COMPLETED", error: str | None = None) -> None:
        self.data["status"] = status
        self.data["error_message"] = error
        self.data["finished_at"] = time.time()
        self.save()


def load_base_stats(index_dir: str) -> dict:
    """Base-index stats for scoring, crash-consistent with the postings.

    ``compact_index`` commits a full stats record INSIDE the new postings
    directory (written to the temp dir before the atomic rename), so the
    post-expunge (N, total_len, avgdl) — and the ``compacted_gens`` list
    saying which generations that postings set already folded in — land in
    the SAME rename as the postings themselves. Readers prefer that record;
    the top-level ``stats.json`` (written after the swap) is the fallback
    for indexes that were never compacted. Without this, a crash (or a
    searcher actor init) between the postings swap and the stats write
    would score post-expunge postings with the pre-expunge avgdl, breaking
    BMW's block-max bounds (silently missing true top-k docs)."""
    p = fs.join(index_dir, "postings", "stats.json")
    if fs.exists(p):
        return fs.read_json(p)
    return fs.read_json(fs.join(index_dir, "stats.json"))


# Back-compat alias: the build pipeline imports atomic_write_dir from here.
atomic_write_dir = fs.atomic_write_dir
