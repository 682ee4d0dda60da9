"""Job manifest: lineage, checkpoints, metrics.

The analog of the reference's job store + ``TaskResult``
(``app/storage/memory.py:22-57``, ``core/tasks.py:59-77``) — but durable on the
filesystem next to the index, because our resume unit is the per-partition
segment (SURVEY.md section 4.2). A partition is "committed" when its output
dirs exist AND the manifest records it; writes are temp+rename so retries are
idempotent (Ray may re-run tasks).
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    FILENAME = "manifest.json"

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, self.FILENAME)
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
        if os.path.exists(m.path):
            with open(m.path) as f:
                m.data = json.load(f)
            return m
        return None

    def save(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, default=str)
        os.replace(tmp, self.path)

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


def atomic_write_dir(write_fn, final_dir: str) -> None:
    """Run ``write_fn(tmp_dir)`` then atomically rename to ``final_dir``.

    Idempotent checkpoint write: a crashed/retried attempt leaves only a tmp
    dir, never a partial final dir.
    """
    import shutil

    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    write_fn(tmp)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp, final_dir)
