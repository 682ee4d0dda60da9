"""BuildService — the job-workflow layer, reproducing the reference's service
semantics library-first (no HTTP; "implement a different API server ... still
use the core libraries", ``USER_GUIDE.md:34-37``).

Parity map (reference ``app/``):
- deterministic job id from (inputs, params)            -> ``app/utils/hash.py:12-28``
- idempotency: same id+params -> same job; same id,
  different params -> HashCollisionError                -> ``app/services/job_service.py:60-83``
- capacity limit -> CapacityError (their HTTP 507)      -> ``app/storage/memory.py:59-75``
- background execution on a bounded thread pool          -> ``app/executors/workflow_executor.py:53-71``
- RUNNING/COMPLETED/FAILED status + error message        -> ``app/models/job.py:28-47``
- TTL eviction of terminal jobs (RUNNING kept)           -> ``app/storage/memory.py:137-158``

The build itself is the Ray Data pipeline (pipelines/build.py); one service
process can drive several concurrent index builds on the shared cluster.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field

from remote_vector_index_builder_ray.config import BuildConfig, EngineError, HashCollisionError
from remote_vector_index_builder_ray.pipelines.build import build_index


class CapacityError(EngineError):
    """Job store at capacity (the reference's HTTP 507 path)."""


@dataclass
class Job:
    job_id: str
    status: str = "RUNNING"
    config: BuildConfig | None = None
    index_dir: str = ""
    error_message: str | None = None
    created_at: float = field(default_factory=time.time)
    finished_at: float | None = None
    manifest: dict | None = None


class BuildService:
    def __init__(self, max_workers: int = 2, max_jobs: int = 64, ttl_seconds: float | None = None):
        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._jobs: dict[str, Job] = {}
        self._by_dir: dict[str, str] = {}  # index_dir -> job_id (collision check)
        self._futures: dict[str, Future] = {}
        self._lock = threading.Lock()
        self.max_jobs = max_jobs
        self.ttl_seconds = ttl_seconds

    # -- API -----------------------------------------------------------------
    def submit(self, cfg: BuildConfig) -> str:
        job_id = cfg.job_id()
        with self._lock:
            self._evict_expired()
            existing = self._jobs.get(job_id)
            if existing is not None:
                return job_id  # idempotent resubmit (same params -> same id)
            # our job id hashes ALL parameters, so the reference's "same key,
            # different params" collision (app/services/job_service.py:60-83)
            # surfaces as: same target index_dir, different job_id
            dir_owner = self._by_dir.get(cfg.index_dir)
            if dir_owner is not None and dir_owner != job_id:
                raise HashCollisionError(
                    f"index_dir {cfg.index_dir} already owned by job "
                    f"{dir_owner[:12]} with different parameters"
                )
            if len(self._jobs) >= self.max_jobs:
                raise CapacityError(f"job store at capacity ({self.max_jobs})")
            job = Job(job_id=job_id, config=cfg, index_dir=cfg.index_dir)
            self._jobs[job_id] = job
            self._by_dir[cfg.index_dir] = job_id
        self._futures[job_id] = self._pool.submit(self._run, job)
        return job_id

    def status(self, job_id: str) -> Job | None:
        with self._lock:
            self._evict_expired()
            return self._jobs.get(job_id)

    def jobs(self) -> list[Job]:
        with self._lock:
            self._evict_expired()
            return list(self._jobs.values())

    def wait(self, job_id: str, timeout: float | None = None) -> Job:
        fut = self._futures.get(job_id)
        if fut is not None:
            fut.result(timeout=timeout)
        job = self.status(job_id)
        if job is None:
            raise KeyError(job_id)
        return job

    def heart_beat(self) -> dict:
        return {"alive": True, "jobs": len(self._jobs), "ts": time.time()}

    def shutdown(self) -> None:
        self._pool.shutdown(wait=True)

    # -- internals -----------------------------------------------------------
    def _run(self, job: Job) -> None:
        try:
            manifest = build_index(job.config)
            with self._lock:
                # job may have been evicted meanwhile (reference handles the
                # same race, workflow_executor.py:128-144)
                if job.job_id in self._jobs:
                    job.status = "COMPLETED"
                    job.manifest = manifest
                    job.finished_at = time.time()
        except Exception as ex:  # noqa: BLE001 — status carries the error
            with self._lock:
                if job.job_id in self._jobs:
                    job.status = "FAILED"
                    job.error_message = f"{type(ex).__name__}: {ex}"
                    job.finished_at = time.time()

    def _evict_expired(self) -> None:
        if self.ttl_seconds is None:
            return
        now = time.time()
        for jid in list(self._jobs):
            j = self._jobs[jid]
            if j.status != "RUNNING" and j.finished_at and now - j.finished_at > self.ttl_seconds:
                del self._jobs[jid]
                self._futures.pop(jid, None)
                if self._by_dir.get(j.index_dir) == jid:
                    del self._by_dir[j.index_dir]
