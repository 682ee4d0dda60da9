"""QueryService — a warm, persistent searcher pool for request-serving.

The pipeline path (``pipelines/query.search``) builds a FRESH actor pool per
call — right for batch jobs, wasteful for a request-serving service where
every ``POST /_search`` would pay pool spin-up plus cold per-actor term
caches. This module reproduces the way a search engine actually serves
queries (an OpenSearch index stays OPEN: segment readers, dictionaries and
caches persist across requests; the reference keeps its FAISS index loaded
in the serving process for the same reason):

* A pool of raw ``BM25Searcher`` actors per (index_dir, mode, options) is
  created ONCE and reused across requests — a request costs one round of
  actor method calls, and per-actor term/dictionary caches stay warm.
* Pools are keyed by a **manifest fingerprint** (SHA-256 of the index's
  ``manifest.json`` bytes). Every committed mutation — append, delete,
  update_by_query, compact, rebucket — rewrites the manifest, so a stale
  pool retires ATOMICALLY on the next request and a fresh one warms against
  the new index state (the Lucene reader-reopen model; no TTLs, no manual
  invalidation).
* Least-recently-used pools are killed beyond ``max_pools`` (bounded actor
  count, the searcher analog of BuildService's bounded job store).

Scale note (multi-node): the actors carry no affinity constraints, so Ray
spreads a pool across the cluster; ``pool_size`` defaults to the cluster CPU
count capped at 16 per index. Queries fan out in ``batch_size`` slices
round-robin over the pool — the same per-batch unit the pipeline path uses,
without the per-call pool construction.
"""

from __future__ import annotations

import hashlib
import threading
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from remote_vector_index_builder_ray.config import EngineError
from remote_vector_index_builder_ray.state import fs


def manifest_fingerprint(index_dir: str) -> str:
    """SHA-256 of the committed manifest bytes: cheap (one small read), and
    changes on every committed index mutation."""
    with fs.open_input(fs.join(index_dir, "manifest.json")) as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


class _Pool:
    def __init__(self, actors: list, created_at: float):
        self.actors = actors
        self.created_at = created_at
        self.last_used = created_at
        self.inflight = 0      # requests currently holding this pool
        self.retired = False   # removed from the table; kill when drained


class QueryService:
    """Serve searches from warm per-index searcher pools (module docstring).

    Supported per-request arguments: ``mode``, ``similarity`` (each
    (index, mode, similarity) warms its own pool — the nine similarity
    modules plus ``scripted:<expr>`` serve over HTTP) and ``k`` (via the
    queries frame). Other options that change actor STATE (operator,
    min_should_match, span windows, ...) are per-POOL: pass them to
    ``__init__``'s ``searcher_kwargs`` or use the batch path
    (``pipelines/query.search``) which validates the full surface. Per-request filter context (`where`)
    is deliberately not offered here — a filtered request belongs on the
    batch path where the allow-list broadcast is built per call."""

    _POSITIONAL = ("phrase", "span_near", "span_first", "span_not",
                   "intervals", "span_containing", "span_within")
    _MODES = _POSITIONAL + ("bmw", "wand", "exhaustive", "constant", "dismax")

    def __init__(self, pool_size: int | None = None, max_pools: int = 8,
                 batch_size: int = 16, actor_num_cpus: float = 0.5,
                 max_cpu_fraction: float = 0.5,
                 **searcher_kwargs):
        if pool_size is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            pool_size = max(2, min(16, cpus // 2))
        self.pool_size = int(pool_size)
        self.max_pools = int(max_pools)
        self.batch_size = int(batch_size)
        # persistent actors RESERVE their CPUs for their whole lifetime —
        # unlike a per-call pipeline pool that releases them at the end. The
        # 0.5 default lets idle serving pools coexist with batch pipelines on
        # the same cluster (an idle reservation of pool_size full cores can
        # starve a concurrent build/search pipeline into deadlock); a
        # latency-dedicated deployment should set 1.0 and size
        # max_pools * pool_size to the cluster share it owns.
        self.actor_num_cpus = float(actor_num_cpus)
        # hard CPU-reservation ceiling across ALL warm pools, as a fraction
        # of cluster CPUs: max_pools alone bounds the POOL COUNT, but
        # max_pools * pool_size * actor_num_cpus can exceed the cluster on
        # a small one (8 * 2 * 0.5 = 8 CPUs on a 4-CPU node) — persistent
        # reservations then starve every batch pipeline sharing the cluster
        # into deadlock. Beyond the budget, least-recently-used pools
        # retire (drain-then-kill, same as LRU-count eviction); a
        # latency-dedicated deployment sets 1.0.
        self.max_cpu_fraction = float(max_cpu_fraction)
        self.searcher_kwargs = searcher_kwargs
        self._pools: dict[tuple, _Pool] = {}
        self._draining: set = set()  # retired pools with in-flight requests
        # the HTTP facade serves requests from a ThreadingHTTPServer —
        # pool lifecycle (check-create-evict) must be atomic or two
        # concurrent first-requests double-create a pool and leak the
        # loser's actors
        self._lock = threading.Lock()

    # -- pool lifecycle -------------------------------------------------------
    def _acquire_pool(self, index_dir: str, mode: str,
                      similarity: str = "bm25") -> _Pool:
        """Atomically look up / create the pool AND register this request as
        in-flight — retirement (fingerprint change, LRU eviction, shutdown)
        only marks a pool retired; its actors die when the LAST in-flight
        request releases it, so a concurrent request never sees its actors
        ray.kill()ed mid-batch."""
        from remote_vector_index_builder_ray.stages.search import BM25Searcher

        fp = manifest_fingerprint(index_dir)
        key = (index_dir, mode, similarity, fp)
        with self._lock:
            pool = self._pools.get(key)
            if pool is None:
                # a changed fingerprint means the index mutated: retire every
                # stale pool for this (index_dir, mode, similarity) before
                # warming the new one
                for k in [k for k in self._pools
                          if k[0] == index_dir and k[1] == mode
                          and k[2] == similarity]:
                    self._retire_locked(k)
                if mode in self._POSITIONAL:
                    self._require_positions(index_dir)
                kw = dict(self.searcher_kwargs)
                if similarity != "bm25":
                    if "similarity" in kw:
                        raise ValueError(
                            "per-request similarity conflicts with the "
                            "pool-level searcher_kwargs similarity")
                    kw["similarity"] = similarity
                act = ray.remote(num_cpus=self.actor_num_cpus)(BM25Searcher)
                actors = [
                    act.remote(index_dir, mode, None, **kw)
                    for _ in range(self.pool_size)
                ]
                pool = self._pools[key] = _Pool(actors, time.time())
                self._evict_lru_locked(keep=key)
            pool.last_used = time.time()
            pool.inflight += 1
        return pool

    def _release_pool(self, pool: _Pool) -> None:
        with self._lock:
            pool.inflight -= 1
            if pool.retired and pool.inflight == 0:
                for a in pool.actors:
                    ray.kill(a)
                self._draining.discard(pool)

    def _retire_locked(self, key: tuple) -> None:
        pool = self._pools.pop(key, None)
        if pool is not None:
            pool.retired = True
            if pool.inflight == 0:
                for a in pool.actors:
                    ray.kill(a)
            else:
                # actors stay alive (and keep their CPU reservation) until
                # the last in-flight request releases; the budget sum must
                # keep seeing them or a retire-then-create race oversubscribes
                self._draining.add(pool)

    def _evict_lru_locked(self, keep: tuple | None = None) -> None:
        """Retire least-recently-used pools beyond the count bound
        (max_pools) AND the CPU-reservation bound (max_cpu_fraction of
        cluster CPUs). ``keep`` (the pool just acquired) is never evicted —
        even a pool that alone exceeds the budget must serve its in-flight
        request; the bound then applies to everything else."""
        def _lru():
            cands = [k for k in self._pools if k != keep]
            return min(cands, key=lambda k: self._pools[k].last_used) \
                if cands else None

        while len(self._pools) > self.max_pools:
            key = _lru()
            if key is None:
                return
            self._retire_locked(key)
        budget = float(ray.cluster_resources().get("CPU", 8)) \
            * self.max_cpu_fraction
        # retired-but-draining pools still hold their reservations until the
        # last in-flight request releases them — count them, so back-to-back
        # retire-then-create cannot silently stack reservations past the
        # budget. The bound is still best-effort DURING a drain window (the
        # drainers cannot be killed early), but the evictor sees the truth.
        while (sum(len(p.actors) * self.actor_num_cpus
                   for p in self._pools.values())
               + sum(len(p.actors) * self.actor_num_cpus
                     for p in self._draining)) > budget:
            key = _lru()
            if key is None:
                return
            self._retire_locked(key)

    @staticmethod
    def _require_positions(index_dir: str) -> None:
        man = fs.read_json(fs.join(index_dir, "manifest.json"))
        pos_dirs = [fs.join(index_dir, "positions")] + [
            fs.join(index_dir, g["dir"], "positions")
            for g in man.get("generations", [])
            if not g.get("compacted")
        ]
        if not any(fs.exists(d) for d in pos_dirs):
            raise EngineError(
                f"index at {index_dir} has no positional data; "
                "build with BuildConfig(positions=True) to enable phrase search"
            )

    def shutdown(self) -> None:
        with self._lock:
            for key in list(self._pools):
                self._retire_locked(key)

    # -- serving ---------------------------------------------------------------
    def search(self, index_dir: str, queries: pd.DataFrame,
               mode: str = "bmw", similarity: str = "bm25") -> pd.DataFrame:
        """Top-k over a warm pool. ``queries``: (query_id:int64, text:string,
        k:int32) — the pipeline contract — plus the optional positional-mode
        columns (slop:int, span_exclude:string for span_not,
        span_little:string for span_containing/span_within). Returns
        (query_id, rank, docid, score) sorted (query_id, rank); results are
        identical to ``pipelines/query.search`` (same searcher class, same
        per-batch unit)."""
        if not isinstance(queries, pd.DataFrame):
            raise TypeError("QueryService.search expects a pandas DataFrame")
        if mode not in self._MODES:
            # fail fast: an unknown mode would silently fall through the
            # searcher's dispatch chain to the exhaustive scorer — wrong
            # semantics with a 200 status for a typo'd HTTP request
            raise ValueError(
                f"unknown mode {mode!r}; supported: {sorted(self._MODES)}"
            )
        if similarity != "bm25":
            # per-request similarity module: each (index, mode, similarity)
            # gets its own warm pool. Validate HERE, not inside the actor
            # constructor, so a typo'd request is a clear 400 instead of a
            # dead actor pool
            from remote_vector_index_builder_ray.functions.bm25 import (
                SIMILARITIES,
                compile_sim_script,
            )

            if similarity.startswith("scripted:"):
                compile_sim_script(similarity[len("scripted:"):])
            elif similarity not in SIMILARITIES:
                raise ValueError(
                    f"unknown similarity {similarity!r}; supported: "
                    f"{list(SIMILARITIES)} or 'scripted:<expr>'")
            if mode != "exhaustive":
                raise ValueError(
                    "non-BM25 similarities require mode='exhaustive' "
                    "(stored block maxes are BM25 bounds)")
        if mode in ("span_containing", "span_within"):
            # without a little span these scorers return zero rows — a
            # silent-success hole over HTTP (200 + empty) — and a per-ROW
            # null/empty little is the same hole one row at a time, so the
            # serving path rejects both (the batch path keeps its documented
            # None-little == no-match semantics); span_not without
            # span_exclude is different: it degenerates to the inner span
            # by documented Lucene semantics, so it stays allowed
            if "span_little" not in queries.columns:
                raise ValueError(
                    f"{mode} requires a span_little column (the inner span) "
                    "on the queries frame; without it every query returns "
                    "0 rows"
                )
            bad = queries["span_little"].isna() | (
                queries["span_little"].astype(str).str.strip() == "")
            if bad.any():
                raise ValueError(
                    f"{mode}: span_little is null/empty for query_id(s) "
                    f"{queries.loc[bad, 'query_id'].tolist()} — each query "
                    "needs an inner span (a null little matches nothing)"
                )
        pool = self._acquire_pool(index_dir, mode, similarity)
        try:
            q = queries
            if mode in self._POSITIONAL and len(q) > 1:
                # bucket-affine batching (pipelines/query.search does the
                # same): cluster each batch's positional loads into few
                # bucket files
                import zlib

                man = fs.read_json(fs.join(index_dir, "manifest.json"))
                nb = int(man["num_buckets"])
                first_tok = (
                    q["text"].fillna("").str.lower()
                    .str.extract(r"([a-z0-9_]+)", expand=False).fillna("")
                )
                bkt = first_tok.map(lambda t: zlib.crc32(t.encode()) % nb)
                q = (q.assign(_bkt=bkt.to_numpy())
                     .sort_values(["_bkt"], kind="mergesort")
                     .drop(columns=["_bkt"]).reset_index(drop=True))
            tbl = pa.Table.from_pandas(q, preserve_index=False)
            futures = [
                pool.actors[i % len(pool.actors)].__call__.remote(
                    tbl.slice(off, self.batch_size))
                for i, off in enumerate(range(0, tbl.num_rows,
                                              self.batch_size))
            ]
            parts = [p for p in ray.get(futures) if p.num_rows]
        finally:
            self._release_pool(pool)
        if not parts:
            return pd.DataFrame({
                "query_id": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int32),
                "docid": pd.Series(dtype=np.int64),
                "score": pd.Series(dtype=np.float64),
            })
        out = pa.concat_tables(parts).to_pandas()
        return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
