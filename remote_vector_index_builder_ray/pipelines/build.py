"""The index-build pipeline — the analog of ``core.tasks.run_tasks``
(``/root/reference/remote_vector_index_builder/core/tasks.py:80-211``),
re-expressed as a sequence of Ray Data stages with per-partition checkpoints.

Phases (each a checkpointed manifest stage; a re-run skips committed work —
the row-level analog of the reference's job-id idempotency,
``app/services/job_service.py:60-83``):

  0. conv-offset pass: tiny 2-column ``groupby(conv_id)`` -> docid offsets
     (no 100 TB sort; see stages/docids.py)
  A. per input partition p: read -> [dedup] -> assign docids -> tokenize ->
     write ``docmeta/part-p`` (stored fields + doc_len) and
     ``segments/part-p`` (SPIMI posting partials). Partition = resume unit.
  B. corpus stats from per-partition lineage sums (no extra pass)
  C. merge: per-bucket Ray tasks over the hive-partitioned partials (the
     map-side file shuffle) -> compressed postings + term stats per bucket,
     deterministic ``bucket-NNNNN.parquet`` names the searcher addresses by
     ``crc32(term) %% num_buckets``

All heavy flows stream block-by-block with backpressure; nothing materializes
the full corpus. Writes are atomic (temp dir + rename) so Ray task retries and
job re-runs are idempotent.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import ray.data

from remote_vector_index_builder_ray.config import (
    BuildConfig,
    EngineError,
    HashCollisionError,
)
from remote_vector_index_builder_ray.sources.transcripts import read_transcripts
from remote_vector_index_builder_ray.stages.docids import (
    ShardedOffsets,
    assign_docids_dense,
    assign_docids_sort,
    compute_conv_offsets,
    dedup_exact,
    load_sharded_offsets,
    persist_sharded_offsets,
)
from remote_vector_index_builder_ray.stages.merge import merge_bucket_files
from remote_vector_index_builder_ray.stages.postings import PostingsPartials, add_doc_len
from remote_vector_index_builder_ray.state import fs
from remote_vector_index_builder_ray.state.manifest import Manifest, atomic_write_dir

DOCMETA_COLUMNS = ["docid", "conv_id", "turn_idx", "role", "text", "tool", "ts", "doc_len"]

# Settle fsspec's lazy http import ONCE, single-threaded: Ray's parquet
# datasource probes `fsspec.implementations.http` per construction; with
# aiohttp absent the module half-imports, and under concurrent first-import
# the race surfaces as a plain ImportError that Ray doesn't catch. A sentinel
# module makes the probe cheap and thread-safe (isinstance() is simply False).
try:
    import fsspec.implementations.http  # noqa: F401
except ImportError:
    import sys as _sys
    import types as _types

    _stub = _types.ModuleType("fsspec.implementations.http")

    class _NoHTTPFileSystem:  # never instantiated: aiohttp is not installed
        pass

    _stub.HTTPFileSystem = _NoHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _stub

import threading as _threading

_READ_LOCK = _threading.Lock()  # datasource construction is cheap; serialize it


def _partition_files(paths: list[str], num_partitions: int | None) -> list[list[str]]:
    paths = sorted(paths)
    if num_partitions is None:
        # size-based partitioning (the analog of the reference's
        # calculate_memory_requirements admission sizing, app/utils/memory.py:14-59):
        # ~2 GB of input per checkpoint partition
        from remote_vector_index_builder_ray.functions.metrics import estimate_partitions

        num_partitions = estimate_partitions(paths)
    num_partitions = max(1, min(num_partitions, len(paths)))
    return [list(chunk) for chunk in np.array_split(np.array(paths, dtype=object), num_partitions)]


def run_merge(
    seg_roots: list[str],
    postings_dir: str,
    termstats_dir: str,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    byte_budget: int,
    tombstones=None,
    positions_dir: str | None = None,
    stats_payload: dict | None = None,
) -> dict:
    """The merge exchange as a standalone phase: read every bucket's partial
    files under ``seg_roots`` (hive-partitioned by phase A — the map-side
    shuffle), merge each bucket in one vectorized Ray task, and atomically
    replace ``postings_dir`` / ``termstats_dir``. Shared by the base build
    (one seg root) and generation compaction (base + all generations' roots,
    ``pipelines/incremental.compact_index``). Returns metrics + the
    ``postings_files`` manifest entries."""
    bucket_files: dict[int, list[str]] = {}
    for root in seg_roots:
        for rel in fs.listdir(root, recursive=True):
            if not rel.endswith(".parquet"):
                continue
            parts = rel.split("/")
            bdir = next((p for p in parts if p.startswith("bucket=")), None)
            if bdir is None:
                continue
            bkt = int(bdir.split("=", 1)[1])
            bucket_files.setdefault(bkt, []).append(fs.join(root, rel))

    # Merge-task CPU cost from bucket size: small buckets (the default
    # sizing) keep lexsort working sets near the LLC and run fine at full
    # core concurrency; oversized buckets (65536-bucket cap reached at
    # extreme inputs) thrash the shared memory subsystem when too many
    # run per node — measured sweet spot ~16 concurrent per 32-CPU node —
    # so declare num_cpus = node_cpus/16 for them.
    cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    node_cpus = max(
        (int(n.get("Resources", {}).get("CPU", 0)) for n in ray.nodes() if n.get("Alive")),
        default=cluster_cpus,
    )
    total_partial_bytes = sum(
        fs.file_size(f) for files in bucket_files.values() for f in files
    )
    per_bucket = total_partial_bytes / max(1, len(bucket_files))
    merge_cpus = 1 if per_bucket <= (64 << 20) else max(1, int(node_cpus) // 16)
    merge_task = ray.remote(num_cpus=merge_cpus)(merge_bucket_files)
    tmp_post, tmp_ts = postings_dir + ".tmp", termstats_dir + ".tmp"
    for d in (tmp_post, tmp_ts):
        fs.rm_tree(d)
        fs.makedirs(d)
    # broadcast the tombstone set ONCE (ray.put + auto-deref in each task),
    # not a copy shipped inside every task's arguments
    tomb_ref = None
    if tombstones is not None and len(tombstones):
        tomb_ref = ray.put(np.asarray(tombstones, dtype=np.int64))
    futures = [
        merge_task.remote(
            files, avgdl, k1, b, block_size, bkt,
            fs.join(tmp_post, f"bucket-{bkt:05d}.parquet"),
            fs.join(tmp_ts, f"bucket-{bkt:05d}.parquet"),
            byte_budget=byte_budget,
            tombstones=tomb_ref,
        )
        for bkt, files in sorted(bucket_files.items())
    ]
    pos_futures = []
    if positions_dir is not None:
        from remote_vector_index_builder_ray.stages.merge import merge_positions_bucket

        tmp_posn = positions_dir + ".tmp"
        fs.rm_tree(tmp_posn)
        fs.makedirs(tmp_posn)
        pos_task = ray.remote(num_cpus=merge_cpus)(merge_positions_bucket)
        pos_futures = [
            pos_task.remote(
                files, bkt, fs.join(tmp_posn, f"bucket-{bkt:05d}.parquet"),
                byte_budget=byte_budget, tombstones=tomb_ref,
            )
            for bkt, files in sorted(bucket_files.items())
        ]
    results = ray.get(futures)
    if stats_payload is not None:
        # commit record: the new stats land in the SAME rename as the new
        # postings (state.manifest.load_base_stats explains why)
        fs.write_json_atomic(fs.join(tmp_post, "stats.json"), stats_payload)

    def _swap(tmp: str, final: str) -> None:
        # move the live dir ASIDE first (one rename), not rm_tree-then-move:
        # rm_tree leaves a no-postings window proportional to the file count
        old = final + ".old"
        fs.rm_tree(old)
        if fs.exists(final):
            fs.move_dir(final, old)
        fs.move_dir(tmp, final)
        fs.rm_tree(old)

    if pos_futures:
        ray.get(pos_futures)
        _swap(tmp_posn, positions_dir)
    _swap(tmp_ts, termstats_dir)
    # postings last: they carry the commit record, so a reader never sees the
    # new stats without the postings they describe
    _swap(tmp_post, postings_dir)
    return {
        "term_shards": int(sum(r[0] for r in results)),
        "terms": int(sum(r[1] for r in results)),
        "postings_files": [
            {"path": fs.join(postings_dir, f"bucket-{bkt:05d}.parquet"), "bucket": bkt}
            for bkt, _ in sorted(bucket_files.items())
        ],
    }


def build_index(cfg: BuildConfig, resume: bool = True) -> dict:
    """Build (or resume) the index; returns the manifest dict.

    ``cfg.index_dir`` and ``cfg.input_paths`` are URIs resolved through the
    ``state.fs`` object-store layer (plain path = local fs; ``s3://`` etc. via
    pyarrow.fs; ``mock://`` = the conformance stand-in store) — every byte of
    index state moves through that layer, so build/merge/search tasks on any
    node of a multi-node cluster address the same store. Analog of the
    reference's ObjectStore factory + S3 multipart read/write
    (``core/object_store/object_store_factory.py:27-56``,
    ``core/object_store/s3/s3_object_store.py:216-359``).
    """
    fs.makedirs(cfg.index_dir)
    job_id = cfg.job_id()
    man = Manifest.load(cfg.index_dir) if resume else None
    if man is not None and man.data.get("job_id") not in (None, job_id):
        raise HashCollisionError(
            f"index dir {cfg.index_dir} was built with different parameters "
            f"(job {man.data.get('job_id')[:12]} != {job_id[:12]})"
        )
    if man is not None and man.data.get("status") == "COMPLETED":
        # same job id + COMPLETED -> reuse, byte-untouched (the reference's
        # job idempotency, ``app/services/job_service.py:60-83``). Critically
        # this must NOT fall through to the phase runner: phase B would
        # recompute stats.json from the partition lineage (the FULL corpus)
        # and clobber the live-corpus stats a later compact_index wrote —
        # re-running build_index on a compacted index silently un-shrunk its
        # stats (caught by the driver's bm25_compacted entry going stale).
        return man.data
    if man is None:
        man = Manifest(cfg.index_dir)
        man.data["job_id"] = job_id
        # bucket count fixed at job start (resume must reuse it — partials
        # are physically partitioned by it): ~64 MB of input per merge bucket
        if cfg.num_buckets is not None:
            man.data["num_buckets"] = int(cfg.num_buckets)
        else:
            # ~8 MB of input per merge bucket: a bucket's decoded working set
            # is ~10-20x its parquet bytes, and lexsort working sets that
            # overflow the shared LLC make concurrent merges serialize on the
            # memory subsystem (measured on 12M turns / 32 CPUs: 56 x 32 MB
            # buckets -> merge wall 121 s at 16 concurrent; 224 x 8 MB ->
            # 61 s at 32 concurrent). Beyond the 65536-file cap the per-bucket
            # skew guard (merge_byte_budget sub-splits) bounds memory instead.
            total_bytes = sum(fs.file_size(p) for p in cfg.input_paths)
            man.data["num_buckets"] = int(np.clip(total_bytes // (8 << 20), 32, 65536))
        man.data["config"] = {
            "input_paths": cfg.input_paths,
            "bm25": cfg.bm25.__dict__,
            "dedup": cfg.dedup,
            "docid_mode": cfg.docid_mode,
            "positions": bool(cfg.positions),
        }
        if not cfg.analyzer.is_default():
            man.data["config"]["analyzer"] = {
                "stopwords": list(cfg.analyzer.stopwords),
                "min_token_len": cfg.analyzer.min_token_len,
                "max_token_len": cfg.analyzer.max_token_len,
                "stemmer": cfg.analyzer.stemmer,
            }
        man.save()
    num_buckets = int(man.data["num_buckets"])
    analyzer = None if cfg.analyzer.is_default() else cfg.analyzer

    # schema check once against declared transcript schema (typed error)
    read_transcripts(cfg.input_paths[:1])

    # ---- phase 0: conv offsets / docid basis --------------------------------
    offsets_path = fs.join(cfg.index_dir, "conv_offsets.parquet")
    offsets_dir = fs.join(cfg.index_dir, "conv_offsets")  # sharded checkpoint
    if cfg.docid_mode == "dense":
        if not (man.stage_done("conv_offsets")
                and (fs.exists(offsets_path) or fs.exists(offsets_dir))):
            t0 = time.time()
            two = read_transcripts(cfg.input_paths, columns=["conv_id", "turn_idx"])
            if cfg.dedup:
                # count DISTINCT (conv_id, turn_idx): dedup pairs first
                two = two.groupby(["conv_id", "turn_idx"]).count()
            conv_ids, offsets, n_docs, _ = compute_conv_offsets(two, validate_dense=True)
            if isinstance(conv_ids, ShardedOffsets):
                # beyond _CONV_DRIVER_MAX: worker tasks write one file per
                # block (base applied in-task); the driver commits only the
                # tiny range index
                n_convs = persist_sharded_offsets(
                    conv_ids, int(cfg.docid_base), offsets_dir
                )
            else:
                offsets = offsets + int(cfg.docid_base)  # generation base (0 for a base index)
                tbl = pa.table({"conv_id": pa.array(conv_ids), "offset": pa.array(offsets, type=pa.int64())})
                # safe without a temp file: the stage commit (below) happens only
                # after the write completes, and resume re-writes on a dirty file
                fs.write_table(tbl, offsets_path)
                n_convs = len(conv_ids)
            man.commit_stage("conv_offsets", {"n_convs": n_convs, "n_docs": n_docs, "sec": time.time() - t0})
        if fs.exists(offsets_path):
            tbl = fs.read_table(offsets_path)
            conv_ids = tbl["conv_id"].to_numpy(zero_copy_only=False)
            offsets = tbl["offset"].to_numpy(zero_copy_only=False)
        else:
            conv_ids, offsets = load_sharded_offsets(offsets_dir), None

    # ---- phase dedup (optional, global) -------------------------------------
    # Duplicates of (conv_id, turn_idx) can span input files, so dedup is a
    # global keyed shuffle staged BEFORE partitioning (its own checkpoint);
    # phase A then consumes the deduped staging files.
    input_paths = cfg.input_paths
    if cfg.dedup:
        dedup_dir = fs.join(cfg.index_dir, "deduped")
        if not man.stage_done("dedup"):
            t0 = time.time()
            # intentionally UNPRUNED read: the staged output replaces
            # input_paths for phase A, and docmeta persists every input
            # column (DOCMETA_COLUMNS includes tool/ts) — dropping a column
            # here would drop it from the index. dedup_exact only KEYS on
            # (conv_id, turn_idx); the other columns ride through the
            # shuffle untouched, which is the cost of a self-rewriting
            # stage, not a pruning miss.
            ds = ray.data.read_parquet(**fs.for_ray_paths(cfg.input_paths))
            atomic_write_dir(lambda d: dedup_exact(ds).write_parquet(**fs.for_ray(d)), dedup_dir)
            man.commit_stage("dedup", {"sec": time.time() - t0})
        input_paths = [
            fs.join(dedup_dir, f) for f in fs.listdir(dedup_dir) if f.endswith(".parquet")
        ]

    # ---- phase A: per-partition docmeta + posting partials ------------------
    # Partitions are independent sub-pipelines -> run them CONCURRENTLY on the
    # shared Ray cluster (driver-side thread pool, the analog of the
    # reference's WorkflowExecutor ThreadPoolExecutor,
    # ``app/executors/workflow_executor.py:53-71``). Each remains its own
    # atomic checkpoint; the manifest write is lock-guarded.
    import threading
    from concurrent.futures import ThreadPoolExecutor

    man_lock = threading.Lock()
    read_lock = _READ_LOCK

    def _build_partition(pid: int, files: list[str]) -> None:
        key = f"part-{pid:05d}"
        if man.partition_committed(key):
            return
        t0 = time.time()
        with read_lock:
            ds = ray.data.read_parquet(**fs.for_ray_paths(files))
        if cfg.docid_mode == "dense":
            ds = assign_docids_dense(ds, conv_ids, offsets)
        else:
            ds = assign_docids_sort(ds, base=int(cfg.docid_base))
        dm = ds.map_batches(add_doc_len, fn_kwargs={"analyzer": analyzer},
                            batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=cfg.batch_size).select_columns(DOCMETA_COLUMNS)
        dm_dir = fs.join(cfg.index_dir, "docmeta", key)
        atomic_write_dir(lambda d: dm.write_parquet(**fs.for_ray(d)), dm_dir)
        t_meta = time.time()

        # partials read back from the committed docmeta (pruned to 2 columns) —
        # consistent by construction and avoids re-running docid assignment.
        # Block count is fixed AT THE READ so the hive-partitioned write fans
        # out over exactly n_write tasks with no repartition barrier: a global
        # repartition() moves every partial through the object store twice and
        # measured 2.4x slower than sizing the read (52 s vs 21 s at sfscale/
        # 32 CPUs). Files per bucket == n_write either way.
        n_write = max(4, min(cluster_cpus // workers, 32))
        with read_lock:
            src = ray.data.read_parquet(
                **fs.for_ray_paths([dm_dir]), columns=["docid", "text", "doc_len"],
                override_num_blocks=n_write,
            )
        # stateless task closure (the "state" is two ints) — avoids spinning
        # up an actor pool per concurrent partition pipeline
        partials = src.map_batches(
            PostingsPartials(cfg.bm25.shard_range, num_buckets,
                             positions=cfg.positions, analyzer=analyzer),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
        )
        seg_dir = fs.join(cfg.index_dir, "segments", key)
        # hive-partitioned by bucket: this write IS the merge shuffle (map-side
        # via the filesystem; no all-to-all exchange operator)
        atomic_write_dir(
            lambda d: partials.write_parquet(**fs.for_ray(d), partition_cols=["bucket"]),
            seg_dir,
        )

        # lineage from the written docmeta (one pruned column read)
        n_docs = 0
        total_len = 0
        for fn in fs.listdir(dm_dir):
            if fn.endswith(".parquet"):
                t = fs.read_table(fs.join(dm_dir, fn), columns=["doc_len"])
                n_docs += t.num_rows
                total_len += int(pa.compute.sum(t["doc_len"]).as_py() or 0)
        with man_lock:
            man.commit_partition(
                key,
                {
                    "input_files": files,
                    "n_docs": n_docs,
                    "total_len": total_len,
                    "docmeta": dm_dir,
                    "segments": seg_dir,
                    "sec_docmeta": t_meta - t0,
                    "sec_partials": time.time() - t_meta,
                    "turns_per_sec": n_docs / max(time.time() - t0, 1e-9),
                },
            )

    partitions = _partition_files(input_paths, 1 if cfg.docid_mode == "sort" else cfg.num_partitions)
    # concurrent sub-pipelines only pay off when each can get ~8 CPUs; on a
    # small cluster they starve each other (each needs read tasks + an actor)
    cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    workers = int(os.environ.get("GRAFT_PHASEA_WORKERS", max(1, min(4, len(partitions), cluster_cpus // 8))))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(_build_partition, pid, files) for pid, files in enumerate(partitions)]
        for f in futures:
            f.result()

    # ---- phase B: corpus stats from lineage ---------------------------------
    N = sum(p["n_docs"] for p in man.data["partitions"].values())
    total_len = sum(p["total_len"] for p in man.data["partitions"].values())
    avgdl = total_len / N if N else 0.0
    stats = {
        "N": N,
        "total_len": total_len,
        "avgdl": avgdl,
        "k1": cfg.bm25.k1,
        "b": cfg.bm25.b,
        "block_size": cfg.bm25.block_size,
        "shard_range": cfg.bm25.shard_range,
    }
    if analyzer is not None:
        # searcher actors + query-side features analyze with the INDEX's
        # analyzer (functions.tokenizer.load_analyzer reads this back)
        stats["analyzer"] = {
            "stopwords": list(analyzer.stopwords),
            "min_token_len": analyzer.min_token_len,
            "max_token_len": analyzer.max_token_len,
            "stemmer": analyzer.stemmer,
        }
    fs.write_json_atomic(fs.join(cfg.index_dir, "stats.json"), stats)
    man.data["stats"] = stats
    man.save()

    # ---- phase C: merge — num_buckets independent Ray tasks -----------------
    # Phase A already hive-partitioned the partials by bucket (the map-side
    # shuffle); each task reads exactly its bucket's files from every
    # partition, merges all (term, shard) groups vectorized, and writes the
    # deterministic bucket-NNNNN postings + termstats files. No sort, no
    # groupby machinery — the one wide exchange of the build is plain
    # partitioned-file I/O, which is how it must work at 10^12-turn scale.
    seg_root = fs.join(cfg.index_dir, "segments")
    postings_dir = fs.join(cfg.index_dir, "postings")
    termstats_dir = fs.join(cfg.index_dir, "termstats")
    if not man.stage_done("merge"):
        t0 = time.time()
        m = run_merge(
            [seg_root], postings_dir, termstats_dir,
            avgdl, cfg.bm25.k1, cfg.bm25.b, cfg.bm25.block_size,
            cfg.merge_byte_budget,
            positions_dir=(fs.join(cfg.index_dir, "positions") if cfg.positions else None),
        )
        man.data["postings_files"] = m["postings_files"]
        man.commit_stage(
            "merge",
            {
                "sec": time.time() - t0,
                "term_shards": m["term_shards"],
                "terms": m["terms"],
                "num_buckets": num_buckets,
            },
        )

    man.finalize("COMPLETED")
    return man.data
