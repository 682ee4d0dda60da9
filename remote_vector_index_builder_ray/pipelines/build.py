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
  C. merge: ``groupby(term, shard).map_groups(MergeCompress)`` -> term-sorted
     compressed postings + per-file term ranges in the manifest
  D. term stats: partial df/cf per batch -> small ``groupby(term)`` sum

All heavy flows stream block-by-block with backpressure; nothing materializes
the full corpus. Writes are atomic (temp dir + rename) so Ray task retries and
job re-runs are idempotent.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from remote_vector_index_builder_ray.config import BuildConfig, HashCollisionError
from remote_vector_index_builder_ray.sources.transcripts import read_transcripts
from remote_vector_index_builder_ray.stages.docids import (
    assign_docids_dense,
    assign_docids_sort,
    compute_conv_offsets,
    dedup_exact,
)
from remote_vector_index_builder_ray.stages.merge import (
    make_bucket_merge_fn,
    term_bucket_fn,
)
from remote_vector_index_builder_ray.stages.postings import PostingsPartials, add_doc_len
from remote_vector_index_builder_ray.state.manifest import (
    Manifest,
    atomic_write_dir,
    write_parquet_rowgrouped,
)

DOCMETA_COLUMNS = ["docid", "conv_id", "turn_idx", "role", "text", "tool", "ts", "doc_len"]


def _partition_files(paths: list[str], num_partitions: int | None) -> list[list[str]]:
    paths = sorted(paths)
    if num_partitions is None:
        num_partitions = min(len(paths), 16)
    num_partitions = max(1, min(num_partitions, len(paths)))
    return [list(chunk) for chunk in np.array_split(np.array(paths, dtype=object), num_partitions)]


def _column_min_max(path: str, md, column: str):
    arrow_schema = md.schema.to_arrow_schema()
    ci = arrow_schema.get_field_index(column)
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is not None and st.has_min_max:
            mins.append(st.min)
            maxs.append(st.max)
    if not mins:  # fallback: read just that column
        t = pq.read_table(path, columns=[column])[column]
        mins, maxs = [pa.compute.min(t).as_py()], [pa.compute.max(t).as_py()]
    dec = lambda v: v.decode() if isinstance(v, bytes) else v
    return min(dec(m) for m in mins), max(dec(m) for m in maxs)


def _file_term_ranges(dirpath: str) -> list[dict]:
    """Per-file (term_min/max, bucket_min/max) for query-time file pruning."""
    out = []
    for fn in sorted(os.listdir(dirpath)):
        if not fn.endswith(".parquet"):
            continue
        path = os.path.join(dirpath, fn)
        md = pq.read_metadata(path)
        tmin, tmax = _column_min_max(path, md, "term")
        bmin, bmax = _column_min_max(path, md, "bucket")
        out.append(
            {"path": path, "term_min": tmin, "term_max": tmax,
             "bucket_min": int(bmin), "bucket_max": int(bmax)}
        )
    return out


def build_index(cfg: BuildConfig, resume: bool = True) -> dict:
    """Build (or resume) the index; returns the manifest dict."""
    os.makedirs(cfg.index_dir, exist_ok=True)
    job_id = cfg.job_id()
    man = Manifest.load(cfg.index_dir) if resume else None
    if man is not None and man.data.get("job_id") not in (None, job_id):
        raise HashCollisionError(
            f"index dir {cfg.index_dir} was built with different parameters "
            f"(job {man.data.get('job_id')[:12]} != {job_id[:12]})"
        )
    if man is None:
        man = Manifest(cfg.index_dir)
        man.data["job_id"] = job_id
        man.data["config"] = {
            "input_paths": cfg.input_paths,
            "bm25": cfg.bm25.__dict__,
            "dedup": cfg.dedup,
            "docid_mode": cfg.docid_mode,
        }
        man.save()

    # schema check once against declared transcript schema (typed error)
    read_transcripts(cfg.input_paths[:1])

    # ---- phase 0: conv offsets / docid basis --------------------------------
    offsets_path = os.path.join(cfg.index_dir, "conv_offsets.parquet")
    if cfg.docid_mode == "dense":
        if not (man.stage_done("conv_offsets") and os.path.exists(offsets_path)):
            t0 = time.time()
            two = read_transcripts(cfg.input_paths, columns=["conv_id", "turn_idx"])
            if cfg.dedup:
                # count DISTINCT (conv_id, turn_idx): dedup pairs first
                two = two.groupby(["conv_id", "turn_idx"]).count()
            conv_ids, offsets, n_docs, _ = compute_conv_offsets(two, validate_dense=True)
            tbl = pa.table({"conv_id": pa.array(conv_ids), "offset": pa.array(offsets, type=pa.int64())})
            pq.write_table(tbl, offsets_path + ".tmp")
            os.replace(offsets_path + ".tmp", offsets_path)
            man.commit_stage("conv_offsets", {"n_convs": len(conv_ids), "n_docs": n_docs, "sec": time.time() - t0})
        tbl = pq.read_table(offsets_path)
        conv_ids = tbl["conv_id"].to_numpy(zero_copy_only=False)
        offsets = tbl["offset"].to_numpy(zero_copy_only=False)

    # ---- phase dedup (optional, global) -------------------------------------
    # Duplicates of (conv_id, turn_idx) can span input files, so dedup is a
    # global keyed shuffle staged BEFORE partitioning (its own checkpoint);
    # phase A then consumes the deduped staging files.
    input_paths = cfg.input_paths
    if cfg.dedup:
        dedup_dir = os.path.join(cfg.index_dir, "deduped")
        if not man.stage_done("dedup"):
            t0 = time.time()
            ds = ray.data.read_parquet(cfg.input_paths)
            atomic_write_dir(lambda d: dedup_exact(ds).write_parquet(d), dedup_dir)
            man.commit_stage("dedup", {"sec": time.time() - t0})
        input_paths = [
            os.path.join(dedup_dir, f) for f in sorted(os.listdir(dedup_dir)) if f.endswith(".parquet")
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
    # read_parquet's datasource constructor does lazy fsspec imports that are
    # not thread-safe on first import (raises ImportError mid-race); it's
    # cheap, so serialize just the construction
    read_lock = threading.Lock()

    def _build_partition(pid: int, files: list[str]) -> None:
        key = f"part-{pid:05d}"
        if man.partition_committed(key):
            return
        t0 = time.time()
        with read_lock:
            ds = ray.data.read_parquet(files)
        if cfg.docid_mode == "dense":
            ds = assign_docids_dense(ds, conv_ids, offsets)
        else:
            ds = assign_docids_sort(ds)
        dm = ds.map_batches(add_doc_len, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=cfg.batch_size).select_columns(DOCMETA_COLUMNS)
        dm_dir = os.path.join(cfg.index_dir, "docmeta", key)
        atomic_write_dir(lambda d: dm.write_parquet(d), dm_dir)
        t_meta = time.time()

        # partials read back from the committed docmeta (pruned to 2 columns) —
        # consistent by construction and avoids re-running docid assignment
        with read_lock:
            src = ray.data.read_parquet(dm_dir, columns=["docid", "text", "doc_len"])
        partials = src.map_batches(
            PostingsPartials,
            fn_constructor_args=(cfg.bm25.shard_range,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
            concurrency=(1, 8),
        )
        seg_dir = os.path.join(cfg.index_dir, "segments", key)
        atomic_write_dir(lambda d: partials.write_parquet(d), seg_dir)

        # lineage from the written docmeta footers (no extra data pass)
        n_docs = 0
        total_len = 0
        for fn in os.listdir(dm_dir):
            if fn.endswith(".parquet"):
                p = os.path.join(dm_dir, fn)
                n_docs += pq.read_metadata(p).num_rows
                total_len += int(pa.compute.sum(pq.read_table(p, columns=["doc_len"])["doc_len"]).as_py() or 0)
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
    workers = max(1, min(4, len(partitions), cluster_cpus // 8))
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
    with open(os.path.join(cfg.index_dir, "stats.json"), "w") as f:
        json.dump(stats, f)
    man.data["stats"] = stats
    man.save()

    seg_root = os.path.join(cfg.index_dir, "segments")
    # read_parquet takes a single dir or a list of FILES — expand explicitly
    seg_files = [
        os.path.join(seg_root, d, f)
        for d in sorted(os.listdir(seg_root))
        for f in sorted(os.listdir(os.path.join(seg_root, d)))
        if f.endswith(".parquet")
    ]

    # ---- phase C: the wide shuffle — merge partials by (term, shard) --------
    postings_dir = os.path.join(cfg.index_dir, "postings")
    if not man.stage_done("merge"):
        t0 = time.time()
        # bucket count: ~4M postings per merge group keeps each vectorized
        # merge task small; grows with the corpus (total_len bounds postings)
        num_buckets = int(np.clip(total_len // 4_000_000, 32, 65536))
        parts = ray.data.read_parquet(seg_files)
        merged = (
            parts.map_batches(
                term_bucket_fn(num_buckets), batch_format="pyarrow", zero_copy_batch=True
            )
            # coalesce the many small partial blocks before the shuffle: the
            # sort's map x reduce fan-out is (blocks x partitions) objects, so
            # tiny blocks drown the merge in scheduling overhead
            .repartition(num_buckets)
            .groupby("bucket")
            .map_groups(
                make_bucket_merge_fn(avgdl, cfg.bm25.k1, cfg.bm25.b, cfg.bm25.block_size),
                batch_format="pyarrow",
            )
        )
        # small row groups (sorted by term within bucket) => query-time
        # row-group pruning: a term lookup reads ~one row group, not a file
        atomic_write_dir(
            lambda d: write_parquet_rowgrouped(merged, d, row_group_size=256),
            postings_dir,
        )
        files_meta = _file_term_ranges(postings_dir)
        man.data["postings_files"] = files_meta
        man.data["num_buckets"] = num_buckets
        n_rows = sum(pq.read_metadata(f["path"]).num_rows for f in files_meta)
        man.commit_stage(
            "merge", {"sec": time.time() - t0, "term_shards": n_rows, "num_buckets": num_buckets}
        )

    # ---- phase D: global term stats (df/cf across shards) -------------------
    termstats_dir = os.path.join(cfg.index_dir, "termstats")
    if not man.stage_done("termstats"):
        t0 = time.time()
        from ray.data.aggregate import Sum

        # df/cf were already reduced per (term, shard) by the merge — summing
        # those tiny columns is far cheaper than re-flattening the partials
        ts = (
            ray.data.read_parquet(postings_dir, columns=["term", "df_shard", "cf_shard"])
            .groupby("term")
            .aggregate(Sum("df_shard", alias_name="df"), Sum("cf_shard", alias_name="cf"))
            .sort("term")
        )
        atomic_write_dir(lambda d: ts.write_parquet(d), termstats_dir)
        man.commit_stage("termstats", {"sec": time.time() - t0})

    man.finalize("COMPLETED")
    return man.data
