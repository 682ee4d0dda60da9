"""Search aggregations: bucket counts over ALL matching docs (the OpenSearch
aggregations analog — `terms` and `date_histogram` aggs run on the full match
set of a query, not its top-k page).

Reference analog: the reference exposes only search hits
(``benchmarking/search/search_indices.py:23-40``); OpenSearch itself computes
aggs per shard and reduces — this engine does the same with Ray Data:

1. The match set per query (OR over query terms; tombstones and ``where``
   filters respected) is produced by the constant-score scorer — docids only,
   no scoring work.
2. The match sets — the SMALL side (a query's matches, not the corpus) — are
   ``ray.put`` once and every probe actor fetches the same object-store copy.
3. The docmeta table — the BIG side — streams through ``map_batches`` exactly
   once, each batch probed per query with a sorted-array membership test and
   pre-aggregated (combiner) into tiny per-batch partial counts.
4. The partials (queries x buckets rows) reduce driver-side.

Scale note (100 TB): this is the broadcast-semi-join pattern, made
range-local — each query's sorted match set is SHARDED by docid range
(``_MATCH_SHARD_STRIDE`` docids per shard, one ``ray.put`` per shard) and a
probe task fetches only the shards overlapping its batch's docid range. The
docmeta files are docid-ordered, so a task touches O(its slice) of the match
set rather than Σ|matches| — a stopword matching half the corpus costs each
probe task only its own range's members. The tiny shard directory
({shard_id: ObjectRef}) is the only thing every actor holds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# docids per match-set shard: one shard's members for one query are at most
# STRIDE * 8 bytes; with dense docids a 4M stride bounds a worst-case
# (match-everything) query at 32 MB per shard per query
_MATCH_SHARD_STRIDE = 1 << 22


def _match_sets(index_dir: str, queries, where=None) -> dict[int, np.ndarray]:
    """All matching docids per query (sorted int64), via the constant-score
    scorer at k=INT32_MAX — docid streams only, no tf/score work."""
    from remote_vector_index_builder_ray.pipelines.query import search

    q = queries.copy() if isinstance(queries, pd.DataFrame) else pd.read_parquet(queries)
    q["k"] = np.int32(2**31 - 1)
    res = search(index_dir, q, mode="constant", where=where).to_pandas()
    return {
        int(qid): np.sort(g["docid"].to_numpy(np.int64))
        for qid, g in res.groupby("query_id")
    }


def _shard_match_sets(matches: dict[int, np.ndarray], stride: int | None = None):
    """Split each query's sorted match array into docid-range shards and
    ``ray.put`` each shard's {qid: sub-array} dict separately. Returns
    (shard_refs, qids): a small {shard_id: ObjectRef} directory plus the
    full query-id list (a query with zero matches still needs empty
    output semantics)."""
    if stride is None:
        stride = _MATCH_SHARD_STRIDE  # resolved at call time (testable)
    shards: dict[int, dict[int, np.ndarray]] = {}
    for qid, arr in matches.items():
        if len(arr) == 0:
            continue
        sid = arr // stride
        bounds = np.flatnonzero(sid[1:] != sid[:-1]) + 1
        starts = np.concatenate([[0], bounds])
        for chunk, s0 in zip(np.split(arr, bounds), sid[starts]):
            shards.setdefault(int(s0), {})[qid] = chunk
    return {sid: ray.put(d) for sid, d in shards.items()}, sorted(matches)


class _ShardedMatches:
    """Actor-side view over the sharded match sets: fetches (and caches) only
    the shards overlapping the docids a batch actually contains."""

    def __init__(self, shard_refs: dict, stride: int):
        self._refs = shard_refs
        self._stride = stride
        self._cache: dict[int, dict[int, np.ndarray]] = {}

    def for_batch(self, ids: np.ndarray) -> dict[int, np.ndarray]:
        """{qid: sorted docids} restricted to the batch's docid-range shards,
        concatenated in ascending-shard order (still sorted per query)."""
        if len(ids) == 0:
            return {}
        lo = int(ids.min()) // self._stride
        hi = int(ids.max()) // self._stride
        parts: dict[int, list[np.ndarray]] = {}
        for sid in range(lo, hi + 1):
            ref = self._refs.get(sid)
            if ref is None:
                continue
            d = self._cache.get(sid)
            if d is None:
                d = ray.get(ref)
                self._cache[sid] = d
            for qid, arr in d.items():
                parts.setdefault(qid, []).append(arr)
        return {
            qid: (ps[0] if len(ps) == 1 else np.concatenate(ps))
            for qid, ps in parts.items()
        }


class _ProbeAgg:
    """Per-batch combiner: probe each query's sorted match set against the
    batch's docids, pre-aggregate (bucket key -> count, metric sum) so only
    queries x buckets rows leave the task."""

    def __init__(self, shard_refs, stride, field: str, interval: str | None,
                 metric_field: str | None, ranges=None):
        self.matches = _ShardedMatches(shard_refs, stride)
        self.field = field
        self.interval = interval
        self.metric_field = metric_field
        self.ranges = ranges

    @staticmethod
    def _range_key(lo, hi) -> str:
        # OpenSearch range-agg bucket key: "lo-hi" with * for an open end
        return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        from remote_vector_index_builder_ray.stages.merge import isin_sorted

        ids = batch["docid"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = batch[self.field].combine_chunks().to_numpy(zero_copy_only=False)
        if self.interval == "day":
            keys = keys.astype("datetime64[D]").astype("datetime64[us]")
        elif self.interval is not None:
            raise ValueError(f"unsupported interval {self.interval!r}")
        if self.ranges is not None:
            # numeric range buckets, [lo, hi) per OpenSearch range agg;
            # values outside every range get a sentinel dropped below
            vals = keys.astype(np.float64)
            labels = np.full(len(vals), "", dtype=object)
            for lo, hi in self.ranges:
                m = np.ones(len(vals), dtype=bool)
                if lo is not None:
                    m &= vals >= lo
                if hi is not None:
                    m &= vals < hi
                labels[m] = self._range_key(lo, hi)
            keys = labels
        metric = (
            batch[self.metric_field].combine_chunks()
            .to_numpy(zero_copy_only=False).astype(np.int64)
            if self.metric_field
            else None
        )
        qids, out_keys, ns, sums = [], [], [], []
        for qid, arr in self.matches.for_batch(ids).items():
            mask = isin_sorted(ids, arr)
            if not mask.any():
                continue
            kk = keys[mask]
            mm = metric[mask] if metric is not None else None
            if self.ranges is not None:
                keep = kk != ""  # outside every range bucket
                kk = kk[keep]
                mm = mm[keep] if mm is not None else None
                if len(kk) == 0:
                    continue
            df = pd.DataFrame({"key": kk})
            if mm is not None:
                df["m"] = mm
                g = df.groupby("key", sort=False).agg(n=("m", "size"), s=("m", "sum"))
            else:
                g = df.groupby("key", sort=False).agg(n=("key", "size"))
                g["s"] = 0
            qids.extend([qid] * len(g))
            out_keys.extend(g.index.tolist())
            ns.extend(g["n"].tolist())
            sums.extend(g["s"].tolist())
        key_type = pa.timestamp("us") if self.interval else pa.string()
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "key": pa.array(out_keys, type=key_type),
                "n": pa.array(ns, type=pa.int64()),
                "s": pa.array(sums, type=pa.int64()),
            }
        )


def _run_agg(
    index_dir: str,
    queries,
    field: str,
    interval: str | None,
    metric_field: str | None,
    where,
    ranges=None,
) -> pd.DataFrame:
    from remote_vector_index_builder_ray.pipelines.incremental import docmeta_dirs
    from remote_vector_index_builder_ray.state import fs

    shard_refs, _ = _shard_match_sets(_match_sets(index_dir, queries, where=where))
    meta_files = [
        fs.join(d, rel)
        for d in docmeta_dirs(index_dir)
        for rel in fs.listdir(d, recursive=True)
        if rel.endswith(".parquet")
    ]
    cols = ["docid", field] + ([metric_field] if metric_field else [])
    partials = (
        ray.data.read_parquet(**fs.for_ray_paths(meta_files), columns=cols)
        .map_batches(
            _ProbeAgg,
            fn_constructor_args=(shard_refs, _MATCH_SHARD_STRIDE, field,
                                 interval, metric_field, ranges),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
        .to_pandas()  # queries x buckets x read-tasks rows: driver-small
    )
    if partials.empty:
        out = pd.DataFrame({"query_id": pd.Series(dtype=np.int64),
                            "key": pd.Series(dtype=object),
                            "n_docs": pd.Series(dtype=np.int64)})
        if metric_field:
            out[f"avg_{metric_field}"] = pd.Series(dtype=np.float64)
        return out
    g = (
        partials.groupby(["query_id", "key"], sort=True)
        .agg(n_docs=("n", "sum"), s=("s", "sum"))
        .reset_index()
    )
    if metric_field:
        # integer sum, one float64 division: bit-reproducible by SQL; round
        # half-UP explicitly (numpy .round is half-even, DuckDB half-away —
        # floor(x*1e6+0.5)/1e6 agrees on both engines)
        avg = g["s"].astype(np.float64) / g["n_docs"]
        g[f"avg_{metric_field}"] = np.floor(avg * 1e6 + 0.5) / 1e6
    return g.drop(columns=["s"])


def terms_agg(
    index_dir: str,
    queries,
    field: str = "role",
    metric_field: str | None = None,
    where=None,
) -> pd.DataFrame:
    """OpenSearch `terms` aggregation over each query's full match set:
    (query_id, key, n_docs[, avg_<metric_field>]) per distinct value of the
    docmeta ``field``, sorted by (query_id, key)."""
    return _run_agg(index_dir, queries, field, None, metric_field, where)


def date_histogram(
    index_dir: str,
    queries,
    field: str = "ts",
    interval: str = "day",
    where=None,
) -> pd.DataFrame:
    """OpenSearch `date_histogram` aggregation (calendar_interval=day) over
    each query's full match set: (query_id, key:timestamp[us] day floor,
    n_docs), sorted by (query_id, key). Empty buckets are omitted
    (min_doc_count=1 semantics)."""
    return _run_agg(index_dir, queries, field, interval, None, where)


def range_agg(
    index_dir: str,
    queries,
    field: str = "doc_len",
    ranges: list[tuple] = ((None, 16), (16, 64), (64, None)),
    metric_field: str | None = None,
    where=None,
) -> pd.DataFrame:
    """OpenSearch `range` aggregation: [lo, hi) numeric buckets over the
    docmeta ``field`` (keys "lo-hi", "*" for an open end; ranges must not
    overlap — unlike OpenSearch, a doc lands in at most one bucket). Empty
    buckets omitted."""
    return _run_agg(
        index_dir, queries, field, None, metric_field, where, ranges=list(ranges)
    )


class _ProbeStats:
    """Per-batch stats partials: (query_id, n, sum, min, max) of a numeric
    docmeta field over the match set — merged associatively driver-side."""

    def __init__(self, shard_refs, stride, field: str):
        self.matches = _ShardedMatches(shard_refs, stride)
        self.field = field

    def __call__(self, batch: pa.Table) -> pa.Table:
        from remote_vector_index_builder_ray.stages.merge import isin_sorted

        ids = batch["docid"].combine_chunks().to_numpy(zero_copy_only=False)
        vals = (
            batch[self.field].combine_chunks()
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        qids, ns, ss, mns, mxs = [], [], [], [], []
        for qid, arr in self.matches.for_batch(ids).items():
            mask = isin_sorted(ids, arr)
            if not mask.any():
                continue
            v = vals[mask]
            qids.append(qid)
            ns.append(len(v))
            ss.append(int(v.sum()))
            mns.append(int(v.min()))
            mxs.append(int(v.max()))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "n": pa.array(ns, type=pa.int64()),
                "s": pa.array(ss, type=pa.int64()),
                "mn": pa.array(mns, type=pa.int64()),
                "mx": pa.array(mxs, type=pa.int64()),
            }
        )


def stats_agg(
    index_dir: str,
    queries,
    field: str = "doc_len",
    where=None,
) -> pd.DataFrame:
    """OpenSearch `stats` aggregation over each query's full match set:
    (query_id, n_docs, sum_<f>, min_<f>, max_<f>, avg_<f>). Integer
    sum/min/max merge associatively; avg is one float64 division rounded
    half-up to 6 decimals (bit-reproducible by SQL)."""
    from remote_vector_index_builder_ray.pipelines.incremental import docmeta_dirs
    from remote_vector_index_builder_ray.state import fs

    shard_refs, _ = _shard_match_sets(_match_sets(index_dir, queries, where=where))
    meta_files = [
        fs.join(d, rel)
        for d in docmeta_dirs(index_dir)
        for rel in fs.listdir(d, recursive=True)
        if rel.endswith(".parquet")
    ]
    partials = (
        ray.data.read_parquet(**fs.for_ray_paths(meta_files), columns=["docid", field])
        .map_batches(
            _ProbeStats,
            fn_constructor_args=(shard_refs, _MATCH_SHARD_STRIDE, field),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
        .to_pandas()
    )
    cols = {
        "query_id": pd.Series(dtype=np.int64),
        "n_docs": pd.Series(dtype=np.int64),
        f"sum_{field}": pd.Series(dtype=np.int64),
        f"min_{field}": pd.Series(dtype=np.int64),
        f"max_{field}": pd.Series(dtype=np.int64),
        f"avg_{field}": pd.Series(dtype=np.float64),
    }
    if partials.empty:
        return pd.DataFrame(cols)
    g = (
        partials.groupby("query_id", sort=True)
        .agg(n_docs=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        .reset_index()
    )
    avg = g["s"].astype(np.float64) / g["n_docs"]
    out = pd.DataFrame(
        {
            "query_id": g["query_id"].astype(np.int64),
            "n_docs": g["n_docs"].astype(np.int64),
            f"sum_{field}": g["s"].astype(np.int64),
            f"min_{field}": g["mn"].astype(np.int64),
            f"max_{field}": g["mx"].astype(np.int64),
            f"avg_{field}": np.floor(avg * 1e6 + 0.5) / 1e6,
        }
    )
    return out
