"""Parent/child join queries over the conversation hierarchy (the OpenSearch
``join`` field's ``has_child`` / ``has_parent`` queries).

The transcript corpus IS a parent/child dataset: a conversation (parent) owns
its turns (children) via ``conv_id``, and docids are dense in (conv_id,
turn_idx) order (stages/docids.py invariant) — so the join never needs a
shuffle:

- ``has_child``: score every turn (the child query), group scores by
  conversation, rank conversations by a ``score_mode`` combination of their
  children's scores (OpenSearch has_child score_mode max/sum/avg/min/none).
  Distribution: the scored match sets shard by docid range off the driver
  (``aggs._sharded_matches(scored=True)``); the docmeta table streams once
  through a per-batch combiner that pre-aggregates per (query, conv) — a
  conversation's turns are docid-contiguous, so per-batch partials stay
  small and at most two batches share one conversation. The (query, conv)
  partial reduce runs driver-side below ``distributed_threshold`` total
  matches and as a Ray Data groupby + per-block top-k combine above it —
  a stopword child query over 100 TB never lands a corpus-sized partial
  list on the driver.

- ``has_parent``: the parent document is the conversation's opening turn
  (turn_idx == 0). Parents are scored by the normal top-k engine under a
  filter-context restriction to turn_idx == 0 (``search(where=...)``:
  corpus stats unchanged — Lucene scores parent docs against the whole
  index, the join field only partitions doc types). Each child of a top-k
  parent inherits the parent's score (OpenSearch has_parent score=true).
  Children hydrate via the broadcast-semi-join pattern: the tiny
  (conv_id -> [(query, score)]) table ships once via ``ray.put`` and the
  docmeta scan probes it per batch — no shuffle.

Reference analog: the reference's workflow has no query engine at all
(``remote_vector_index_builder/app/...`` builds one index per request);
OpenSearch's join field is the parity target here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from remote_vector_index_builder_ray.pipelines.aggs import (
    _MATCH_SHARD_STRIDE,
    _ShardedScored,
    _sharded_matches,
)

_CHILD_COLS = {
    "query_id": np.int64,
    "rank": np.int32,
    "conv_id": object,
    "score": np.float64,
    "n_matching": np.int64,
}


def _round6(a):
    # half-up 6-decimal rounding, bit-agreeing with DuckDB round(x, 6)
    return np.floor(np.asarray(a, dtype=np.float64) * 1e6 + 0.5) / 1e6


class _ProbeChildAgg:
    """Per-batch combiner for has_child: per (query, conv_id) the batch's
    matching-turn count, max / min / sum of 6-rounded child scores. Only
    queries x convs-in-batch rows leave each task."""

    def __init__(self, shard_refs, stride):
        self.matches = _ShardedScored(shard_refs, stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from remote_vector_index_builder_ray.stages.merge import isin_sorted

        ids = batch["docid"].combine_chunks().to_numpy(zero_copy_only=False)
        convs = batch["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        qids, out_convs, ns, smaxs, smins, ssums = [], [], [], [], [], []
        for qid, (arr, sc) in self.matches.for_batch(ids).items():
            mask = isin_sorted(ids, arr)
            if not mask.any():
                continue
            d = ids[mask]
            s = _round6(sc[np.searchsorted(arr, d)])
            cv = convs[mask]
            # convs are docid-contiguous: groupby on the sorted key is a
            # run-length pass, not a hash build
            codes, uniq = pd.factorize(cv, sort=False)
            n = np.bincount(codes)
            smax = np.full(len(uniq), -np.inf)
            np.maximum.at(smax, codes, s)
            smin = np.full(len(uniq), np.inf)
            np.minimum.at(smin, codes, s)
            ssum = np.zeros(len(uniq))
            np.add.at(ssum, codes, s)
            qids.extend([qid] * len(uniq))
            out_convs.extend(list(uniq))
            ns.extend(n.tolist())
            smaxs.extend(smax.tolist())
            smins.extend(smin.tolist())
            ssums.extend(ssum.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "conv_id": pa.array(out_convs, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "smax": pa.array(smaxs, type=pa.float64()),
                "smin": pa.array(smins, type=pa.float64()),
                "ssum": pa.array(ssums, type=pa.float64()),
            }
        )


def _combine_child(df: pd.DataFrame, score_mode: str) -> pd.DataFrame:
    g = (
        df.groupby(["query_id", "conv_id"], sort=False)
        .agg(n_matching=("n", "sum"), smax=("smax", "max"),
             smin=("smin", "min"), ssum=("ssum", "sum"))
        .reset_index()
    )
    if score_mode == "max":
        g["score"] = g["smax"]
    elif score_mode == "sum":
        g["score"] = _round6(g["ssum"])
    elif score_mode == "avg":
        g["score"] = _round6(g["ssum"] / g["n_matching"])
    elif score_mode == "min":
        g["score"] = g["smin"]
    elif score_mode == "none":
        g["score"] = 1.0  # constant-score join, like OpenSearch score_mode none
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    return g[["query_id", "conv_id", "n_matching", "score"]]


class _BlockTopK:
    """Per-block top-k combiner over combined (query, conv) rows — the
    distributed reduce's second stage. Runs AFTER the (query, conv) hash
    groupby, so each pair is complete in exactly one block; applying the
    min_children filter here keeps the per-block cut exact. Associative:
    merging per-block top-k partials and cutting again gives the global
    top-k."""

    def __init__(self, k: int, score_mode: str, min_children: int):
        self.k = k
        self.score_mode = score_mode
        self.min_children = min_children

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = _combine_child(batch.to_pandas(), self.score_mode)
        df = df[df["n_matching"] >= self.min_children]
        df = df.sort_values(["query_id", "score", "conv_id"],
                            ascending=[True, False, True])
        top = df.groupby("query_id", sort=False).head(self.k)
        return pa.Table.from_pandas(top, preserve_index=False)


def has_child(
    index_dir: str,
    queries,
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    where=None,
    distributed_threshold: int = 20_000_000,
) -> pd.DataFrame:
    """OpenSearch ``has_child`` query: the top-``k`` CONVERSATIONS per query,
    ranked by ``score_mode`` over their matching turns' BM25 scores
    (6-rounded; ties broken conv_id ascending). ``min_children`` drops
    conversations with fewer matching turns (OpenSearch min_children).
    Returns (query_id, rank, conv_id, score, n_matching)."""
    from remote_vector_index_builder_ray.pipelines.incremental import docmeta_dirs
    from remote_vector_index_builder_ray.state import fs

    shard_refs, qid_list, counts = _sharded_matches(
        index_dir, queries, where=where, scored=True
    )
    meta_files = [
        fs.join(d, rel)
        for d in docmeta_dirs(index_dir)
        for rel in fs.listdir(d, recursive=True)
        if rel.endswith(".parquet")
    ]
    partials = ray.data.read_parquet(
        **fs.for_ray_paths(meta_files), columns=["docid", "conv_id"]
    ).map_batches(
        _ProbeChildAgg,
        fn_constructor_args=(shard_refs, _MATCH_SHARD_STRIDE),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    total = sum(counts.values())
    if total > distributed_threshold:
        # scale path: a (query, conv) pair may span two adjacent batches, so
        # first co-locate pairs with a hash groupby (partials only — bounded
        # by matched convs, never corpus rows), then per-block top-k, then a
        # k-bounded driver merge
        def _key(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = pc.binary_join_element_wise(
                pc.cast(batch["query_id"], pa.string()),
                batch["conv_id"], "|",
            )
            return batch.append_column("qc", key)

        combined = (
            partials.map_batches(_key, batch_format="pyarrow")
            .groupby("qc")
            .map_groups(
                lambda df: df.groupby(["query_id", "conv_id"], as_index=False)
                .agg(n=("n", "sum"), smax=("smax", "max"),
                     smin=("smin", "min"), ssum=("ssum", "sum")),
                batch_format="pandas",
            )
            .map_batches(_BlockTopK(k, score_mode, min_children),
                         batch_format="pyarrow")
        )
        g = combined.to_pandas()
        if g.empty:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _CHILD_COLS.items()})
    else:
        df = partials.to_pandas()
        if df.empty:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _CHILD_COLS.items()})
        g = _combine_child(df, score_mode)
        g = g[g["n_matching"] >= min_children]
    g = g.sort_values(["query_id", "score", "conv_id"],
                      ascending=[True, False, True])
    g["rank"] = g.groupby("query_id").cumcount() + 1
    g = g[g["rank"] <= k].reset_index(drop=True)
    return g[["query_id", "rank", "conv_id", "score", "n_matching"]].astype(_CHILD_COLS)


def has_parent(index_dir: str, queries, k: int = 10) -> pd.DataFrame:
    """OpenSearch ``has_parent`` query (score=true): children of the top-``k``
    matching PARENT docs per query, each child carrying its parent's BM25
    score. The parent document is the conversation's opening turn
    (turn_idx == 0); children are that conversation's other turns. Returns
    (query_id, conv_id, turn_idx, docid, score), ordered by
    (query_id, score desc, conv_id, turn_idx)."""
    from remote_vector_index_builder_ray.pipelines.incremental import docmeta_dirs
    from remote_vector_index_builder_ray.pipelines.query import hydrate, search
    from remote_vector_index_builder_ray.state import fs

    q = queries.copy() if isinstance(queries, pd.DataFrame) else pd.read_parquet(queries)
    k_by_query = dict(zip(q["query_id"], [k] * len(q)))
    # oversample 2k so the 6-rounded re-rank can't lose a boundary parent
    q2 = q.assign(k=np.int32(2 * k))
    parents = search(
        index_dir, q2, mode="exhaustive", where=[("turn_idx", "=", 0)]
    ).to_pandas()
    cols = {
        "query_id": np.int64, "conv_id": object, "turn_idx": np.int32,
        "docid": np.int64, "score": np.float64,
    }
    if parents.empty or "docid" not in parents.columns:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    parents["score"] = _round6(parents["score"])
    parents = parents.sort_values(["query_id", "score", "docid"],
                                  ascending=[True, False, True])
    parents["rank"] = parents.groupby("query_id").cumcount() + 1
    parents = parents[parents["rank"] <= parents["query_id"].map(k_by_query)]
    # parent docid -> conv_id: broadcast-semi-join hydrate (queries x k rows)
    hyd = hydrate(index_dir, ray.data.from_pandas(
        parents[["query_id", "docid", "score"]].reset_index(drop=True)
    ))
    pmap = hyd[["query_id", "conv_id", "score"]].drop_duplicates()
    if pmap.empty:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    ref = ray.put(pmap)

    class _Children:
        def __init__(self, ref):
            self.parents = ray.get(ref)  # (query_id, conv_id, score)
            self.convs = set(self.parents["conv_id"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[(df["turn_idx"] > 0) & df["conv_id"].isin(self.convs)]
            if df.empty:
                return pa.table({
                    "query_id": pa.array([], type=pa.int64()),
                    "conv_id": pa.array([], type=pa.string()),
                    "turn_idx": pa.array([], type=pa.int32()),
                    "docid": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                })
            out = df.merge(self.parents, on="conv_id", how="inner")
            out = out[["query_id", "conv_id", "turn_idx", "docid", "score"]]
            return pa.Table.from_pandas(out.astype(cols), preserve_index=False)

    meta_files = [
        fs.join(d, rel)
        for d in docmeta_dirs(index_dir)
        for rel in fs.listdir(d, recursive=True)
        if rel.endswith(".parquet")
    ]
    kids = (
        ray.data.read_parquet(
            **fs.for_ray_paths(meta_files),
            columns=["docid", "conv_id", "turn_idx"],
        )
        .map_batches(_Children, fn_constructor_args=(ref,),
                     batch_format="pyarrow", zero_copy_batch=True,
                     concurrency=(1, 8))
        .to_pandas()
    )
    if kids.empty:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    kids = kids.sort_values(["query_id", "score", "conv_id", "turn_idx"],
                            ascending=[True, False, True, True])
    return kids.reset_index(drop=True).astype(cols)
