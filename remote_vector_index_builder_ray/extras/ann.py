"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: the baseline — numpy matmul per batch against a
  query matrix broadcast ONCE via ray.put (never re-shipped per batch); a
  global top-k reduce on the tiny per-batch partials.
- IVF-bucketed variant: the scale path — k-means-lite centroids (sampled,
  deterministic), assign every vector to its nearest centroid in a vectorized
  map_batches, and probe only the nprobe nearest buckets at query time.
- embedding near-dup: all pairs with cosine >= threshold, LSH-bucketed by
  random hyperplane signs so the shuffle key is a signature, not a cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class CosineTopK:
    """map_batches callable: per-batch exact cosine top-k partials."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)  # (query_ids, matrix) broadcast once
        self.qids, qm = q
        self.qn = _normalize(qm)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, "embedding"))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = self.qn @ m.T  # (nq, nbatch)
        nq, nb = sims.shape
        k = min(self.k, nb)
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            s = sims[qi]
            idx = np.argpartition(-s, k - 1)[:k] if nb > k else np.arange(nb)
            out_q.extend([int(self.qids[qi])] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )


def brute_force_topk(
    ds: ray.data.Dataset, query_ids: np.ndarray, query_matrix: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Exact cosine top-k: batch partials -> tiny driver-side final reduce.

    Rank by (round(cosine, 6) DESC, vec_id ASC) — the same deterministic
    ordering the DuckDB oracle uses."""
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix, dtype=np.float64)))
    partials = ds.map_batches(
        CosineTopK, fn_constructor_args=(ref, k),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    ).to_pandas()
    partials["cosine"] = partials["cosine"].round(6)
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype("int32") + 1
    return out[["query_id", "rank", "vec_id", "cosine"]]


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


def train_centroids(ds: ray.data.Dataset, n_centroids: int, sample_frac: float = 0.2, iters: int = 5, seed: int = 7):
    """k-means-lite on a sample (deterministic): the analog of the reference's
    kmeans_trainset_fraction IVF training (``ivf_pq_build_cagra_config.py:25-26``)."""
    sample = ds.random_sample(sample_frac, seed=seed).to_pandas()
    m = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]]))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IVFAssign:
    def __init__(self, cent_ref):
        self.cent = ray.get(cent_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, "embedding"))
        assign = (m @ self.cent.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(assign, type=pa.int32()))


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> pd.DataFrame:
    """Approximate top-k probing only the nprobe nearest IVF buckets."""
    cent = train_centroids(ds, n_centroids)
    cent_ref = ray.put(cent)
    assigned = ds.map_batches(
        IVFAssign, fn_constructor_args=(cent_ref,),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    )
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # buckets per query
    wanted = np.unique(probe)
    ref = ray.put(set(int(b) for b in wanted))

    def keep_buckets(batch: pa.Table) -> pa.Table:
        keep = ray.get(ref)
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array([int(x) in keep for x in b]))

    sub = assigned.map_batches(keep_buckets, batch_format="pyarrow").to_pandas()
    m = _normalize(np.stack([np.asarray(v, np.float64) for v in sub["embedding"]]))
    ids = sub["vec_id"].to_numpy()
    buckets = sub["bucket"].to_numpy()
    rows = []
    for qi in range(len(query_ids)):
        mask = np.isin(buckets, probe[qi])
        sims = m[mask] @ qm[qi]
        cand_ids = ids[mask]
        order = np.lexsort((cand_ids, -np.round(sims, 6)))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((int(query_ids[qi]), rank, int(cand_ids[j]), round(float(sims[j]), 6)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cosine"])


# ---------------------------------------------------------------------------
# embedding near-dup (cosine >= threshold)
# ---------------------------------------------------------------------------


def embedding_near_dup(ds: ray.data.Dataset, threshold: float = 0.95, n_planes: int = 12, seed: int = 11) -> pd.DataFrame:
    """Pairs with cosine >= threshold via random-hyperplane LSH buckets.

    NOTE (recall): bucketing by full signature equality is exact only for
    pairs whose signs agree on all planes; near-dups straddling a hyperplane
    can be missed — standard LSH behavior, tested against brute force on the
    fixture with multiple plane seeds."""
    rng = np.random.default_rng(seed)

    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0])
    planes = rng.standard_normal((dim, n_planes))
    pref = ray.put(planes)

    class Sign:
        def __init__(self, pref):
            self.planes = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, "embedding"))
            bits = (m @ self.planes) > 0
            key = (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)[None, :]).sum(axis=1)
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "embedding": batch["embedding"],
                    "sig": pa.array(key.astype(np.int64), type=pa.int64()),
                }
            )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        if len(g) < 2:
            return pd.DataFrame({"vec_id_a": pd.Series(dtype="int64"), "vec_id_b": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")})
        m = _normalize(np.stack([np.asarray(v, np.float64) for v in g["embedding"]]))
        ids = g["vec_id"].to_numpy()
        sims = m @ m.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= threshold
        return pd.DataFrame(
            {"vec_id_a": ids[a][keep], "vec_id_b": ids[b][keep], "cosine": np.round(sims[a, b][keep], 6)}
        )

    pairs = (
        ds.map_batches(Sign, fn_constructor_args=(pref,), batch_format="pyarrow",
                       zero_copy_batch=True, concurrency=(1, 4))
        .groupby("sig")
        .map_groups(emit, batch_format="pandas")
        .to_pandas()
    )
    return pairs.drop_duplicates(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


def embedding_near_dup_exact(ds: ray.data.Dataset, threshold: float = 0.9) -> pd.DataFrame:
    """EXACT near-dup pairs (cosine >= threshold): each batch is compared
    against the full corpus matrix broadcast once via ray.put.

    Quadratic in corpus size — the oracle-checkable baseline; the LSH variant
    (``embedding_near_dup``) is the sub-quadratic scale path."""
    full = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids_all = full["vec_id"].to_numpy().astype(np.int64)
    m_all = _normalize(np.stack([np.asarray(v, np.float64) for v in full["embedding"]]))
    ref = ray.put((ids_all, m_all))

    class PairScan:
        def __init__(self, ref):
            self.ids_all, self.m_all = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, "embedding"))
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            sims = m @ self.m_all.T  # (nbatch, N)
            out_a, out_b, out_s = [], [], []
            for i in range(len(ids)):
                mask = (sims[i] >= threshold) & (self.ids_all > ids[i])
                js = np.flatnonzero(mask)
                out_a.extend([int(ids[i])] * len(js))
                out_b.extend(self.ids_all[js].tolist())
                out_s.extend(np.round(sims[i][js], 6).tolist())
            return pa.table(
                {
                    "vec_id_a": pa.array(out_a, type=pa.int64()),
                    "vec_id_b": pa.array(out_b, type=pa.int64()),
                    "cosine": pa.array(out_s, type=pa.float64()),
                }
            )

    pairs = ds.map_batches(
        PairScan, fn_constructor_args=(ref,), batch_format="pyarrow",
        zero_copy_batch=True, concurrency=(1, 8),
    ).to_pandas()
    return pairs.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
