"""Deduplication operators for a large-scale training-data pipeline.

All follow the scalable Ray Data shape: a vectorized per-batch sketch/signature
stage (``map_batches``) followed by ONE keyed shuffle (``groupby``) over the
much smaller signature rows — never a pairwise all-to-all over raw documents.

- exact_dedup:      canonical-text md5 -> hash-partition -> keep min doc_id
- minhash_lsh:      k-shingles -> 64 minhashes -> band buckets -> candidate
                    pairs within buckets -> exact Jaccard verify
- simhash:          64-bit simhash -> near-dup pairs at hamming <= radius
                    (banded by 16-bit quarters so the shuffle key is a band,
                    not a full cross join)
- embedding near-dup lives in extras/ann.py (cosine >= threshold)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from remote_vector_index_builder_ray.functions.tokenizer import tokenize_column

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _canonical_hash_batch(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    tokens, doc_index, n_tokens = tokenize_column(batch[text_col])
    toks = np.asarray(tokens.to_pylist(), dtype=object)
    bounds = np.concatenate([[0], np.cumsum(n_tokens)]).astype(np.int64)
    fps = [
        hashlib.md5(" ".join(toks[bounds[i] : bounds[i + 1]]).encode()).hexdigest()
        for i in range(batch.num_rows)
    ]
    return pa.table({id_col: batch[id_col], "content_hash": pa.array(fps, type=pa.string())})


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact dedup by canonical (tokenized) content: keep the min id per hash.

    One shuffle keyed on content_hash; the shuffled rows are (id, hash) pairs,
    not documents — at 100 TB the heavy text never moves.
    """
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: _canonical_hash_batch(b, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return (
        hashed.groupby("content_hash")
        .aggregate(Min(id_col, alias_name="keep_id"), Count(alias_name="n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 12345):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
    return a, b


def _shingle_hashes(tokens: np.ndarray, k: int) -> np.ndarray:
    """Stable 64-bit hashes of k-token shingles."""
    if len(tokens) < k:
        joined = [" ".join(tokens)] if len(tokens) else []
    else:
        joined = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    return np.array(
        [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little") for s in joined],
        dtype=np.uint64,
    )


class MinHashSignatures:
    """Actor-pool stage: per-doc minhash signature + band keys (stateful:
    hash parameters built once per actor)."""

    def __init__(self, num_hashes: int = 64, band_size: int = 4, shingle_k: int = 3):
        self.a, self.b = _minhash_params(num_hashes)
        self.num_hashes = num_hashes
        self.band_size = band_size
        self.shingle_k = shingle_k

    def signature(self, tokens: np.ndarray) -> np.ndarray:
        sh = _shingle_hashes(tokens, self.shingle_k)
        if len(sh) == 0:
            return np.full(self.num_hashes, np.uint64(_MERSENNE), dtype=np.uint64)
        # (a*x + b) mod p for all hash fns x all shingles, take min per fn
        prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens, doc_index, n_tokens = tokenize_column(batch["text"])
        toks = np.asarray(tokens.to_pylist(), dtype=object)
        bounds = np.concatenate([[0], np.cumsum(n_tokens)]).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_band, out_key, out_sig = [], [], [], []
        nbands = self.num_hashes // self.band_size
        for i in range(batch.num_rows):
            sig = self.signature(toks[bounds[i] : bounds[i + 1]])
            for band in range(nbands):
                chunk = sig[band * self.band_size : (band + 1) * self.band_size]
                key = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_doc.append(int(ids[i]))
                out_band.append(band)
                out_key.append(key)
            out_sig.append(sig.tobytes())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.string()),
            }
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset, num_hashes: int = 64, band_size: int = 4, shingle_k: int = 3
) -> ray.data.Dataset:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Shuffle key = (band, band_key); each group emits its pairs (buckets are
    tiny by construction — collisions are either real near-dups or rare).
    """
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_args=(num_hashes, band_size, shingle_k),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8),
    )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = sigs.groupby(["band", "band_key"]).map_groups(emit_pairs, batch_format="pandas")
    # dedup pairs found in multiple bands (small set by construction)
    return pairs.groupby(["doc_a", "doc_b"]).count()


def jaccard_verify(ds: ray.data.Dataset, pairs: pd.DataFrame, shingle_k: int = 3, threshold: float = 0.7) -> pd.DataFrame:
    """Exact n-gram Jaccard over candidate pairs (broadcast the candidate doc
    set, gather their shingles, verify on the driver — the candidate set is
    tiny relative to the corpus)."""
    wanted = np.unique(np.concatenate([pairs["doc_a"].to_numpy(), pairs["doc_b"].to_numpy()])) if len(pairs) else np.array([], dtype=np.int64)
    import ray as _ray

    ref = _ray.put(set(wanted.tolist()))

    def collect(batch: pa.Table) -> pa.Table:
        keep = _ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.array([int(i) in keep for i in ids])
        return batch.filter(pa.array(mask))

    docs = ds.map_batches(collect, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    sh = {}
    for r in docs.itertuples(index=False):
        toks = np.asarray(
            pa.table({"t": [r.text]})["t"], dtype=object
        )
        from remote_vector_index_builder_ray.functions.tokenizer import tokenize_text

        tk = np.asarray(tokenize_text(r.text or ""), dtype=object)
        sh[int(r.doc_id)] = set(_shingle_hashes(tk, shingle_k).tolist())
    rows = []
    for r in pairs.itertuples(index=False):
        s1, s2 = sh.get(int(r.doc_a), set()), sh.get(int(r.doc_b), set())
        union = len(s1 | s2)
        j = len(s1 & s2) / union if union else 0.0
        if j >= threshold:
            rows.append((int(r.doc_a), int(r.doc_b), round(j, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (shingle inverted index)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    shingle_k: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> pd.DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via a shingle inverted index.

    Deterministic (SQL-oracle-checkable) counterpart of minhash_lsh_candidates:
    |A ∩ B| is computed distributed — emit (shingle, doc_id) rows, groupby
    shingle emits co-occurrence pairs, a second groupby counts them — so the
    wide shuffle moves 8-byte shingle hashes, never document text. Set (not
    multiset) semantics: shingles are deduped per doc before the shuffle.

    ``max_shingle_df`` caps the per-shingle bucket size at scale (a boilerplate
    phrase shared by m docs emits m² pairs); None = exact, which the oracle
    comparison requires. Reference analog: the job-id idempotency dedup
    (app/services/job_service.py:60-83) generalised to content similarity.
    """

    def shingle_rows(batch: pa.Table) -> pa.Table:
        tokens, doc_index, n_tokens = tokenize_column(batch[text_col])
        toks = np.asarray(tokens.to_pylist(), dtype=object)
        bounds = np.concatenate([[0], np.cumsum(n_tokens)]).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id: list[int] = []
        out_sh: list[int] = []
        for i in range(batch.num_rows):
            sh = np.unique(_shingle_hashes(toks[bounds[i] : bounds[i + 1]], shingle_k))
            out_id.extend([int(ids[i])] * len(sh))
            out_sh.extend(int(v) for v in sh)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "shingle": pa.array(out_sh, type=pa.uint64()),
            }
        )

    sh = ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2 or (max_shingle_df is not None and len(ids) > max_shingle_df):
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    inter = (
        sh.groupby("shingle")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .count()
        .to_pandas()
    )
    # per-doc distinct-shingle counts: tree-aggregated, tiny rows (id, n)
    sizes = sh.groupby(id_col).count().to_pandas()
    nsh = dict(zip(sizes[id_col].astype(int), sizes["count()"].astype(int)))
    if len(inter) == 0:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"), "jaccard": pd.Series(dtype="float64")}
        )
    na = inter["doc_a"].map(nsh).to_numpy(dtype=np.float64)
    nb = inter["doc_b"].map(nsh).to_numpy(dtype=np.float64)
    i = inter["count()"].to_numpy(dtype=np.float64)
    j = i / (na + nb - i)
    out = pd.DataFrame(
        {"doc_a": inter["doc_a"].astype("int64"), "doc_b": inter["doc_b"].astype("int64"), "jaccard": j}
    )
    out = out[out["jaccard"] >= threshold].copy()
    out["jaccard"] = out["jaccard"].round(6)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """64-bit simhash over the token multiset (vectorized bit-vote)."""
    tokens, doc_index, n_tokens = tokenize_column(batch[text_col])
    toks = tokens.to_pylist()
    th = np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little") for t in toks],
        dtype=np.uint64,
    )
    n = batch.num_rows
    votes = np.zeros((n, 64), dtype=np.int64)
    if len(th):
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        np.add.at(votes, doc_index, bits * 2 - 1)
    sh = (votes > 0).astype(np.uint64)
    vals = (sh << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array(vals.astype(np.int64).view(np.uint64).astype("uint64"), type=pa.uint64()),
        }
    )


def simhash_pairs(ds: ray.data.Dataset, radius: int = 3) -> pd.DataFrame:
    """Near-dup pairs at hamming distance <= radius.

    Banding: split the 64-bit hash into 4x16-bit quarters — any pair within
    radius<=3 shares at least one identical quarter (pigeonhole), so the
    shuffle key is (quarter_idx, quarter_value), never a cross join.
    """
    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow", zero_copy_batch=True)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        qs, out_ids, out_h, out_q = [], [], [], []
        for q in range(4):
            quarter = ((h >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
            out_ids.append(ids)
            out_h.append(h)
            out_q.extend([(q << 16) | int(v) for v in quarter])
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "simhash": pa.array(np.concatenate(out_h), type=pa.uint64()),
                "qkey": pa.array(out_q, type=pa.int64()),
            }
        )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        ham = np.array([bin(int(x)).count("1") for x in (hs[a] ^ hs[b])])
        keep = ham <= radius
        return pd.DataFrame({"doc_a": ids[a][keep], "doc_b": ids[b][keep], "hamming": ham[keep]})

    pairs = sigs.map_batches(explode, batch_format="pyarrow").groupby("qkey").map_groups(
        emit, batch_format="pandas"
    )
    pdf = pairs.to_pandas()
    return pdf.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
