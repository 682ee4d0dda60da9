"""Text-analysis operators over a generic documents table (doc_id, text).

Large-scale training-data-pipeline stages, each a vectorized ``map_batches``
over zero-copy Arrow batches (no shuffle): token counting, quality scoring,
n-gram-heuristic language ID, document fingerprinting. All are deliberately
defined so a DuckDB oracle can express the identical computation (see
``__ray_entry__.oracle_sql``).

Frozen definitions (shared with the SQL oracle):
  tokens          = regexp_extract_all(lower(text), '[a-z0-9_]+')
  n_tokens        = len(tokens); n_unique = len(distinct tokens)
  stopword_ratio  = |tokens in STOPWORDS_SMALL| / n_tokens   (0 if empty)
  lang_id         = 'en' if stopword_ratio >= 0.1 and n_tokens >= 3 else 'unk'
  quality_score   = round(0.5*min(1, n_tokens/100)
                          + 0.3*(unique_ratio) + 0.2*min(1, stopword_ratio*4), 6)
  fingerprint     = md5(' '.join(tokens))  (canonical normalized-text hash)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from remote_vector_index_builder_ray.functions.tokenizer import tokenize_column

# small frozen stopword list (shared verbatim with the SQL oracle)
STOPWORDS_SMALL = (
    "the and to of a in is it you that he was for on are with as i his they be "
    "at one have this from or had by not but what all were we when your can".split()
)


def text_features(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Vectorized per-doc features; one output row per input row."""
    n = batch.num_rows
    tokens, doc_index, n_tokens = tokenize_column(batch[text_col])
    toks_np = np.asarray(tokens.to_pylist(), dtype=object)

    # stopword count per doc (vectorized membership over the flat token stream)
    stop_set = np.array(STOPWORDS_SMALL, dtype=object)
    is_stop = np.isin(toks_np, stop_set)
    stop_count = np.zeros(n, dtype=np.int64)
    np.add.at(stop_count, doc_index, is_stop.astype(np.int64))

    # unique tokens per doc: unique over (doc_index, token) pairs
    if len(toks_np):
        d = tokens.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair = doc_index * (codes.max() + 1) + codes
        uniq_pairs = np.unique(pair)
        n_unique = np.bincount((uniq_pairs // (codes.max() + 1)).astype(np.int64), minlength=n)
    else:
        n_unique = np.zeros(n, dtype=np.int64)

    nt = n_tokens.astype(np.float64)
    safe_nt = np.maximum(nt, 1.0)
    stop_ratio = stop_count / safe_nt
    unique_ratio = n_unique / safe_nt
    # floor(x*1e6 + 0.5)/1e6: deterministic round-half-up, the exact same
    # arithmetic the SQL oracle uses (np.round is half-to-even -> rare tie
    # mismatches vs DuckDB's round)
    quality = np.floor(
        (
            0.5 * np.minimum(1.0, nt / 100.0)
            + 0.3 * unique_ratio
            + 0.2 * np.minimum(1.0, stop_ratio * 4.0)
        )
        * 1e6
        + 0.5
    ) / 1e6
    lang = np.where((stop_ratio >= 0.1) & (nt >= 3), "en", "unk")

    # fingerprint: md5 over the canonical normalized text (' '-joined tokens)
    bounds = np.concatenate([[0], np.cumsum(n_tokens)]).astype(np.int64)
    fps = [
        hashlib.md5(" ".join(toks_np[bounds[i] : bounds[i + 1]]).encode()).hexdigest()
        for i in range(n)
    ]

    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens.astype(np.int64), type=pa.int64()),
            "n_unique": pa.array(n_unique.astype(np.int64), type=pa.int64()),
            "stopword_ratio": pa.array(np.floor(stop_ratio * 1e6 + 0.5) / 1e6, type=pa.float64()),
            "lang_id": pa.array(lang.tolist(), type=pa.string()),
            "quality_score": pa.array(quality, type=pa.float64()),
            "fingerprint": pa.array(fps, type=pa.string()),
        }
    )


def text_features_ds(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(text_features, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex) + rolling-hash fingerprint
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks —
# the coarse shape of GPT-2's pre-split, frozen so RE2 (Arrow, DuckDB) and
# Python re agree on it exactly
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# whitespace-token pattern as an EXPLICIT class: Python's \S is Unicode-aware
# while RE2's (Arrow, DuckDB) is ASCII-only, so \S+ counts/tokenizes
# differently on \x0b/\x85/\xa0/U+2000-range text. The explicit class below is
# RE2's exact \s complement and means the same thing to every engine involved.
WS_TOKEN_PATTERN = "[^ \t\n\r\f\v]+"

_ROLL_MOD = (1 << 31) - 1
_ROLL_BASE = 1000003


def _rolling_fp(tokens: list[str]) -> int:
    """Polynomial rolling hash over whitespace tokens; per-token value
    (codepoint(first char) * 131 + char length) is chosen to be expressible
    in SQL (``ascii(x)*131 + len(x)``) so the oracle computes bit-identical
    fingerprints."""
    acc = 0
    for t in tokens:
        acc = (acc * _ROLL_BASE + (ord(t[0]) * 131 + len(t))) % _ROLL_MOD
    return acc


def token_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc whitespace / BPE-ish token counts + rolling-hash fingerprint.

    Counts are fully vectorized (Arrow RE2 kernels over the zero-copy batch);
    only the fingerprint walks tokens in Python (it is inherently sequential
    per doc, and docs are short)."""
    import pyarrow.compute as pc
    import re

    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    n_ws = pc.count_substring_regex(txt, pattern=WS_TOKEN_PATTERN).to_numpy(zero_copy_only=False)
    n_bpe = pc.count_substring_regex(txt, pattern=BPE_PATTERN).to_numpy(zero_copy_only=False)
    ws_re = re.compile(WS_TOKEN_PATTERN)
    fps = [_rolling_fp(ws_re.findall(t)) for t in txt.to_pylist()]
    return pa.table(
        {
            id_col: batch[id_col],
            "n_ws_tokens": pa.array(n_ws.astype(np.int64), type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe.astype(np.int64), type=pa.int64()),
            "rolling_fp": pa.array(fps, type=pa.int64()),
        }
    )


def token_stats_ds(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(token_stats, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# sequence packing (LLM pretraining batch construction)
# ---------------------------------------------------------------------------


class _BucketTokenCounts:
    """Phase-1 partial: per doc_id-range bucket, the token-count sum for the
    batch's rows — only (bucket, partial_sum) rows leave each task."""

    def __init__(self, bucket_docs: int, id_col: str, text_col: str):
        self.bucket_docs = bucket_docs
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].combine_chunks().to_numpy(zero_copy_only=False)
        _, _, dl = tokenize_column(batch[self.text_col])
        bucket = (ids // self.bucket_docs).astype(np.int64)
        uniq, inv = np.unique(bucket, return_inverse=True)
        sums = np.bincount(inv, weights=dl.astype(np.float64)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(uniq, type=pa.int64()),
            "s": pa.array(sums, type=pa.int64()),
        })


def pack_sequences(
    ds: ray.data.Dataset,
    budget: int = 2048,
    bucket_docs: int = 1 << 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Sequence packing for LLM pretraining: assign every document to a
    fixed-token-budget pack, in global doc_id order — pack_id =
    (exclusive-prefix-sum of token counts) // budget, i.e. each doc starts
    at its running token offset and packs hold ``budget`` tokens of
    contiguous docs (the "concat-and-chunk" packing used to build
    pretraining batches).

    A global ordered prefix sum is the textbook two-phase scan, kept
    distributed:

    1. phase 1 (map-side combine): per doc_id-range bucket partial token
       sums — (n_buckets x read-tasks) rows reduce driver-side into
       exclusive per-bucket offsets (driver-small: one int per 64k docs).
    2. phase 2: ``groupby(bucket).map_groups`` sorts each bucket by doc_id,
       adds its broadcast offset to the within-bucket exclusive cumsum, and
       emits (doc_id, n_tokens, pack_id). The shuffle moves (doc_id,
       n_tokens) pairs only — never the text.

    Returns a Dataset of (doc_id, n_tokens, pack_id).
    """
    import pandas as pd
    import ray

    partials = (
        ds.map_batches(
            _BucketTokenCounts,
            fn_constructor_args=(bucket_docs, id_col, text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
        .to_pandas()
    )
    if partials.empty:
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype=np.int64),
            "n_tokens": pd.Series(dtype=np.int64),
            "pack_id": pd.Series(dtype=np.int64),
        }))
    bsum = partials.groupby("bucket", sort=True)["s"].sum()
    offsets = {int(b): int(o) for b, o in
               zip(bsum.index, bsum.cumsum().shift(fill_value=0))}
    off_ref = ray.put(offsets)

    def _assign(group: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = group.sort_values(id_col)
        from remote_vector_index_builder_ray.functions.tokenizer import (
            tokenize_column as _tc,
        )

        dl = _tc(pa.array(g[text_col].fillna("")))[2].astype(np.int64)
        start = int(off[int(g["bucket"].iloc[0])]) + np.concatenate(
            [[0], np.cumsum(dl)[:-1]]
        )
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            "n_tokens": dl,
            "pack_id": (start // budget).astype(np.int64),
        })

    with_bucket = ds.map_batches(
        lambda b: b.append_column(
            "bucket",
            pa.array(
                b[id_col].combine_chunks().to_numpy(zero_copy_only=False)
                // bucket_docs, type=pa.int64())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return with_bucket.groupby("bucket").map_groups(_assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# deterministic dataset split (train / val / test)
# ---------------------------------------------------------------------------


def dataset_split(
    batch: pa.Table,
    id_col: str = "doc_id",
    cuts: tuple = (80, 90),
) -> pa.Table:
    """Deterministic train/val/test assignment: bucket = the first 8 hex
    chars of md5(str(doc_id)) as an integer, mod 100; bucket < cuts[0] →
    'train', < cuts[1] → 'val', else 'test'. Hashing the ID (not row
    position) keeps the split stable under repartitioning, appends and
    re-runs — the property a training pipeline needs. A pure map (no
    shuffle); md5-per-row matches the engine's established fingerprint
    policy and the SQL twin computes the identical bucket."""
    import hashlib

    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    buckets = np.fromiter(
        (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % 100
         for i in ids),
        dtype=np.int64, count=len(ids),
    )
    split = np.where(buckets < cuts[0], "train",
                     np.where(buckets < cuts[1], "val", "test"))
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "bucket": pa.array(buckets, type=pa.int64()),
        "split": pa.array(split.tolist(), type=pa.string()),
    })


def dataset_split_ds(ds: ray.data.Dataset, id_col: str = "doc_id",
                     cuts: tuple = (80, 90)) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: dataset_split(b, id_col=id_col, cuts=cuts),
        batch_format="pyarrow", zero_copy_batch=True,
    )
